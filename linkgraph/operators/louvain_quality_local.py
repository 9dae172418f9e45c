"""Small-quotient local fast path for the GENERALIZED Louvain loop
(operators/louvain_quality.py) — the quality-id analog of
operators/louvain_local.py.

After one contraction the quotient is orders of magnitude smaller than
the input, yet every further Spark level still pays ~12 fixed-overhead
jobs per round for EACH of the 10 quality ids (round-4 verdict item:
the generalized loop paid that toy-scale tax while the id-0 loop
already had the fast path). The reference runs the whole optimization
on one device (gpulouvain.cu; quality factory main_louvain.cpp:998-
1059), so the Spark-honest hybrid is the same as id 0's: run level 0
(and any big quotient) distributed, and once a post-contraction
quotient fits trivially in driver memory, collect it and finish here.

Exactness: the gain expressions below mirror the Column trees in
functions/quality.py operation-for-operation (same literals, same
associativity), and every decision input (w_vc, tot, w_c, in_c, k) is
a sum of edge/node weights. For integer-valued weights (ids 0-3, 5,
6, 8, 9 — graph_weighting never ran) those sums are exact in float64
regardless of accumulation order, so labels, quality, level count and
per-round move counts are IDENTICAL to the distributed path (asserted
in tests/test_louvain_quality.py::test_generalized_local_fastpath).
Ids 4/7 reweight the edges at level 0 (condora.cpp:58-104 /
dp.cpp:70-108) into non-integer floats whose partial-aggregation
order Spark itself does not fix — the local path lands inside the
same ULP envelope the distributed path already has across
partitionings (fixtures keep gains well-separated, same argument as
tests/oracle_quality.py).

Kept INDEPENDENT of tests/oracle_quality.py so the test oracle still
validates both engines.
"""

from __future__ import annotations

import time
from collections import defaultdict


def local_gain(
    qid: int,
    dnc: float,
    degc: float,
    tot_c: float,
    in_c: float,
    self_v: float,
    w_u: float,
    w_c: float,
    m2: float,
    n: float,
    max_w: float,
    alpha: float = 0.5,
    kappa: float = 1.0,
    kappa_min: float = 0.0,
) -> float:
    """functions/quality.py GAIN_FUNCTIONS transcribed to scalar
    float64 with identical expression trees (left-associated, same
    literals), so JVM and Python evaluate the same rounding steps."""
    if qid == 0:
        return dnc - tot_c * degc / m2
    if qid == 1:
        return 2.0 * dnc - w_u * w_c * max_w
    if qid == 2:
        return dnc - alpha * w_u * w_c * max_w
    if qid == 3:
        if w_c == 0.0:
            return (2.0 * dnc + self_v) / (2.0 * w_u)
        return (2.0 * dnc + self_v + in_c) / (2.0 * (w_c + w_u)) - in_c / (
            2.0 * w_c
        )
    if qid == 4:
        return dnc
    if qid == 5:
        return dnc - (tot_c * w_u + degc * w_c) / n + (m2 * w_u * w_c) / (n * n)
    if qid == 6:
        return dnc - (m2 * w_u * w_c) / (n * n)
    if qid == 7:
        if w_c == 0.0:
            return (2.0 * dnc + self_v) / w_u - 0.5
        return (in_c + 2.0 * dnc + self_v) / (w_c + w_u) - in_c / w_c
    if qid == 8:
        if kappa < kappa_min:
            return 0.0
        if tot_c == 0.0:
            return (2.0 * dnc + self_v) / degc - 1.0
        return (in_c + 2.0 * dnc + self_v) / (tot_c + degc) - in_c / tot_c
    if qid == 9:
        g = 2.0 * dnc - degc * tot_c / m2 - w_u * w_c * max_w
        return g + ((n * w_u * max_w - degc) * (n * w_c * max_w - tot_c)) / (
            n * n * max_w - m2
        )
    raise ValueError(f"unknown quality id {qid}")


def local_quality(
    qid: int,
    aggs,
    m2: float,
    n: float,
    max_w: float,
    alpha: float = 0.5,
    side: float = 0.0,
) -> float:
    """functions/quality.py::quality_value transcribed to scalars.
    aggs: (in_c, tot, w_c) per existing community, community-ascending
    (a fixed order — Spark's own partial-agg order is unfixed, so the
    scalar is reproducible here and ULP-comparable there)."""
    nn = n * n
    if qid == 0:
        return sum(i - t * t / m2 for i, t, w in aggs if t > 0.0) / m2
    if qid == 1:
        return (
            sum(2.0 * i - max_w * w * w for i, t, w in aggs if w > 0.0)
            + (nn * max_w - m2)
        ) / (nn * max_w)
    if qid == 2:
        return (
            sum(i - alpha * (w * w * max_w) for i, t, w in aggs if w > 0.0)
            + alpha * (nn * max_w - m2)
        ) / (nn * max_w)
    if qid == 3:
        return sum(i / (w * 2.0) for i, t, w in aggs if w * 2.0 > 0.0) / (
            n * max_w
        )
    if qid == 4:
        return (sum(i for i, t, w in aggs) + side) / nn
    if qid == 5:
        return (
            sum(i - (2.0 * t * w) / n for i, t, w in aggs if w > 0.0)
            + sum(w * w for i, t, w in aggs if w > 0.0) * (m2 / nn)
        ) / m2
    if qid == 6:
        return (
            sum(i for i, t, w in aggs if w > 0.0)
            - sum(w * w for i, t, w in aggs if w > 0.0) * (m2 / nn)
        ) / m2
    if qid == 7:
        kappa = float(sum(1 for i, t, w in aggs if w > 0.0))
        return (
            sum(2.0 * i / w for i, t, w in aggs if w > 0.0) - (side + kappa)
        ) / (nn * max_w)
    if qid == 8:
        kappa = float(sum(1 for i, t, w in aggs if t > 0.0))
        return (sum(i / t for i, t, w in aggs if t > 0.0) - kappa) / n
    if qid == 9:
        return sum(
            2.0 * i
            - (t * t) / m2
            - w * w * max_w
            + ((n * w * max_w - t) * (n * w * max_w - t)) / (nn * max_w - m2)
            for i, t, w in aggs
            if w > 0.0
        ) / (nn * max_w)
    raise ValueError(f"unknown quality id {qid}")


def run_local_levels_q(
    edge_rows,
    node_w_rows,
    n_nodes: int,
    qid: int,
    params: dict,
    m2: float,
    n: float,
    max_w: float,
    side: float,
    max_rounds: int,
    max_levels: int,
    start_level: int,
):
    """Finish the generalized level loop on a collected quotient whose
    vertex ids are dense 0..n_nodes-1 (the contraction invariant).

    edge_rows: (src, dst, weight) symmetric quotient rows (self-loop
    diagonal included); node_w_rows: (id, w_u) carried node weights.
    Returns (level_maps, q_final, levels_done, metrics) — level_maps
    one {node -> dense cid} dict per RECORDED level (exactly the
    levels the distributed loop would renumber), metrics rows in the
    distributed loop's format ({level, round, moves, seconds} per
    round and {level, quality} per level) with ``level`` offset by
    start_level."""
    alpha = params.get("alpha", 0.5)
    kappa = params.get("kappa", 1.0)
    kappa_min = params.get("kappa_min", 0.0)
    cur_edges = [(int(u), int(v), float(w)) for u, v, w in edge_rows]
    node_w = {int(i): float(w) for i, w in node_w_rows}
    cur_nodes = list(range(n_nodes))
    for v in cur_nodes:
        node_w.setdefault(v, 1.0)
    metrics: list[dict] = []
    level_maps: list[dict[int, int]] = []
    q_final = 0.0
    levels_done = 0
    for li in range(max_levels):
        level = start_level + li
        k: dict[int, float] = defaultdict(float)
        self_w: dict[int, float] = defaultdict(float)
        adj: dict[int, list] = defaultdict(list)
        for u, v, w in cur_edges:
            k[u] += w
            adj[u].append((v, w))
            if u == v:
                self_w[u] += w
        state = {v: v for v in cur_nodes}
        moved_any = False
        for rnd in range(max_rounds):
            t0 = time.perf_counter()
            tot: dict[int, float] = defaultdict(float)
            w_c: dict[int, float] = defaultdict(float)
            size: dict[int, int] = defaultdict(int)
            in_c: dict[int, float] = defaultdict(float)
            for v in cur_nodes:
                c = state[v]
                tot[c] += k[v]
                w_c[c] += node_w[v]
                size[c] += 1
            for u, v, w in cur_edges:
                if state[u] == state[v]:
                    in_c[state[u]] += w
            if qid == 8 and kappa_min > 1:
                # live kappa at round start (the distributed loop's
                # documented synchronous-round divergence)
                kappa = float(
                    len({state[v] for v in cur_nodes if k[v] > 0.0})
                )
            new_state = dict(state)
            moves = 0
            for v in cur_nodes:
                cur = state[v]
                w_vc: dict[int, float] = defaultdict(float)
                for u, w in adj.get(v, ()):
                    if u != v:
                        w_vc[state[u]] += w
                e_own = w_vc.get(cur, 0.0)
                own = local_gain(
                    qid, e_own, k[v], tot[cur] - k[v],
                    in_c[cur] - (2.0 * e_own + self_w[v]),
                    self_w[v], node_w[v], w_c[cur] - node_w[v],
                    m2, n, max_w, alpha, kappa, kappa_min,
                )
                own_gain = max(own, 0.0)
                best_gain, best_c = None, None
                for c, w in w_vc.items():
                    if c == cur:
                        continue
                    # W3 swap guard: b_any when the own community has
                    # company, else the strict (c < cur or size>1) set
                    if not (c < cur or size[c] > 1 or size[cur] > 1):
                        continue
                    g = local_gain(
                        qid, w, k[v], tot[c], in_c[c], self_w[v],
                        node_w[v], w_c[c], m2, n, max_w,
                        alpha, kappa, kappa_min,
                    )
                    if best_gain is None or g > best_gain or (
                        g == best_gain and c < best_c
                    ):
                        best_gain, best_c = g, c
                if best_gain is not None and best_gain > own_gain:
                    new_state[v] = best_c
                    moves += 1
            state = new_state
            metrics.append(
                {
                    "level": level,
                    "round": rnd,
                    "moves": moves,
                    "seconds": round(time.perf_counter() - t0, 3),
                }
            )
            if moves == 0:
                break
            moved_any = True
        # the metric's quality() at this level's fixpoint
        tot = defaultdict(float)
        w_c = defaultdict(float)
        in_c = defaultdict(float)
        for v in cur_nodes:
            c = state[v]
            tot[c] += k[v]
            w_c[c] += node_w[v]
        for u, v, w in cur_edges:
            if state[u] == state[v]:
                in_c[state[u]] += w
        aggs = [(in_c[c], tot[c], w_c[c]) for c in sorted(w_c)]
        q_final = local_quality(qid, aggs, m2, n, max_w, alpha, side)
        metrics.append({"level": level, "quality": q_final})
        levels_done = li + 1
        if not moved_any:
            break
        comms = sorted(set(state.values()))
        cid = {c: i for i, c in enumerate(comms)}
        dense = {v: cid[state[v]] for v in cur_nodes}
        level_maps.append(dense)
        if len(comms) == len(cur_nodes):
            break
        q_edges: dict[tuple[int, int], float] = defaultdict(float)
        new_w: dict[int, float] = defaultdict(float)
        for u, v, w in cur_edges:
            q_edges[(dense[u], dense[v])] += w
        for v in cur_nodes:
            new_w[dense[v]] += node_w[v]
        cur_edges = [(a, b, w) for (a, b), w in q_edges.items()]
        cur_nodes = list(range(len(comms)))
        node_w = dict(new_w)
    return level_maps, q_final, levels_done, metrics
