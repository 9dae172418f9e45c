"""Small-quotient local fast path for multi-level Louvain.

After one or two contractions a web graph's quotient is orders of
magnitude smaller than the input (the sf0.1 bench graph: 15k vertices
-> ~5k communities after level 0 -> hundreds), yet every further Spark
level still pays ~12 fixed-overhead jobs (plan build, AQE stages,
broadcast exchanges — measured in STATUS.md). The reference runs the
ENTIRE optimization on one device (gpulouvain.cu); the Spark-honest
analog is: run level 0 (and any level whose quotient is still big)
distributed, and once a post-contraction quotient fits trivially in
driver memory, collect it and finish the remaining levels here —
same synchronous schedule, same scaled-integer decision algebra
(operators/louvain.py module docstring), so labels, modularity, level
count and per-round metrics are IDENTICAL to the distributed path
(asserted by tests/test_louvain.py::test_local_fastpath_identical).

All score inputs are sums of integer-valued edge weights (exact in
float64) and every decision is the scaled form S = 2M*w - k*tot_C with
no division, so the arithmetic below reproduces the Spark operators'
results bit-for-bit for integer weights — the same argument the NumPy
test oracle relies on (tests/oracle_louvain.py, kept INDEPENDENT of
this module so it still validates both paths).
"""

from __future__ import annotations

from collections import defaultdict


def _q(edges, state, k, m):
    """Q = e_own/(2M) - sum tot^2/(4M^2); self-loops are always
    intra-community, so they count in e_own (calculateToOwnCommunity
    has no neighbour != vertex guard). Returns (Q, e_own) — e_own is
    the next level's quotient-diagonal total (the distributed loop's
    e_own_final)."""
    e_own = 0.0
    for u, v, w in edges:
        if state[u] == state[v]:
            e_own += w
    tot = defaultdict(float)
    for v, c in state.items():
        tot[c] += k[v]
    tot_sq = sum(t * t for t in tot.values())
    return (
        float(e_own) / (2.0 * m) - float(tot_sq) / (4.0 * m * m),
        float(e_own),
    )


def _move(edges_adj, nodes, state, k, tot, size, twom):
    """One synchronous move round (W1-W4): scaled score, swap guard,
    lowest-id tie-break, acceptance test — the exact operator algebra."""
    new_state = dict(state)
    for v in nodes:
        cur = state[v]
        w_vc = defaultdict(float)
        for u, w in edges_adj.get(v, ()):
            if u != v:
                w_vc[state[u]] += w
        e_own = w_vc.get(cur, 0.0)
        best_s, best_c = None, None
        for c, w in w_vc.items():
            if c == cur:
                continue
            if not (c < cur or size[c] > 1 or size[cur] > 1):
                continue
            s = twom * w - k[v] * tot[c]
            if best_s is None or s > best_s or (s == best_s and c < best_c):
                best_s, best_c = s, c
        if (
            best_s is not None
            and best_s + k[v] * (tot[cur] - k[v]) - twom * e_own > 0.0
        ):
            new_state[v] = best_c
    return new_state


def _one_level(
    edges,
    nodes,
    m,
    min_gain,
    max_rounds,
    metrics,
    level,
    init_state=None,
    frontier_nodes=None,
):
    """One level with the Spark loop's exact stop rule and metric
    bookkeeping: Q is measured on the PRE-move state each round; when
    the observed gain drops below min_gain the round's already-built
    move is DISCARDED (operators/louvain.py::_one_level's
    one-action-per-round structure).

    init_state: warm-start labels (dict node -> community); None =
    singletons (the post-contraction default). frontier_nodes: move
    evaluation restricted to this set (delta-screening's R) — exactly
    the distributed frontier semi-join: non-frontier vertices have no
    candidate rows and keep their community, but still count in every
    community total and in Q. Returns (state, improved, q_after,
    e_own_after)."""
    k = defaultdict(float)
    adj = defaultdict(list)
    for u, v, w in edges:
        k[u] += w
        adj[u].append((v, w))
    twom = 2.0 * m
    state = {v: v for v in nodes} if init_state is None else dict(init_state)
    move_nodes = (
        nodes
        if frontier_nodes is None
        else [v for v in nodes if v in frontier_nodes]
    )
    improved = False
    q_prev = None
    q_after = None
    e_own_after = 0.0
    for rnd in range(max_rounds):
        tot = defaultdict(float)
        size = defaultdict(int)
        for v in nodes:
            tot[state[v]] += k[v]
            size[state[v]] += 1
        q_cur, e_own_cur = _q(edges, state, k, m)
        if rnd == 0:
            q_prev = q_cur
        else:
            gain = q_cur - q_prev
            q_prev = q_cur
            metrics.append({"level": level, "round": rnd - 1, "q": q_cur, "gain": gain})
            if gain > 0:
                improved = True
            if gain < min_gain:
                q_after = q_cur
                e_own_after = e_own_cur
                break
        state = _move(adj, move_nodes, state, k, tot, size, twom)
    if q_after is None:
        q_after, e_own_after = _q(edges, state, k, m)
        if q_prev is not None and max_rounds > 0:
            gain = q_after - q_prev
            metrics.append(
                {"level": level, "round": max_rounds - 1, "q": q_after, "gain": gain}
            )
            if gain > 0:
                improved = True
    return state, improved, q_after, e_own_after


def run_local_complete(
    edge_rows,
    vert_ids,
    m: float,
    min_gain: float,
    max_rounds: int,
    max_levels: int,
    init=None,
    frontier=None,
    force: bool = False,
):
    """The ENTIRE louvain() level loop on the driver — level 0
    included — for graphs under the guarded collect thresholds
    (operators/louvain.py's full-local fast path). Mirrors the
    distributed loop statement by statement: warm-start level 0
    (``init``: (id, community) pairs; ``force`` = the gpulouvain
    onceMore flag that forces contraction + a second level),
    delta-screening frontier restricted to level 0, per-level
    hierarchy maps, identity-contraction stop, and the degenerate
    no-improvement path. Vertex ids are ARBITRARY longs at level 0
    (no dense-input assumption — unlike ``run_local_levels``, which
    requires the contraction invariant).

    Returns (hierarchy_levels, assignment, q_final, levels_done,
    metrics): hierarchy_levels = [(level, {node -> dense cid})...] —
    the same rows the distributed loop appends per level — and
    assignment = {original id -> final dense community}.
    """
    cur_edges = [(int(u), int(v), float(w)) for u, v, w in edge_rows]
    cur_nodes = [int(v) for v in vert_ids]
    metrics: list[dict] = []
    hierarchy_levels: list[tuple[int, dict[int, int]]] = []
    orig_map = {v: v for v in cur_nodes}
    state0 = dict(init) if init is not None else None
    fr = set(int(v) for v in frontier) if frontier is not None else None
    force_more = force
    q_final = 0.0
    levels_done = 0
    state = dict(state0) if state0 is not None else {v: v for v in cur_nodes}
    for level in range(max_levels):
        state, improved, q_final, _ = _one_level(
            cur_edges, cur_nodes, m, min_gain, max_rounds, metrics, level,
            init_state=state0, frontier_nodes=fr,
        )
        levels_done = level + 1
        if not improved and not force_more:
            break  # reference breaks BEFORE contraction
        force_more = False
        comms = sorted(set(state.values()))
        cid = {c: i for i, c in enumerate(comms)}
        dense = {v: cid[state[v]] for v in cur_nodes}
        hierarchy_levels.append((level, dense))
        orig_map = {o: dense[nd] for o, nd in orig_map.items()}
        if len(comms) == len(cur_nodes):
            break  # identity contraction: the next level cannot differ
        q_edges = defaultdict(float)
        for u, v, w in cur_edges:
            q_edges[(dense[u], dense[v])] += w
        cur_edges = [(a, b, w) for (a, b), w in q_edges.items()]
        cur_nodes = list(range(len(comms)))
        state0 = None  # post-contraction levels start from singletons
        fr = None  # frontier applies to level 0 only
    if not hierarchy_levels:
        # degenerate: level 0 did not improve and no warm start —
        # every vertex its own dense community (ascending renumber of
        # the unmoved state, as the distributed loop does)
        comms = sorted(set(state.values()))
        cid = {c: i for i, c in enumerate(comms)}
        dense = {v: cid[state[v]] for v in cur_nodes}
        hierarchy_levels.append((0, dense))
        orig_map = {o: dense[nd] for o, nd in orig_map.items()}
    return hierarchy_levels, orig_map, q_final, levels_done, metrics


def run_local_levels(
    edge_rows,
    n_nodes: int,
    m: float,
    min_gain: float,
    max_rounds: int,
    max_levels: int,
    start_level: int,
):
    """Finish the level loop on a collected quotient graph whose
    vertex ids are dense 0..n_nodes-1 (the contraction invariant).

    edge_rows: iterable of (src, dst, weight) — the symmetric quotient
    table with its self-loop diagonal. Returns (level_maps, q_final,
    levels_done, metrics): level_maps is one dict {node -> dense cid}
    per RECORDED level (the same levels the distributed loop would
    append to the hierarchy), q_final the last level's modularity,
    metrics rows in the distributed loop's format with ``level``
    offset by start_level.
    """
    cur_edges = [(int(u), int(v), float(w)) for u, v, w in edge_rows]
    cur_nodes = list(range(n_nodes))
    metrics: list[dict] = []
    level_maps: list[dict[int, int]] = []
    q_final = 0.0
    levels_done = 0
    for li in range(max_levels):
        state, improved, q_final, _ = _one_level(
            cur_edges, cur_nodes, m, min_gain, max_rounds, metrics,
            start_level + li,
        )
        levels_done = li + 1
        if not improved:
            break
        comms = sorted(set(state.values()))
        cid = {c: i for i, c in enumerate(comms)}
        dense = {v: cid[state[v]] for v in cur_nodes}
        level_maps.append(dense)
        if len(comms) == len(cur_nodes):
            break
        q_edges = defaultdict(float)
        for u, v, w in cur_edges:
            q_edges[(dense[u], dense[v])] += w
        cur_edges = [(a, b, w) for (a, b), w in q_edges.items()]
        cur_nodes = list(range(len(comms)))
    return level_maps, q_final, levels_done, metrics
