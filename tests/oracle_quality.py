"""Pure-Python oracle for louvain_generalized — the full multi-level
loop under every quality id 0-9, including the reference driver's
level-0 preprocessing (add_selfloops + graph_weighting for CondorA/DP,
one-time max_w) and the per-level quality() value.

Gain formulas re-derived independently from the reference headers
(src/{modularity,zahn,owzad,goldberg,condora,devind,devuni,dp,
shimalik,balmod}.h); quality() formulas from the matching .cpp files;
graph_weighting from condora.cpp:58-104 / dp.cpp:70-108. Expression
trees mirror linkgraph.functions.quality so integer-weight runs are
bit-identical (label comparison exact); reweighted runs (ids 4/7)
produce non-integer sums, where gains remain well-separated on the
test fixtures.
"""

from __future__ import annotations

from collections import defaultdict


def numpy_gain(
    qid, dnc, degc, tot_c, in_c, self_v, w_u, w_c, m2, n, max_w,
    alpha=0.5, kappa=1.0, kappa_min=0.0,
):
    if qid == 0:
        return dnc - tot_c * degc / m2
    if qid == 1:
        return 2.0 * dnc - w_u * w_c * max_w
    if qid == 2:
        return dnc - alpha * w_u * w_c * max_w
    if qid == 3:
        if w_c == 0.0:
            return (2.0 * dnc + self_v) / (2.0 * w_u)
        return (2.0 * dnc + self_v + in_c) / (2.0 * (w_c + w_u)) - in_c / (2.0 * w_c)
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
    raise ValueError(qid)


def add_selfloops_oracle(edges):
    verts = {u for u, _, _ in edges} | {v for _, v, _ in edges}
    have = {u for u, v, _ in edges if u == v}
    return list(edges) + [(v, v, 1.0) for v in sorted(verts - have)]


def graph_weighting_oracle(edges, qid):
    deg = defaultdict(int)
    sl = defaultdict(float)
    for u, v, w in edges:
        deg[u] += 1
        if u == v:
            sl[u] += w
    out, side = [], 0.0
    for u, v, w in edges:
        aux = 2.0 * w / (deg[u] + deg[v])
        if qid == 7:
            nw = aux
            side += nw * nw
        else:
            tmp = sl[u] / (2.0 * deg[u]) + sl[v] / (2.0 * deg[v])
            nw = 2.0 * aux - tmp
            side += tmp - aux
        out.append((u, v, nw))
    return out, side


def quality_oracle(qid, aggs, m2, n, max_w, alpha=0.5, side=0.0):
    """aggs: list of (in_c, tot, w_c) per existing community."""
    nn = n * n
    if qid == 0:
        return sum(i - t * t / m2 for i, t, w in aggs if t > 0.0) / m2
    if qid == 1:
        return (
            sum(2.0 * i - max_w * w * w for i, t, w in aggs if w > 0.0)
            + nn * max_w - m2
        ) / (nn * max_w)
    if qid == 2:
        return (
            sum(i - alpha * (w * w * max_w) for i, t, w in aggs if w > 0.0)
            + alpha * (nn * max_w - m2)
        ) / (nn * max_w)
    if qid == 3:
        return sum(i / (w * 2.0) for i, t, w in aggs if w * 2.0 > 0.0) / (n * max_w)
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
    raise ValueError(qid)


def generalized_oracle(
    edges, qid, alpha=0.5, kappa=1.0, kappa_min=0.0,
    max_rounds=50, max_levels=10,
):
    """edges: symmetric directed-row list (both directions, self-loops
    once). Returns (orig->community dict, final quality, levels)."""
    edges = [(int(u), int(v), float(w)) for u, v, w in edges]
    side, max_w = 0.0, 1.0
    if qid == 7:
        max_w = max((w for _, _, w in edges), default=1.0)
        edges, side = graph_weighting_oracle(edges, 7)
    elif qid == 4:
        edges = add_selfloops_oracle(edges)
        edges, side = graph_weighting_oracle(edges, 4)
    m2 = sum(w for _, _, w in edges)
    if qid not in (4, 7):
        max_w = max((w for _, _, w in edges), default=1.0)
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    n = float(len(nodes))
    if m2 == 0.0:
        return {v: i for i, v in enumerate(nodes)}, 0.0, 0

    state = {v: v for v in nodes}
    node_w = {v: 1.0 for v in nodes}
    orig_map = {v: v for v in nodes}
    cur_edges, cur_nodes = edges, nodes
    q_final, levels_done = 0.0, 0
    for _level in range(max_levels):
        k = defaultdict(float)
        self_w = defaultdict(float)
        adj = defaultdict(list)
        for u, v, w in cur_edges:
            k[u] += w
            adj[u].append((v, w))
            if u == v:
                self_w[u] += w
        moved_any = False
        for _rnd in range(max_rounds):
            tot = defaultdict(float)
            w_c = defaultdict(float)
            size = defaultdict(int)
            in_c = defaultdict(float)
            for v in cur_nodes:
                c = state[v]
                tot[c] += k[v]
                w_c[c] += node_w[v]
                size[c] += 1
            for u, v, w in cur_edges:
                if state[u] == state[v]:
                    in_c[state[u]] += w
            kappa_live = kappa
            if qid == 8 and kappa_min > 1:
                kappa_live = float(len({state[v] for v in cur_nodes if k[v] > 0.0}))
            new_state = dict(state)
            moves = 0
            for v in cur_nodes:
                cur = state[v]
                w_vc = defaultdict(float)
                for u, w in adj[v]:
                    if u != v:
                        w_vc[state[u]] += w
                e_own = w_vc.get(cur, 0.0)
                own = numpy_gain(
                    qid, e_own, k[v], tot[cur] - k[v],
                    in_c[cur] - (2.0 * e_own + self_w[v]),
                    self_w[v], node_w[v], w_c[cur] - node_w[v],
                    m2, n, max_w, alpha, kappa_live, kappa_min,
                )
                own_gain = max(own, 0.0)
                best_gain, best_c = None, None
                for c, w in w_vc.items():
                    if c == cur:
                        continue
                    if not (c < cur or size[c] > 1 or size[cur] > 1):
                        continue
                    g = numpy_gain(
                        qid, w, k[v], tot[c], in_c[c], self_w[v],
                        node_w[v], w_c[c], m2, n, max_w,
                        alpha, kappa_live, kappa_min,
                    )
                    if best_gain is None or g > best_gain or (
                        g == best_gain and c < best_c
                    ):
                        best_gain, best_c = g, c
                if best_gain is not None and best_gain > own_gain:
                    new_state[v] = best_c
                    moves += 1
            state = new_state
            if moves == 0:
                break
            moved_any = True
        # quality at this level's fixpoint (reference per-pass print)
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
        q_final = quality_oracle(qid, aggs, m2, n, max_w, alpha, side)
        levels_done = _level + 1
        if not moved_any:
            break
        comms = sorted(set(state.values()))
        cid = {c: i for i, c in enumerate(comms)}
        dense = {v: cid[state[v]] for v in cur_nodes}
        orig_map = {o: dense[nd] for o, nd in orig_map.items()}
        if len(comms) == len(cur_nodes):
            break
        q_edges = defaultdict(float)
        new_w = defaultdict(float)
        for u, v, w in cur_edges:
            q_edges[(dense[u], dense[v])] += w
        for v in cur_nodes:
            new_w[dense[v]] += node_w[v]
        cur_edges = [(a, b, w) for (a, b), w in q_edges.items()]
        cur_nodes = list(range(len(comms)))
        node_w = dict(new_w)
        state = {v: v for v in cur_nodes}
    return orig_map, q_final, levels_done
