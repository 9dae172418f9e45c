"""Pure-Python Louvain oracle with semantics IDENTICAL to
linkgraph.operators.louvain (which in turn mirrors the reference GPU
path — see that module's docstring for reference citations).

Every float expression uses the same operation tree as the Spark
implementation, so for integer-valued weights the results are
bit-identical and label comparison is exact.
"""

from __future__ import annotations

from collections import defaultdict


def _modularity(edges, state, k, m):
    # self-loops included (mirrors calculateToOwnCommunity, which has no
    # neighbour != vertex guard) — keeps Q invariant across contraction
    e_own = 0.0
    for u, v, w in edges:
        if state[u] == state[v]:
            e_own += w
    tot = defaultdict(float)
    for v, c in state.items():
        tot[c] += k[v]
    tot_sq = sum(t * t for t in tot.values())
    return float(e_own) / (2.0 * m) - float(tot_sq) / (4.0 * m * m)


def _one_level(edges, nodes, state, m, min_gain, max_rounds, frontier):
    k = defaultdict(float)
    adj = defaultdict(list)
    for u, v, w in edges:
        k[u] += w
        adj[u].append((v, w))
    twom = 2.0 * m
    q_before = _modularity(edges, state, k, m)
    improved = False
    q_after = q_before
    for _ in range(max_rounds):
        tot = defaultdict(float)
        size = defaultdict(int)
        for v in nodes:
            tot[state[v]] += k[v]
            size[state[v]] += 1
        new_state = dict(state)
        for v in nodes:
            if frontier is not None and v not in frontier:
                continue
            cur = state[v]
            w_vc = defaultdict(float)
            for u, w in adj[v]:
                if u != v:
                    w_vc[state[u]] += w
            e_own = w_vc.get(cur, 0.0)
            # scaled score S = 2M*w - k*tot_C (exact for integer
            # weights) — same operation tree as the Spark operator
            best_s, best_c = None, None
            for c, w in w_vc.items():
                if c == cur:
                    continue
                if not (c < cur or size[c] > 1 or size[cur] > 1):
                    continue
                s = twom * w - k[v] * tot[c]
                if (
                    best_s is None
                    or s > best_s
                    or (s == best_s and c < best_c)
                ):
                    best_s, best_c = s, c
            if (
                best_s is not None
                and best_s + k[v] * (tot[cur] - k[v]) - twom * e_own > 0.0
            ):
                new_state[v] = best_c
        state = new_state
        q_after = _modularity(edges, state, k, m)
        gain = q_after - q_before
        q_before = q_after
        if gain > 0:
            improved = True
        if gain < min_gain:
            break
    return state, improved, q_after


def louvain_oracle(
    edges,
    min_gain=1e-6,
    max_rounds=100,
    max_levels=20,
    init_partition=None,
    frontier=None,
    nodes=None,
):
    """edges: symmetric directed-row list (both directions present,
    self-loops once), weights float. nodes: optional extra (possibly
    isolated) vertex ids. Returns (assignment dict orig->dense
    community, modularity, levels)."""
    m = sum(w for _, _, w in edges) / 2.0
    nodes = sorted(
        {u for u, _, _ in edges}
        | {v for _, v, _ in edges}
        | (set(nodes) if nodes is not None else set())
    )
    state = {
        v: (init_partition.get(v, v) if init_partition else v) for v in nodes
    }
    orig_map = {v: v for v in nodes}
    force = init_partition is not None
    q_final = 0.0
    levels_done = 0
    cur_edges = list(edges)
    cur_nodes = nodes
    cur_frontier = set(frontier) if frontier is not None else None
    recorded = False
    for level in range(max_levels):
        state, improved, q_final = _one_level(
            cur_edges, cur_nodes, state, m, min_gain, max_rounds, cur_frontier
        )
        levels_done = level + 1
        if not improved and not force:
            break
        force = False
        # dense renumber by ascending community id
        comms = sorted(set(state.values()))
        cid = {c: i for i, c in enumerate(comms)}
        dense = {v: cid[c] for v, c in state.items()}
        recorded = True
        orig_map = {o: dense[n] for o, n in orig_map.items()}
        if len(comms) == len(cur_nodes):
            break
        # contract
        q_edges = defaultdict(float)
        for u, v, w in cur_edges:
            q_edges[(dense[u], dense[v])] += w
        cur_edges = [(a, b, w) for (a, b), w in q_edges.items()]
        # next-level nodes = ALL community ids (isolated ones included)
        cur_nodes = list(range(len(comms)))
        state = {v: v for v in cur_nodes}
        cur_frontier = None
    if not recorded:
        comms = sorted(set(state.values()))
        cid = {c: i for i, c in enumerate(comms)}
        orig_map = {o: cid[state[n]] for o, n in orig_map.items()}
    return orig_map, q_final, levels_done
