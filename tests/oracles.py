"""Single-machine NumPy reference implementations (SURVEY.md §5.2.2).

These stand in for the reference binaries (no CUDA toolchain here):
synchronous-round semantics with the GPU path's deterministic
tie-breaks (lowest community id — /root/reference/src/gpu-louvain/
modularity_optimisation.cu:157-160), documented in SURVEY.md §2 W2/W3.
Spark results must match labels exactly and scores to 1e-6.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


def pagerank_oracle(
    edges: list[tuple[int, int, float]],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> dict[int, float]:
    """Directed weighted PageRank with uniform dangling redistribution —
    the exact recurrence of linkgraph.operators.pagerank."""
    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    out_w = np.zeros(n)
    for u, v, w in edges:
        out_w[idx[u]] += w
    score = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        incoming = np.zeros(n)
        for u, v, w in edges:
            incoming[idx[v]] += score[idx[u]] * (w / out_w[idx[u]])
        dangling = score[out_w == 0].sum()
        new = (1.0 - damping) / n + damping * (incoming + dangling / n)
        if np.max(np.abs(new - score)) < tol:
            score = new
            break
        score = new
    return {u: float(score[idx[u]]) for u in nodes}


def cc_oracle(edges: list[tuple[int, int, float]]) -> dict[int, int]:
    """Connected components on the undirected graph: label = min node id
    in the component (union-find; exact fixpoint)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v, _ in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {u: find(u) for u in parent}


def lpa_oracle(
    edges: list[tuple[int, int, float]], max_rounds: int = 20
) -> dict[int, int]:
    """Synchronous weighted label propagation with the GPU tie-breaks:
    best label = argmax of summed incident weight, ties -> lowest label;
    a vertex keeps its label when its own label already achieves the
    max (stability rule); stop when no vertex changes."""
    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    nodes: set[int] = set()
    for u, v, w in edges:
        nodes.update((u, v))
        if u != v:
            adj[u].append((v, w))
            adj[v].append((u, w))
    label = {u: u for u in nodes}
    for _ in range(max_rounds):
        new_label = {}
        changed = 0
        for u in nodes:
            if not adj[u]:
                new_label[u] = label[u]
                continue
            weight_by_label: dict[int, float] = defaultdict(float)
            for v, w in adj[u]:
                weight_by_label[label[v]] += w
            best_w = max(weight_by_label.values())
            cands = sorted(l for l, w in weight_by_label.items() if w == best_w)
            cur = label[u]
            pick = cur if cur in cands else cands[0]
            new_label[u] = pick
            changed += pick != cur
        label = new_label
        if changed == 0:
            break
    return label


def triangle_count_oracle(edges: list[tuple[int, int, float]]) -> int:
    """Global triangle count on the simple undirected graph (self-loops
    and multi-edges removed)."""
    adj: dict[int, set[int]] = defaultdict(set)
    canon = set()
    for u, v, _ in edges:
        if u == v:
            continue
        a, b = min(u, v), max(u, v)
        canon.add((a, b))
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    count = 0
    for a, b in canon:
        count += len([c for c in adj[a] & adj[b] if c > b])
    return count
