"""Deterministic test graphs (FIXTURES.md F3/F4).

TOY_EDGES reproduces the reference's ToyExample base graph
(/root/reference/ToyExample/Example.txt — 18 undirected edges over
nodes 0..13; documented in FIXTURES.md). Delta batches follow the
reference's per-timestep delta_add{t}/delta_del{t} files.
"""

from __future__ import annotations

import numpy as np

TOY_EDGES = [
    (0, 1), (0, 2), (0, 4), (1, 2), (1, 4), (2, 4), (2, 6), (4, 5),
    (5, 6), (5, 7), (5, 8), (6, 7), (6, 8),
    (10, 11), (10, 12), (10, 13), (11, 12), (11, 13),
]

# deltas(ts, op, src, dst) — FIXTURES.md F3
TOY_DELTAS = [
    (0, "del", 0, 1), (0, "del", 1, 2),
    (0, "add", 3, 9), (0, "add", 4, 6), (0, "add", 14, 15),
    (1, "del", 10, 11), (1, "del", 10, 12), (1, "del", 10, 13),
    (1, "add", 3, 10), (1, "add", 9, 10), (1, "add", 14, 16),
]


def toy_edges_df(spark, weight: float = 1.0):
    rows = [(int(a), int(b), float(weight)) for a, b in TOY_EDGES]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def toy_deltas_df(spark):
    rows = [(int(t), op, int(a), int(b), 1.0) for t, op, a, b in TOY_DELTAS]
    return spark.createDataFrame(rows, "ts int, op string, src long, dst long, weight double")


def random_edges(n: int, m: int, seed: int, weighted: bool = False) -> list[tuple[int, int, float]]:
    """Seeded Erdős–Rényi-ish multigraph edge list (F4)."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    w = rng.integers(1, 5, size=m).astype(float) if weighted else np.ones(m)
    return [(int(a), int(b), float(c)) for a, b, c in zip(src, dst, w)]


def random_edges_df(spark, n: int, m: int, seed: int, weighted: bool = False):
    return spark.createDataFrame(
        random_edges(n, m, seed, weighted), "src long, dst long, weight double"
    )
