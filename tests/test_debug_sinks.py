"""K4 debug echo sinks (graph/debug.py) — reference
graph_binary.cpp:185-240 semantics as DataFrames."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph.build import build_graph
from linkgraph.graph.debug import check_symmetry, display_adjacency, display_reverse
from tests.fixtures import toy_edges_df


def test_display_adjacency(spark):
    g = build_graph(toy_edges_df(spark))
    adj = {r.node: [(n.dst, n.weight) for n in r.neighbors]
           for r in display_adjacency(g).collect()}
    want = {}
    for r in g.collect():
        want.setdefault(r.src, []).append((r.dst, r.weight))
    want = {k: sorted(v) for k, v in want.items()}
    assert adj == want


def test_display_reverse(spark):
    g = build_graph(toy_edges_df(spark))
    got = {(r.a, r.b) for r in display_reverse(g).collect()}
    want = {(r.dst, r.src) for r in g.collect() if r.src > r.dst}
    assert got == want
    assert all(a < b for a, b in got)


def test_check_symmetry(spark):
    g = build_graph(toy_edges_df(spark))
    assert check_symmetry(g).count() == 0  # build_graph output is symmetric
    broken = g.unionByName(
        spark.createDataFrame([(900, 901, 1.0)], "src long, dst long, weight double")
    )
    v = check_symmetry(broken).collect()
    assert {(r.src, r.dst) for r in v} == {(900, 901)}
    assert v[0].reverse_weight is None
