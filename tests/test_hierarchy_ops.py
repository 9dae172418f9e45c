from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph.build import build_graph, write_adjacency
from linkgraph.graph.hierarchy import (
    add_selfloops,
    comembership_pairs,
    community_members,
    community_sizes,
    flatten_hierarchy,
    graph_stats,
)
from linkgraph.operators.louvain import louvain
from tests.fixtures import toy_edges_df


def test_flatten_hierarchy_equals_assignment(spark):
    g = build_graph(toy_edges_df(spark))
    res = louvain(spark, g)
    flat = {r.node: r.community for r in flatten_hierarchy(res.hierarchy).collect()}
    got = {r.id: r.community for r in res.assignment.collect()}
    assert flat == got
    # level-0 flatten = level-0 mapping verbatim
    lvl0 = {r.node: r.community for r in
            res.hierarchy.filter("level = 0").collect()}
    assert {r.node: r.community
            for r in flatten_hierarchy(res.hierarchy, level=0).collect()} == lvl0


def test_community_members_and_sizes(spark):
    state = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "id long, community long"
    )
    m = {r.community: (list(r.members), r.size) for r in community_members(state).collect()}
    assert m == {0: ([0, 1], 2), 1: ([2], 1)}
    s = {r.community: r.size for r in community_sizes(state).collect()}
    assert s == {0: 2, 1: 1}


def test_comembership_pairs(spark):
    state = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1)], "id long, community long"
    )
    pairs = {(r.a, r.b) for r in comembership_pairs(state).collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2)}


def test_add_selfloops(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (1, 1, 5.0)], "src long, dst long, weight double"
    )
    out = add_selfloops(e)
    loops = {r.src: r.weight for r in out.filter("src = dst").collect()}
    assert loops == {0: 1.0, 1: 5.0}  # existing loop kept, missing added


def test_graph_stats(spark):
    g = build_graph(toy_edges_df(spark, weight=2.0))
    row = graph_stats(g).first()
    assert row.nb_links == 36 and row.max_weight == 2.0 and row.max_degree == 4


def test_write_adjacency_roundtrip(spark, tmp_path):
    g = build_graph(toy_edges_df(spark))
    path = str(tmp_path / "adj")
    write_adjacency(g, path, num_buckets=4)
    back = spark.read.parquet(path)
    assert back.count() == 36
    a = {(r.src, r.dst, r.weight) for r in g.collect()}
    b = {(r.src, r.dst, r.weight) for r in back.collect()}
    assert a == b


def test_partition_lineage_recorded(spark, tmp_path):
    from linkgraph.operators.pagerank import pagerank
    from linkgraph.plans.superstep import SuperstepRunner

    r = SuperstepRunner(
        spark,
        run_id="lin",
        checkpoint_dir=str(tmp_path / "c"),
        checkpoint_every=1,
        max_iter=3,
        partition_lineage=True,
    )
    pagerank(spark, build_graph(toy_edges_df(spark)), tol=1e-12, runner=r)
    assert len(r.lineage) > 0
    assert sum(x["rows"] for x in r.lineage if x["superstep"] == 0) == 12
    r.write_lineage(str(tmp_path / "lineage"))
    assert spark.read.parquet(str(tmp_path / "lineage")).count() == len(r.lineage)
