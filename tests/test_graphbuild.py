from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph.build import (
    build_graph,
    canonicalize,
    clean_edges,
    degrees,
    renumber,
    symmetrize,
    url_dictionary,
    vertices,
)
from tests.fixtures import toy_edges_df


def test_symmetrize_doubles_non_self_loops(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (2, 2, 1.0)], "src long, dst long, weight double"
    )
    sym = symmetrize(df)
    assert sym.count() == 3  # (0,1),(1,0),(2,2)
    # symmetry invariant (check_symmetry analog, graph_binary.cpp:217-240)
    fwd = sym.filter("src != dst").select("src", "dst", "weight")
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    assert fwd.exceptAll(rev).count() == 0


def test_clean_merges_multi_edges(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    out = {(r.src, r.dst): r.weight for r in clean_edges(df).collect()}
    assert out == {(0, 1): 3.0, (1, 2): 1.0}


def test_toy_graph_build(spark):
    g = build_graph(toy_edges_df(spark))
    # 18 undirected edges, no self-loops -> 36 directed rows
    assert g.count() == 36
    assert vertices(g).count() == 12  # nodes 3 and 9 absent from base graph
    d = {r.id: (r.deg, r.wdeg) for r in degrees(g).collect()}
    assert d[0] == (3, 3.0)  # 0-1, 0-2, 0-4
    assert d[5] == (4, 4.0)  # 4-5, 5-6, 5-7, 5-8
    assert d[13] == (2, 2.0)


def test_canonicalize(spark):
    df = spark.createDataFrame(
        [(1, 0, 1.0), (0, 1, 1.0), (2, 2, 1.0)], "src long, dst long, weight double"
    )
    out = {(r.src, r.dst) for r in canonicalize(df).collect()}
    assert out == {(0, 1), (2, 2)}


def test_url_dictionary_and_renumber(spark):
    urls = spark.createDataFrame(
        [("b.com",), ("a.com",), ("c.com",), ("a.com",)], "url string"
    )
    d = {r.url: r.id for r in url_dictionary(urls).collect()}
    assert d == {"a.com": 0, "b.com": 1, "c.com": 2}

    edges = spark.createDataFrame(
        [("a.com", "c.com", 1.0), ("x.com", "a.com", 1.0)],
        "src string, dst string, weight double",
    )
    mapping = url_dictionary(urls).select(F.col("url").alias("old"), "id")
    out = {(r.src, r.dst) for r in renumber(edges, mapping).collect()}
    # x.com not in dictionary -> edge dropped (isolated-node semantics)
    assert out == {(0, 2)}


def test_host_graph_rollup(spark):
    from linkgraph.graph.build import host_graph

    rows = [
        ("https://A.example/x", "http://b.example/y", 2.0),
        ("a.example/z?q=1", "https://b.example/", 3.0),
        ("https://b.example/q#frag", "https://b.example/r", 1.0),
    ]
    df = spark.createDataFrame(rows, "src string, dst string, weight double")
    out = {
        (r.src_host, r.dst_host): (r.n_links, r.weight)
        for r in host_graph(df).collect()
    }
    # scheme optional, case folded, path/query/fragment stripped;
    # intra-host links survive as a self-loop
    assert out == {
        ("a.example", "b.example"): (2, 5.0),
        ("b.example", "b.example"): (1, 1.0),
    }
