from __future__ import annotations

import pytest

from linkgraph.operators.triangles import triangle_count, triangles_per_vertex
from tests.fixtures import random_edges, toy_edges_df
from tests.oracles import triangle_count_oracle


def test_triangles_toy(spark):
    df = toy_edges_df(spark)
    edges = [(r.src, r.dst, r.weight) for r in df.collect()]
    expected = triangle_count_oracle(edges)
    got = triangle_count(spark, df).first()["n_triangles"]
    assert got == expected
    # 0-1-2, 0-1-4, 0-2-4, 1-2-4, 5-6-7, 5-6-8, 10-11-12, 10-11-13
    assert got == 8


def test_triangles_degree_order_variant(spark):
    df = toy_edges_df(spark)
    plain = triangle_count(spark, df).first()["n_triangles"]
    ordered = triangle_count(spark, df, degree_order=True).first()["n_triangles"]
    assert plain == ordered


@pytest.mark.parametrize("seed", [5, 17])
def test_triangles_random(spark, seed):
    raw = random_edges(30, 150, seed)
    df = spark.createDataFrame(raw, "src long, dst long, weight double")
    assert triangle_count(spark, df).first()["n_triangles"] == triangle_count_oracle(raw)
    assert (
        triangle_count(spark, df, degree_order=True).first()["n_triangles"]
        == triangle_count_oracle(raw)
    )


def test_adaptive_orientation_probe(spark):
    """degree_order=None probes max degree once: hub-free graphs take
    the plain src<dst path (no degree joins — the round-2 bench
    regression), skewed graphs the ordered path; counts identical."""
    from pyspark.sql import functions as F
    from linkgraph.graph.build import build_graph, canonicalize
    from linkgraph.operators.triangles import _max_src_degree, _orient

    df = toy_edges_df(spark)
    # the probe runs on the raw/symmetric input (canonical src<dst rows
    # would halve src-side counts)
    assert _max_src_degree(build_graph(df)) == 4
    e = canonicalize(df).filter(F.col("src") != F.col("dst")).select("src", "dst")
    # hub-free -> identity (the frame passes through untouched)
    assert _orient(e, False) is e
    assert _orient(e, True) is not e
    got = triangle_count(spark, df, degree_order=None).first()["n_triangles"]
    assert got == triangle_count(spark, df, degree_order=True).first()["n_triangles"]
    # per-vertex variant: same adaptive seam, same totals either way
    tv_plain = {r.id: r.n_tri for r in triangles_per_vertex(spark, df, degree_order=False).collect()}
    tv_ord = {r.id: r.n_tri for r in triangles_per_vertex(spark, df, degree_order=True).collect()}
    assert tv_plain == tv_ord


def test_triangles_per_vertex(spark):
    df = toy_edges_df(spark)
    got = {r.id: r.n_tri for r in triangles_per_vertex(spark, df).collect()}
    # vertex 0 is in 0-1-2, 0-1-4, 0-2-4 -> 3 triangles
    assert got[0] == 3
    assert got[4] == 3  # 0-1-4, 0-2-4, 1-2-4
    assert sum(got.values()) == 3 * 8


def test_degree_order_bounds_hub_fanout_on_skewed_graph(spark):
    """100x-scale evidence for the default plan: on a Pareto-hub graph
    (sources/edgegen), the e1.dst==e2.src wedge join's row count is
    sum_v in(v)*out(v). Degree-ordering re-orients edges so hubs have
    tiny out-lists — the wedge count (the join's intermediate size, the
    thing that explodes quadratically at web scale) must shrink by a
    large factor while the triangle count is IDENTICAL."""
    from pyspark.sql import functions as F
    from linkgraph.graph.build import canonicalize
    from linkgraph.operators.triangles import triangle_count
    from linkgraph.sources.edgegen import generate_edges

    raw = generate_edges(spark, 5000, seed=7, base_out=1, max_out=4000, pareto_a=1.02)

    def wedge_count(e):
        outd = e.groupBy("src").agg(F.count(F.lit(1)).alias("o"))
        ind = e.groupBy("dst").agg(F.count(F.lit(1)).alias("i"))
        return (
            outd.join(ind, outd.src == ind.dst)
            .agg(F.sum(F.col("o") * F.col("i")))
            .first()[0]
            or 0
        )

    canon = canonicalize(raw).filter(F.col("src") != F.col("dst")).select("src", "dst")
    deg = (
        canon.select(F.col("src").alias("id"))
        .unionByName(canon.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = (
        canon.join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "ds"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dd"), "dst")
        .select(
            F.when(
                (F.col("ds") < F.col("dd"))
                | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
                F.struct(F.col("src").alias("a"), F.col("dst").alias("b")),
            )
            .otherwise(F.struct(F.col("dst").alias("a"), F.col("src").alias("b")))
            .alias("e")
        )
        .select(F.col("e.a").alias("src"), F.col("e.b").alias("dst"))
    )
    w_plain, w_ordered = wedge_count(canon), wedge_count(oriented)
    assert w_ordered * 3 < w_plain, (w_ordered, w_plain)

    n_default = triangle_count(spark, raw).first()["n_triangles"]
    n_plain = triangle_count(spark, raw, degree_order=False).first()["n_triangles"]
    assert n_default == n_plain
