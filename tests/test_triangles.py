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


def test_triangles_per_vertex(spark):
    df = toy_edges_df(spark)
    got = {r.id: r.n_tri for r in triangles_per_vertex(spark, df).collect()}
    # vertex 0 is in 0-1-2, 0-1-4, 0-2-4 -> 3 triangles
    assert got[0] == 3
    assert got[4] == 3  # 0-1-4, 0-2-4, 1-2-4
    assert sum(got.values()) == 3 * 8
