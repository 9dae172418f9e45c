from __future__ import annotations

import pytest

from linkgraph.graph.build import build_graph
from linkgraph.operators.components import connected_components
from tests.fixtures import random_edges, toy_edges_df
from tests.oracles import cc_oracle


def test_cc_toy(spark):
    g = build_graph(toy_edges_df(spark))
    got = {r.id: r.component for r in connected_components(spark, g).collect()}
    edges = [(a, b, 1.0) for a, b in
             [(r.src, r.dst) for r in toy_edges_df(spark).collect()]]
    assert got == cc_oracle(edges)
    # two components: {0,1,2,4,5,6,7,8} labeled 0, {10..13} labeled 10
    assert got[7] == 0 and got[13] == 10


@pytest.mark.parametrize("seed", [3, 99])
def test_cc_random(spark, seed):
    df = spark.createDataFrame(
        random_edges(80, 60, seed), "src long, dst long, weight double"
    )
    got = {r.id: r.component for r in connected_components(spark, df).collect()}
    assert got == cc_oracle([(r.src, r.dst, r.weight) for r in df.collect()])


def test_cc_directed_edges_treated_undirected(spark):
    df = spark.createDataFrame([(5, 1, 1.0), (1, 0, 1.0)], "src long, dst long, weight double")
    got = {r.id: r.component for r in connected_components(spark, df).collect()}
    assert got == {0: 0, 1: 0, 5: 0}
