from __future__ import annotations

import pytest

from linkgraph.graph.build import build_graph
from linkgraph.operators.lpa import label_propagation
from linkgraph.plans.superstep import SuperstepRunner
from tests.fixtures import random_edges, toy_edges_df
from tests.oracles import lpa_oracle


def _spark_lpa(spark, g, rounds):
    runner = SuperstepRunner(spark, run_id="lpa-test", max_iter=rounds)
    return {
        r.id: r.label for r in label_propagation(spark, g, runner=runner).collect()
    }


def test_lpa_toy_matches_oracle_exactly(spark):
    g = build_graph(toy_edges_df(spark))
    edges = [(r.src, r.dst, r.weight) for r in g.collect()]
    # fixed synchronous rounds: Spark and oracle must agree round-for-round
    for rounds in (1, 2, 5):
        assert _spark_lpa(spark, g, rounds) == lpa_oracle(edges, max_rounds=rounds)


@pytest.mark.parametrize("seed", [11, 23])
def test_lpa_random_fixed_rounds(spark, seed):
    df = spark.createDataFrame(
        random_edges(40, 120, seed, weighted=True), "src long, dst long, weight double"
    )
    g = build_graph(df)
    edges = [(r.src, r.dst, r.weight) for r in g.collect()]
    assert _spark_lpa(spark, g, 3) == lpa_oracle(edges, max_rounds=3)


def test_lpa_converges_on_two_cliques(spark):
    # two 4-cliques joined by one bridge edge -> two communities
    clique = lambda base: [
        (base + i, base + j, 1.0) for i in range(4) for j in range(i + 1, 4)
    ]
    df = spark.createDataFrame(
        clique(0) + clique(10) + [(3, 10, 1.0)], "src long, dst long, weight double"
    )
    g = build_graph(df)
    got = _spark_lpa(spark, g, 20)
    assert len({got[i] for i in range(4)}) == 1
    assert len({got[i] for i in range(10, 14)}) == 1
    assert got[0] != got[10]
