from __future__ import annotations

import pytest

from linkgraph.graph.build import build_graph
from linkgraph.graph.hierarchy import add_selfloops
from linkgraph.operators.louvain_quality import louvain_generalized
from tests.fixtures import toy_edges_df


import os

# full 10-metric sweep is slow (~20-60s per metric); default suite runs
# a branch-covering subset, LINKGRAPH_SLOW=1 runs all (done in CI docs /
# STATUS.md; all 10 verified passing)
_QIDS = list(range(10)) if os.environ.get("LINKGRAPH_SLOW") else [0, 3, 9]


@pytest.mark.parametrize("qid", _QIDS)
def test_generalized_louvain_runs_every_quality(spark, qid):
    g = build_graph(toy_edges_df(spark))
    if qid == 4:  # CondorA requires self-loops (reference -q 4 preprocessing)
        g = add_selfloops(g)
    res = louvain_generalized(
        spark, g, quality_id=qid, max_levels=2, max_rounds_per_level=6
    )
    got = {r.id: r.community for r in res.assignment.collect()}
    assert len(got) == 12  # full vertex cover
    assert res.levels >= 1


def test_generalized_modularity_finds_toy_communities(spark):
    g = build_graph(toy_edges_df(spark))
    res = louvain_generalized(spark, g, quality_id=0)
    got = {r.id: r.community for r in res.assignment.collect()}
    # the CPU-gain synchronous loop should still isolate the 10-13 clique
    assert len({got[i] for i in (10, 11, 12, 13)}) == 1
    assert got[10] != got[0]
    assert 2 <= len(set(got.values())) <= 4
    # deterministic across runs
    res2 = louvain_generalized(spark, g, quality_id=0)
    assert got == {r.id: r.community for r in res2.assignment.collect()}


# ---- exact-label + quality cross-oracle (all 10 ids) -----------------

from tests.oracle_quality import generalized_oracle


def _edge_rows(g):
    return [(r.src, r.dst, r.weight) for r in g.select("src", "dst", "weight").collect()]


@pytest.mark.parametrize("qid", list(range(10)))
def test_generalized_labels_and_quality_match_oracle_toy(spark, qid):
    """End-to-end cross-validation vs the independent NumPy oracle:
    exact labels + quality() to 1e-9, for every quality id, including
    the level-0 graph_weighting preprocessing (CondorA/DP)."""
    g = build_graph(toy_edges_df(spark))
    res = louvain_generalized(
        spark, g, quality_id=qid, max_levels=4, max_rounds_per_level=12
    )
    want, q_want, lv_want = generalized_oracle(
        _edge_rows(g), qid, max_rounds=12, max_levels=4
    )
    got = {r.id: r.community for r in res.assignment.collect()}
    assert got == want, f"labels diverge for qid={qid}"
    assert res.quality == pytest.approx(q_want, abs=1e-9), f"quality qid={qid}"
    assert res.levels == lv_want


_RAND_QIDS = list(range(10)) if os.environ.get("LINKGRAPH_SLOW") else [1, 4, 7, 8]


@pytest.mark.parametrize("qid", _RAND_QIDS)
def test_generalized_matches_oracle_random_graph(spark, qid):
    """Seeded random graph (integer weights 1-3, planted blocks)."""
    import random

    rng = random.Random(42)
    raw = set()
    for _ in range(90):
        block = rng.randrange(4)
        u = rng.randrange(10) + block * 10
        v = rng.randrange(10) + block * 10
        if u != v:
            raw.add((min(u, v), max(u, v)))
    for _ in range(12):  # sparse inter-block edges
        u, v = rng.randrange(40), rng.randrange(40)
        if u != v:
            raw.add((min(u, v), max(u, v)))
    rows = [(u, v, float(rng.randint(1, 3))) for u, v in sorted(raw)]
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    g = build_graph(df)
    res = louvain_generalized(
        spark, g, quality_id=qid, max_levels=3, max_rounds_per_level=8
    )
    want, q_want, lv_want = generalized_oracle(
        _edge_rows(g), qid, max_rounds=8, max_levels=3
    )
    got = {r.id: r.community for r in res.assignment.collect()}
    assert got == want, f"labels diverge for qid={qid}"
    assert res.quality == pytest.approx(q_want, abs=1e-9)


def test_generalized_big_path_labels_match_broadcast(spark):
    """broadcast_threshold=0 (pure shuffle path, dst-partitioned level
    checkpoints) must produce the exact labels of the broadcast path —
    including id 3 (Goldberg), whose gain reads the in_c values now
    derived from the round's single gather."""
    from linkgraph.graph.build import build_graph
    from linkgraph.operators.louvain_quality import louvain_generalized
    from tests.fixtures import random_edges

    df = spark.createDataFrame(
        random_edges(40, 100, 23, weighted=True), "src long, dst long, weight double"
    )
    g = build_graph(df)
    # qid 3 is the load-bearing case: its gain reads in_c on BOTH the
    # candidate and the removed-own side (one shuffle-path run keeps
    # the suite's wall time in check; id-0 big==broadcast is locked in
    # test_plans for the main loop)
    qid = 3
    a = louvain_generalized(spark, g, quality_id=qid, max_levels=3)
    b = louvain_generalized(
        spark, g, quality_id=qid, max_levels=3, broadcast_threshold=0
    )
    la = {r.id: r.community for r in a.assignment.collect()}
    lb = {r.id: r.community for r in b.assignment.collect()}
    assert la == lb
    assert a.quality == pytest.approx(b.quality, rel=1e-12, abs=1e-12)


_LOCAL_QIDS = list(range(10)) if os.environ.get("LINKGRAPH_SLOW") else [0, 3, 8, 9]


@pytest.mark.parametrize("qid", _LOCAL_QIDS)
def test_generalized_local_fastpath_identical(spark, qid):
    """The small-quotient local fast path (default on, kicks in at
    level 1) must make IDENTICAL decisions to the pure distributed
    loop (local_threshold=0) — labels, level count, and per-round move
    counts exactly (the integer decision-algebra argument in
    operators/louvain_quality_local.py). The quality SCALARS are
    compared to 1e-12, not bitwise: quality_value is a single-group
    float Sum whose partials merge in task-arrival order, so even two
    identical distributed runs can differ in the last ulp."""
    from tests.fixtures import random_edges

    df = spark.createDataFrame(
        random_edges(40, 100, 7, weighted=True), "src long, dst long, weight double"
    )
    g = build_graph(df)
    a = louvain_generalized(spark, g, quality_id=qid, max_levels=4)
    b = louvain_generalized(
        spark, g, quality_id=qid, max_levels=4, local_threshold=0
    )
    la = {r.id: r.community for r in a.assignment.collect()}
    lb = {r.id: r.community for r in b.assignment.collect()}
    assert la == lb
    assert a.quality == pytest.approx(b.quality, rel=1e-12, abs=1e-12)
    assert a.levels == b.levels
    moves_a = [(m["level"], m["round"], m["moves"])
               for m in a.metrics if "moves" in m]
    moves_b = [(m["level"], m["round"], m["moves"])
               for m in b.metrics if "moves" in m]
    assert moves_a == moves_b
    quals_a = [(m["level"], m["quality"]) for m in a.metrics if "quality" in m]
    quals_b = [(m["level"], m["quality"]) for m in b.metrics if "quality" in m]
    assert [lv for lv, _ in quals_a] == [lv for lv, _ in quals_b]
    for (_, xa), (_, xb) in zip(quals_a, quals_b):
        assert xa == pytest.approx(xb, rel=1e-12, abs=1e-12)
    # the fast path actually engaged: level-1+ rounds ran locally, so
    # the default run must have been faster to produce... assert via
    # levels: both ran >1 level (otherwise this test is vacuous)
    assert a.levels > 1
