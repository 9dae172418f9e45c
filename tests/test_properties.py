"""Property-based tests (hypothesis): randomized inputs checked
against pure-Python oracles. Complements the fixed-fixture suites —
the generators explore edge shapes (multi-edges, self-loops, isolated
ranges, adversarial key orders) no hand-written fixture covers.
Examples are bounded small: each case is a full Spark job."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_edge_lists = st.lists(
    st.tuples(
        st.integers(0, 25), st.integers(0, 25), st.integers(1, 5)
    ),
    min_size=1,
    max_size=40,
)

_key_lists = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789:/._-", min_size=1, max_size=12),
    unique=True,
    min_size=1,
    max_size=30,
)

_SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SET
@given(edges=_edge_lists)
def test_build_graph_matches_python_oracle(spark, edges):
    """S1-S3 ingest chain (symmetrize -> clean) == the reference
    semantics replayed in plain Python: reverse every non-self-loop,
    then merge duplicate (src, dst) rows by weight sum
    (graph.cpp:78-81, 132-162)."""
    from linkgraph.graph.build import build_graph

    df = spark.createDataFrame(
        [(s, d, float(w)) for s, d, w in edges],
        "src long, dst long, weight double",
    )
    got = {
        (r["src"], r["dst"]): r["weight"] for r in build_graph(df).collect()
    }
    acc: dict[tuple[int, int], float] = defaultdict(float)
    for s, d, w in edges:
        acc[(s, d)] += float(w)
        if s != d:
            acc[(d, s)] += float(w)
    assert got == dict(acc)


@_SET
@given(keys=_key_lists)
def test_dense_ids_is_global_sorted_rank(spark, keys):
    """S4/A6: the distributed range-partition + offset ranking equals
    the global sorted rank for ANY distinct key set, at a partition
    count that forces the multi-range path."""
    from linkgraph.plans.ranks import dense_ids, release_dense_ids

    df = spark.createDataFrame([(k,) for k in keys], "url string")
    mapping, n = dense_ids(df, "url", out_col="id", num_partitions=3)
    got = {r["url"]: r["id"] for r in mapping.collect()}
    release_dense_ids(mapping)
    assert n == len(keys)
    assert got == {k: i for i, k in enumerate(sorted(keys))}


@_SET
@given(edges=_edge_lists)
def test_contract_identity_mapping_is_clean(spark, edges):
    """A7 sanity law: contracting under the identity assignment equals
    clean_edges (merge multi-edges) of the input — on any graph."""
    from linkgraph.graph.build import clean_edges
    from linkgraph.graph.hierarchy import contract_graph

    df = spark.createDataFrame(
        [(s, d, float(w)) for s, d, w in edges],
        "src long, dst long, weight double",
    )
    verts = (
        df.select(F.col("src").alias("id"))
        .unionByName(df.select(F.col("dst").alias("id")))
        .distinct()
    )
    ident = verts.select("id", F.col("id").alias("community"))
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in contract_graph(df, ident).collect()
    }
    want = {
        (r["src"], r["dst"]): r["weight"] for r in clean_edges(df).collect()
    }
    assert got == want
