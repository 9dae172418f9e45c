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


def test_split_corpus_deterministic_and_stable(spark):
    """Hash split: ~test_frac of rows in 'test' (uniformity band),
    byte-identical across calls, and adding documents never reassigns
    existing ones (the subset's labels agree with the superset's)."""
    from linkgraph.functions.corpus import split_corpus

    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = split_corpus(docs, test_frac=0.2)
    labels = {r["doc_id"]: (r["split"], r["bucket"]) for r in out.collect()}
    n_test = sum(1 for s, _ in labels.values() if s == "test")
    assert 0.12 <= n_test / 2000 <= 0.28
    sub = split_corpus(docs.filter("doc_id < 500"), test_frac=0.2)
    assert all(
        labels[r["doc_id"]] == (r["split"], r["bucket"]) for r in sub.collect()
    )


def test_stratified_sample_quotas(spark):
    """Per-group fraction sampling: full-quota group kept whole,
    half-quota group lands in the uniformity band, unlisted group
    dropped entirely; sample is deterministic."""
    from linkgraph.functions.corpus import stratified_sample

    rows = [(i, "a" if i % 3 == 0 else ("b" if i % 3 == 1 else "c")) for i in range(1800)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = stratified_sample(df, {"a": 1.0, "b": 0.5}, group_col="grp")
    got = [(r["doc_id"], r["grp"]) for r in out.collect()]
    per = {}
    for _, g in got:
        per[g] = per.get(g, 0) + 1
    assert per.get("a") == 600 and "c" not in per
    assert 0.35 <= per.get("b", 0) / 600 <= 0.65
    again = [(r["doc_id"], r["grp"]) for r in
             stratified_sample(df, {"a": 1.0, "b": 0.5}, group_col="grp").collect()]
    assert sorted(got) == sorted(again)


def test_decontaminate_drops_ngram_overlap(spark):
    """A doc sharing an 8-gram with the probe is dropped; disjoint and
    too-short docs survive; probe members themselves are dropped."""
    from linkgraph.functions.corpus import decontaminate

    bench = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (0, bench),                                      # probe member
        (1, "prefix words " + bench + " suffix words"),  # contains the 8-gram
        (2, "a completely different document with plenty of words inside it"),
        (3, "too short to shingle"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    probe = df.filter("doc_id = 0")
    got = {r["doc_id"] for r in decontaminate(df, probe, n=8).collect()}
    assert got == {2, 3}


def test_pack_documents_budget_and_determinism(spark):
    """Every doc lands in exactly one bin; within a bin, the exclusive
    prefix rule holds (all docs but the last fit under the budget);
    bins are contiguous in key order per shard; re-run is identical."""
    from linkgraph.functions.corpus import pack_documents

    rows = [(i, "w " * (5 + (i * 7) % 40)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_documents(df, max_tokens_per_bin=64, n_shards=4)
    recs = [
        (r["shard"], r["bin_id"], r["doc_id"], r["n_tokens"])
        for r in out.collect()
    ]
    assert len(recs) == 300 and len({r[2] for r in recs}) == 300
    bins: dict[int, list[tuple[int, int]]] = {}
    for shard, bin_id, doc_id, nt in recs:
        assert bin_id >> 32 == shard
        bins.setdefault(bin_id, []).append((doc_id, nt))
    for members in bins.values():
        members.sort()
        assert sum(nt for _, nt in members[:-1]) < 64
    # per shard, bin index is non-decreasing in key order
    for shard in {r[0] for r in recs}:
        seq = sorted((d, b) for s, b, d, _ in recs if s == shard)
        assert all(seq[i][1] <= seq[i + 1][1] for i in range(len(seq) - 1))
    again = [
        (r["shard"], r["bin_id"], r["doc_id"], r["n_tokens"])
        for r in pack_documents(df, max_tokens_per_bin=64, n_shards=4).collect()
    ]
    assert sorted(recs) == sorted(again)
