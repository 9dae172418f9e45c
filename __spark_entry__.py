"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The link graph used by the graph queries is derived deterministically
from the driver's own parquet tables (orders/customer) so each graph
operator has an exact ANSI-SQL oracle — see
linkgraph/sources/testdata.py for the canonical derivation; the SQL
CTE string there mirrors it verbatim.

Iterative queries are exposed in fixed-superstep form (pagerank_k8,
cc_k12, ...) so the oracle is a finite unrolled SQL pipeline; the
convergence-mode variants (tol=1e-6 fixpoints) are validated against
NumPy oracles in tests/ (see tests/oracles.py), per SURVEY.md §5.2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.sources.testdata import EDGES_CTE, undirected_edges

DAMPING = 0.85


# --------------------------------------------------------------------
# Spark queries
# --------------------------------------------------------------------

def _q_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return undirected_edges(spark, sf_dir)


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.graph.build import degrees

    return degrees(undirected_edges(spark, sf_dir)).select("id", "deg", "wdeg")


def _q_pagerank_k8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.operators.pagerank import pagerank

    edges = undirected_edges(spark, sf_dir)
    scores = pagerank(spark, edges, damping=DAMPING, tol=0.0, max_iter=8)
    return scores.select("id", F.round("score", 7).alias("score"))


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.operators.triangles import triangle_count

    return triangle_count(spark, undirected_edges(spark, sf_dir))


def _q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fixpoint. The oracle unrolls 16 rounds — 3x the observed
    round count at sf0.01 (~5) so an sf bump cannot silently turn a
    correct engine red; min-propagation is monotone, so extra oracle
    rounds beyond the true diameter are no-ops."""
    from linkgraph.operators.components import connected_components

    return connected_components(spark, undirected_edges(spark, sf_dir), max_iter=50)


def _q_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-star/small-star contraction (O(log n) rounds) — must
    produce the EXACT labels of min-label propagation (component = min
    vertex id), so it shares the connected_components oracle SQL."""
    from linkgraph.operators.components import connected_components

    return connected_components(
        spark, undirected_edges(spark, sf_dir), algorithm="star"
    )


def _q_triangles_per_vertex(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.operators.triangles import triangles_per_vertex

    return triangles_per_vertex(spark, undirected_edges(spark, sf_dir))


def _q_lpa_k4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.operators.lpa import label_propagation
    from linkgraph.plans.superstep import SuperstepRunner

    runner = SuperstepRunner(spark, run_id="lpa_k4", max_iter=4)
    return label_propagation(spark, undirected_edges(spark, sf_dir), runner=runner)


def _q_louvain_move_round1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronous Louvain move round from the singleton partition
    (A1+W1+W2+W3+acceptance) — SQL-expressible, so it gets an exact
    oracle; the full multi-level fixpoint is validated in tests/."""
    from linkgraph.operators.louvain import _k_table, _move_round

    edges = undirected_edges(spark, sf_dir)
    m = float(edges.groupBy().sum("weight").first()[0]) / 2.0
    verts = edges.select(F.col("src").alias("id")).distinct()
    state = verts.select("id", F.col("id").alias("community"))
    k_df = _k_table(edges)
    return _move_round(edges, state, k_df, m, None, True).select("id", "community")


def _q_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/A10 reductions (counts + max weight/degree) over the
    symmetric table (graph_binary.cpp:132-140)."""
    from linkgraph.graph.hierarchy import graph_stats

    return graph_stats(undirected_edges(spark, sf_dir))


def _q_community_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3/A9 community sink (cluster{t}.txt analog) over the round-1
    move assignment — the assignment itself is exact-oracled above."""
    from linkgraph.graph.hierarchy import community_sizes

    return community_sizes(_q_louvain_move_round1(spark, sf_dir))


def _q_louvain_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 contraction (community_aggregation.cu:248-347): quotient
    graph under the round-1 assignment — weights are sums of
    integer-valued weights, so the comparison is exact."""
    from linkgraph.graph.hierarchy import contract_graph

    e = undirected_edges(spark, sf_dir)
    return contract_graph(e, _q_louvain_move_round1(spark, sf_dir))


def _q_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1/J7 flatten (main_hierarchy.cpp:112-161) of a REAL two-level
    hierarchy: level 0 = the round-1 move assignment, level 1 = one
    move round on the contracted quotient graph (both levels start
    from singletons, so the same scaled-integer decision tree as
    louvain_move_round1 applies — the quotient's self-loops live in k
    but are excluded from e(v->C) by the P3 guard on both engines)."""
    from linkgraph.graph.hierarchy import contract_graph, flatten_hierarchy
    from linkgraph.operators.louvain import _k_table, _move_round

    e = undirected_edges(spark, sf_dir)
    moves0 = _q_louvain_move_round1(spark, sf_dir)
    ced = contract_graph(e, moves0)
    m = float(ced.groupBy().sum("weight").first()[0]) / 2.0
    verts1 = ced.select(F.col("src").alias("id")).distinct()
    state1 = verts1.select("id", F.col("id").alias("community"))
    moves1 = _move_round(ced, state1, _k_table(ced), m, None, True)
    hier = moves0.select(
        F.lit(0).alias("level"), F.col("id").alias("node"), "community"
    ).unionByName(
        moves1.select(F.lit(1).alias("level"), F.col("id").alias("node"), "community")
    )
    return flatten_hierarchy(hier)


def _q_comembership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 sparse co-membership pairs (main_matrix.cpp:113-170) over the
    round-1 assignment — O(sum |c|^2) by design; a small-scale debug
    sink in the reference too (documented in graph/hierarchy.py)."""
    from linkgraph.graph.hierarchy import comembership_pairs

    return comembership_pairs(_q_louvain_move_round1(spark, sf_dir))


def _q_renumber_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/K5 end-to-end: string vertex keys (urls synthesized
    deterministically from the ids) -> distributed dense-id dictionary
    (plans/ranks.py — range-partition + offset, no single-partition
    sort) -> both endpoints remapped (graph.cpp:93-130). The oracle is
    a plain ROW_NUMBER over the sorted urls, so this certifies the
    distributed ranking scheme against the naive global sort."""
    from linkgraph.graph.build import renumber, url_dictionary

    e = undirected_edges(spark, sf_dir)
    url = lambda c: F.concat(F.lit("https://example.org/p/"), F.col(c).cast("string"))
    urls = e.select(url("src").alias("url")).distinct()
    mapping = url_dictionary(urls).select(F.col("url").alias("old"), "id")
    e_urls = e.select(
        url("src").alias("src"), url("dst").alias("dst"), "weight"
    )
    return renumber(e_urls, mapping)


def _q_host_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webgraph host rollup: page urls (synthesized deterministically —
    97 hosts, ids spread across them) aggregated to the host-level
    graph. The host extraction regex runs verbatim on both engines."""
    from linkgraph.graph.build import host_graph

    e = undirected_edges(spark, sf_dir)
    url = lambda c: F.concat(
        F.lit("https://Host"),
        (F.col(c) % 97).cast("string"),
        F.lit(".example/p/"),
        F.col(c).cast("string"),
    )
    pages = e.select(url("src").alias("src"), url("dst").alias("dst"), "weight")
    return host_graph(pages)


def _q_zahn_move_round1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronous move round of the GENERALIZED engine under
    quality id 1 (Zahn-Condorcet, zahn.h:96-108) from singletons —
    the extension tier's exact-oracle touchpoint, running the real
    ``_move_round_q`` (folded state, CPU remove-then-evaluate own-gain,
    W3 guard). From singletons the own-gain is exactly 0 and the guard
    reduces to c < v, so acceptance is ``2*w - max_w > 0`` — integer
    arithmetic on both engines."""
    from linkgraph.operators.louvain_quality import _move_round_q

    e = undirected_edges(spark, sf_dir)
    row = e.agg(
        F.sum("weight").alias("m2"), F.max("weight").alias("mw")
    ).first()
    m2, max_w = float(row["m2"]), float(row["mw"])
    verts = e.select(F.col("src").alias("id")).distinct()
    k_df = e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k"))
    self_df = (
        e.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.sum("weight").alias("self_w"))
    )
    per_node = (
        verts.join(k_df, "id", "left")
        .join(self_df, "id", "left")
        .select(
            "id",
            F.col("id").alias("community"),
            F.coalesce("k", F.lit(0.0)).alias("k"),
            F.lit(1.0).alias("w_u"),
            F.coalesce("self_w", F.lit(0.0)).alias("self_w"),
        )
    )
    n = float(verts.count())
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out = _move_round_q(e, per_node, 1, {}, m2, n, max_w, True, n_part)
    return out.select("id", "community")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.functions.text import char_count, token_count

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        char_count(F.col("text")).cast("long").alias("n_chars_computed"),
    )


def _q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.functions.text import quality_features

    return quality_features(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "mean_tok_len", "punct_ratio", "stop_ratio", "quality_score"
    )


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.functions.text import language_id

    return language_id(_docs(spark, sf_dir))


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.functions.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), n=3, threshold=0.5, max_shingle_df=None
    )


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, portable shingle hash. EXACT
    oracle: sig_i = (a_i*h + b_i) mod 2^31-1 over the 31-bit polynomial
    shingle hash h, with the (a_i, b_i) constants inlined into the
    DuckDB SQL from the same ``minhash_coeffs`` call; band buckets are
    the signature slices themselves, so the candidate set is
    "pairs agreeing on some band" on both engines bit-for-bit.
    (shingle_hash='xxhash64' is the faster default mode, covered by
    pytest.)"""
    from linkgraph.functions.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(spark, sf_dir), threshold=0.5, shingle_hash="portable"
    )


def _q_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-exact LSH gate (VERDICT r3 #7): the candidate GENERATION is
    xxhash64-banded (not SQL-expressible), but the VERIFICATION stage —
    exact n-gram Jaccard on the candidates — is. The DuckDB oracle
    recomputes ALL exact pairs >= 0.6; equality certifies the banded
    LSH's recall on this dataset end-to-end (hashing deterministic,
    data fixed), upgrading the MinHash row from rows-only to exact."""
    from linkgraph.functions.dedup import minhash_verified_pairs

    return minhash_verified_pairs(
        _docs(spark, sf_dir), num_hashes=64, bands=32, threshold=0.6
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, portable token hash. EXACT oracle: the
    4-block pigeonhole guarantees recall at hamming <= 3, so the Spark
    output equals the full all-pairs hamming filter the oracle runs;
    the portable polynomial char hash is re-derived in DuckDB SQL
    bit-for-bit. (token_hash='xxhash64' is the faster default mode,
    covered by pytest.)"""
    from linkgraph.functions.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=3, token_hash="portable")


def _q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash fingerprint, portable token hash — exactly
    reproducible in DuckDB SQL (the cross-engine dedup mode;
    token_hash='xxhash64' is the faster default, covered by pytest)."""
    from linkgraph.functions.text import fingerprint

    return fingerprint(_docs(spark, sf_dir), token_hash="portable")


def _q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data pipeline: quality filter -> language
    filter -> exact dedup -> verified near-dup removal (drop the
    higher id of every exact-Jaccard >= 0.6 pair). EXACT oracle: the
    DuckDB side recomputes every stage — including ALL exact near-dup
    pairs on the same filtered subset — so green certifies both the
    composition and the banded LSH's recall end-to-end."""
    from linkgraph.functions.corpus import clean_corpus

    return clean_corpus(_docs(spark, sf_dir))


def _q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/test split (10% test) over the documents
    table — portable-hash bucketing, so the DuckDB oracle re-derives
    the exact buckets and split labels."""
    from linkgraph.functions.corpus import split_corpus

    return split_corpus(_docs(spark, sf_dir), test_frac=0.1).select(
        "doc_id", "bucket", "split"
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota sampling (en 50% / de 25% / fr 10%) — the
    data-mixing step of a training pipeline, filter-only at scale."""
    from linkgraph.functions.corpus import stratified_sample
    from linkgraph.functions.text import language_id

    langs = language_id(_docs(spark, sf_dir))
    return stratified_sample(
        langs, {"en": 0.5, "de": 0.25, "fr": 0.1}
    ).select("doc_id", "pred_lang", "bucket")


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: probe set = every 50th document
    (standing in for an eval benchmark); docs sharing any word 8-gram
    with it are dropped — broadcast semi/anti-join shape."""
    from linkgraph.functions.corpus import decontaminate

    d = _docs(spark, sf_dir)
    probe = d.filter(F.col("doc_id") % 50 == 0)
    return decontaminate(d, probe, n=8).select("doc_id")


def _q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into 512-token bins across 8 hash shards —
    deterministic shard + key order, exclusive-prefix-sum binning."""
    from linkgraph.functions.corpus import pack_documents

    return pack_documents(
        _docs(spark, sf_dir), max_tokens_per_bin=512, n_shards=8
    ).select("doc_id", "n_tokens", "shard", "bin_id")


def _q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.functions.similarity import knn_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return knn_bruteforce(emb, queries, k=5)


def _q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN with an EXACT oracle: the hyperplanes are
    deterministic (seeded PCG64), so the oracle SQL inlines the same
    constants as literals and evaluates each projection as a
    left-associated addition chain — the exact IEEE order of Spark's
    ``F.aggregate`` left fold — making bucket bits, multi-probe set and
    the reranked top-k reproducible bit-for-bit in DuckDB. (Recall vs
    brute force is additionally asserted in tests/.)"""
    from linkgraph.functions.similarity import knn_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return knn_lsh(emb, queries, k=5, n_planes=6)


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN (the task brief's IVF scale path) with an EXACT
    oracle: the coarse centroids are a deterministic data-derived
    sample (smallest Knuth-hash ids — plain integer arithmetic), the
    squared-L2 assignment is a left-fold sum (bit-identical to a
    left-associated SQL addition chain; ties to the lower cid), and
    the rerank is the same rounded exact cosine as knn_lsh — so the
    inverted lists, probe sets and top-k reproduce bit-for-bit in
    DuckDB with NO inlined constants: the oracle recomputes the
    quantizer from the table itself."""
    from linkgraph.functions.similarity import knn_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return knn_ivf(emb, queries, k=5, n_centroids=16, n_probe=4)


def _q_knn_ivf_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed IVF query JOIN over a durable cid-partitioned index
    (functions/similarity.py::knn_ivf_join — the corpus-vs-corpus
    shape: queries are never collected to the driver; the corpus is
    never re-quantized). The index is built from the table with the
    same deterministic data-derived quantizer as knn_ivf, and the low
    hot_list_cap forces the salted hot-list split (~312-row lists vs a
    200 cap), so this oracle certifies BOTH round-5 mechanisms: the
    result equals knn_ivf with the same quantizer, recomputed in SQL
    with no inlined constants."""
    import os
    import tempfile

    from linkgraph.functions.similarity import build_ivf_index, knn_ivf_join

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    idx = os.path.join(tempfile.gettempdir(), "linkgraph_harness_ivf_join")
    build_ivf_index(emb, idx, n_centroids=16)
    return knn_ivf_join(
        spark, idx, queries, k=5, n_probe=4, hot_list_cap=200
    )


def _q_knn_ivf_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read over the MAINTAINED bucketed IVF table
    (functions/similarity.py::ivf_table_upsert/_delete +
    knn_ivf_join_table): build the catalog table, append a shifted-id
    batch (gen 1), tombstone vec_id % 41 == 0 (cut at gen 1), then
    replace-re-add vec_id % 82 == 0 (gen 2 — survives the cut), and
    query WITHOUT compacting, so the oracle certifies the read path
    itself: bucketed base minus tombstones, plus the delta cogrouped
    separately, partial top-ks unioned before the global window. The
    oracle recomputes the live set from the same modular slices and
    the quantizer from the table (no inlined constants)."""
    import os
    import tempfile

    from linkgraph.functions.similarity import (
        _fs_for,
        build_ivf_table,
        ivf_table_delete,
        ivf_table_upsert,
        knn_ivf_join_table,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # table name/path derived from sf_dir (ADVICE r5): two concurrent
    # harness invocations on different sf dirs no longer race on one
    # fixed global table — one run's idempotent-rebuild cleanup cannot
    # drop the other's live table mid-query
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    tbl = f"linkgraph_harness_ivf_mor_{tag}"
    path = os.path.join(tempfile.gettempdir(), tbl)
    # idempotent rebuild: a prior run's companions would double-append
    for sfx in ("", "_centroids", "_sizes", "_delta", "_tombstones", "_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}{sfx}")
        fs, jp = _fs_for(spark, path + sfx)
        if fs.exists(jp):
            fs.delete(jp, True)
    build_ivf_table(emb, tbl, path, n_centroids=16)
    ivf_table_upsert(
        spark,
        tbl,
        emb.filter(F.col("vec_id") % 53 == 0).select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        ),
    )
    ivf_table_delete(
        spark, tbl, emb.filter(F.col("vec_id") % 41 == 0).select("vec_id")
    )
    ivf_table_upsert(
        spark, tbl, emb.filter(F.col("vec_id") % 82 == 0), replace=True
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return knn_ivf_join_table(spark, tbl, queries, k=5, n_probe=4)


def _q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (brute-force baseline —
    the exactness anchor for the LSH-bucketed scale path, certified by
    an all-pairs DuckDB oracle). Threshold 0.4 sits in the tail of the
    synthetic-embedding cosine distribution (uniform-ish vectors top
    out ~0.6), >= 1e-5 clear of every pairwise sim, so the filter is
    engine-stable."""
    from linkgraph.functions.similarity import embedding_near_dup_exact

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup_exact(emb, threshold=0.4)


def _q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-hour windowed aggregation over the events stream table
    (the micro-batch analog of the streaming tier)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def _q_check_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 debug sink over the DIRECTED edge list (which IS asymmetric,
    so the violation set is non-trivial); empty == symmetric."""
    from linkgraph.graph.debug import check_symmetry
    from linkgraph.sources.testdata import directed_edges

    return check_symmetry(directed_edges(spark, sf_dir))


def _q_display_reverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.graph.debug import display_reverse

    return display_reverse(undirected_edges(spark, sf_dir))


def _q_dp_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DP (id 7) graph_weighting (dp.cpp:70-108) over the symmetric
    table — weights rounded for float-stable oracle comparison."""
    from linkgraph.functions.quality import graph_weighting

    out, _ = graph_weighting(undirected_edges(spark, sf_dir), 7)
    return out.select("src", "dst", F.round("weight", 9).alias("weight"))


def _q_condora_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CondorA (id 4) add_selfloops + graph_weighting
    (condora.cpp:58-104, driver order main_louvain.cpp:1022-1045)."""
    from linkgraph.functions.quality import graph_weighting
    from linkgraph.graph.hierarchy import add_selfloops

    out, _ = graph_weighting(add_selfloops(undirected_edges(spark, sf_dir)), 4)
    return out.select("src", "dst", F.round("weight", 9).alias("weight"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: PageRank to 1e-6 convergence on the sf0.001
    link graph (BASELINE.json primary metric's query)."""
    from linkgraph.operators.pagerank import pagerank

    edges = undirected_edges(spark, "/root/testdata/sf0.001")
    return pagerank(spark, edges, tol=1e-6, max_iter=100)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_edges": _q_graph_edges,
        "degrees": _q_degrees,
        "pagerank_k8": _q_pagerank_k8,
        "triangle_count": _q_triangle_count,
        "triangles_per_vertex": _q_triangles_per_vertex,
        "connected_components": _q_connected_components,
        "cc_star": _q_cc_star,
        "lpa_k4": _q_lpa_k4,
        "louvain_move_round1": _q_louvain_move_round1,
        "graph_stats": _q_graph_stats,
        "community_sizes": _q_community_sizes,
        "louvain_contract": _q_louvain_contract,
        "hierarchy_flatten": _q_hierarchy_flatten,
        "comembership": _q_comembership,
        "renumber_edges": _q_renumber_edges,
        "host_graph": _q_host_graph,
        "zahn_move_round1": _q_zahn_move_round1,
        "doc_tokens": _q_doc_tokens,
        "doc_quality": _q_doc_quality,
        "lang_id": _q_lang_id,
        "exact_dedup": _q_exact_dedup,
        "ngram_jaccard": _q_ngram_jaccard,
        "minhash_lsh": _q_minhash_lsh,
        "minhash_verified": _q_minhash_verified,
        "simhash_pairs": _q_simhash,
        "doc_fingerprint": _q_doc_fingerprint,
        "corpus_clean": _q_corpus_clean,
        "corpus_split": _q_corpus_split,
        "stratified_sample": _q_stratified_sample,
        "decontaminate": _q_decontaminate,
        "pack_documents": _q_pack_documents,
        "knn_cosine": _q_knn_cosine,
        "knn_lsh": _q_knn_lsh,
        "knn_ivf": _q_knn_ivf,
        "knn_ivf_join": _q_knn_ivf_join,
        "knn_ivf_mor": _q_knn_ivf_mor,
        "embedding_near_dup": _q_embedding_near_dup,
        "events_window_agg": _q_events_window_agg,
        "check_symmetry": _q_check_symmetry,
        "display_reverse": _q_display_reverse,
        "dp_reweight": _q_dp_reweight,
        "condora_reweight": _q_condora_reweight,
    }


# --------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------

def _pagerank_sql(k: int) -> str:
    """Unrolled k-superstep PageRank over the symmetric edge table
    (no dangling vertices by construction)."""
    parts = [
        f"WITH {EDGES_CTE},",
        "  verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),",
        "  nn AS (SELECT count(*) AS n FROM verts),",
        "  outw AS (SELECT src AS id, sum(weight) AS ow FROM edges GROUP BY src),",
        "  s0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS score FROM verts),",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""  s{i} AS MATERIALIZED (
    SELECT v.id,
           (1.0 - {DAMPING}) / (SELECT n FROM nn)
           + {DAMPING} * COALESCE(sum(s.score * e.weight / o.ow), 0.0) AS score
    FROM verts v
    LEFT JOIN edges e ON e.dst = v.id
    LEFT JOIN s{i - 1} s ON s.id = e.src
    LEFT JOIN outw o ON o.id = e.src
    GROUP BY v.id
  ),"""
        )
    body = "\n".join(parts).rstrip(",\n") + "\n"
    return body + f"SELECT id, ROUND(score, 7) AS score FROM s{k}"


def _cc_sql(k: int) -> str:
    """Unrolled k-round synchronous min-label propagation (monotone:
    any k >= the true round count yields the fixpoint)."""
    parts = [
        f"WITH {EDGES_CTE},",
        "  verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),",
        "  c0 AS (SELECT id, id AS component FROM verts),",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""  c{i} AS MATERIALIZED (
    SELECT v.id,
           least(c.component, coalesce(min(cn.component), c.component)) AS component
    FROM verts v
    JOIN c{i - 1} c ON c.id = v.id
    LEFT JOIN edges e ON e.src = v.id
    LEFT JOIN c{i - 1} cn ON cn.id = e.dst
    GROUP BY v.id, c.component
  ),"""
        )
    body = "\n".join(parts).rstrip(",\n") + "\n"
    return body + f"SELECT id, component FROM c{k}"


def _lpa_sql(k: int) -> str:
    """Unrolled k-round synchronous LPA with the engine's exact
    selection semantics: argmax summed weight, keep current label when
    it attains the max, else lowest label."""
    parts = [
        f"WITH {EDGES_CTE},",
        "  verts AS MATERIALIZED (SELECT DISTINCT src AS id FROM edges),",
        "  l0 AS (SELECT id, id AS label FROM verts),",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""  l{i} AS MATERIALIZED (
    SELECT vid AS id, nbr_label AS label FROM (
      SELECT e.src AS vid, ln.label AS nbr_label, cur.label AS cur_label,
             sum(e.weight) AS w
      FROM edges e
      JOIN l{i - 1} ln ON ln.id = e.dst
      JOIN l{i - 1} cur ON cur.id = e.src
      WHERE e.src <> e.dst
      GROUP BY e.src, ln.label, cur.label
      QUALIFY row_number() OVER (
        PARTITION BY e.src
        ORDER BY w DESC, (nbr_label = cur_label) DESC, nbr_label ASC
      ) = 1
    )
  ),"""
        )
    body = "\n".join(parts).rstrip(",\n") + "\n"
    return body + f"SELECT id, label FROM l{k}"


def _move_cte(eh: str, sfx: str) -> str:
    """CTE chain for one singleton-start Louvain move round over edge
    relation ``eh`` (symmetric, self-loops allowed — they live in k but
    are excluded from e(v->C), exactly the operator's P3 guard); the
    final CTE ``moves{sfx}`` is the (id, community) assignment.

    Singleton-start reductions (hold for ANY such relation, including
    contracted quotient graphs): tot_c = k_c, sizes all 1 (swap guard
    reduces to c < v), e_own = 0, tot_cur = k_v (acceptance constant
    k_v*(tot_cur - k_v) exactly 0.0); same scaled-score tree as the
    Spark operator: S = 2M*w - k_v*k_c, move iff S_best > 0 — exact
    integer arithmetic on both engines."""
    return f"""k{sfx} AS (SELECT src AS id, sum(weight) AS k FROM {eh} GROUP BY src),
      mm{sfx} AS (SELECT sum(weight)/2.0 AS m FROM {eh}),
      w_vc{sfx} AS (SELECT src AS vid, dst AS c, sum(weight) AS w
               FROM {eh} WHERE src <> dst GROUP BY src, dst),
      cand{sfx} AS (
        SELECT w.vid, w.c,
               2.0 * (SELECT m FROM mm{sfx}) * w.w - kv.k * kc.k AS s
        FROM w_vc{sfx} w
        JOIN k{sfx} kv ON kv.id = w.vid
        JOIN k{sfx} kc ON kc.id = w.c
        WHERE w.c < w.vid
      ),
      best{sfx} AS (
        SELECT vid, c, s,
               row_number() OVER (PARTITION BY vid ORDER BY s DESC, c ASC) AS rn
        FROM cand{sfx}
      ),
      moves{sfx} AS MATERIALIZED (
        SELECT v.id,
               CAST(CASE WHEN b.s > 0 THEN b.c ELSE v.id END AS BIGINT) AS community
        FROM (SELECT DISTINCT src AS id FROM {eh}) v
        LEFT JOIN (SELECT * FROM best{sfx} WHERE rn = 1) b ON b.vid = v.id
      )"""


def _louvain_move_round1_sql() -> str:
    return f"""WITH {EDGES_CTE},
      {_move_cte('edges', '0')}
    SELECT id, community FROM moves0"""


def _community_sizes_sql() -> str:
    return f"""WITH {EDGES_CTE},
      {_move_cte('edges', '0')}
    SELECT community, count(*) AS size FROM moves0 GROUP BY community"""


def _louvain_contract_sql() -> str:
    return f"""WITH {EDGES_CTE},
      {_move_cte('edges', '0')}
    SELECT ms.community AS src, md.community AS dst, sum(e.weight) AS weight
    FROM edges e
    JOIN moves0 ms ON ms.id = e.src
    JOIN moves0 md ON md.id = e.dst
    GROUP BY 1, 2"""


def _hierarchy_flatten_sql() -> str:
    """Two-level flatten: level-0 move round, contraction, level-1 move
    round over the quotient (the quotient's self-loops are handled by
    the _move_cte reductions), then the H1 composition join."""
    return f"""WITH {EDGES_CTE},
      {_move_cte('edges', '0')},
      cedges AS MATERIALIZED (
        SELECT ms.community AS src, md.community AS dst, sum(e.weight) AS weight
        FROM edges e
        JOIN moves0 ms ON ms.id = e.src
        JOIN moves0 md ON md.id = e.dst
        GROUP BY 1, 2
      ),
      {_move_cte('cedges', '1')}
    SELECT m0.id AS node, m1.community AS community
    FROM moves0 m0
    JOIN moves1 m1 ON m1.id = m0.community"""


def _graph_stats_sql() -> str:
    return f"""WITH {EDGES_CTE},
      deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)
    SELECT (SELECT count(*) FROM edges) AS nb_links,
           (SELECT max(weight) FROM edges) AS max_weight,
           (SELECT count(DISTINCT src) FROM edges) AS n_src,
           (SELECT max(d) FROM deg) AS max_degree"""


def _renumber_edges_sql() -> str:
    return f"""WITH {EDGES_CTE},
      dict AS MATERIALIZED (
        SELECT url, CAST(row_number() OVER (ORDER BY url) - 1 AS BIGINT) AS nid
        FROM (SELECT DISTINCT 'https://example.org/p/' || src AS url FROM edges)
      )
    SELECT ds.nid AS src, dd.nid AS dst, e.weight
    FROM edges e
    JOIN dict ds ON ds.url = 'https://example.org/p/' || e.src
    JOIN dict dd ON dd.url = 'https://example.org/p/' || e.dst"""


def _zahn_move_round1_sql() -> str:
    """Generalized engine, quality id 1 (zahn.h:96-108), one singleton
    round: candidate gain 2*w - w_u*w_c*max_w with unit node weights;
    own-gain with the node removed is exactly 0 (w_c - w_u = 0), so
    acceptance is gain > 0; swap guard reduces to c < v."""
    return f"""WITH {EDGES_CTE},
      mw AS (SELECT max(weight) AS mw FROM edges),
      w_vc AS (SELECT src AS vid, dst AS c, sum(weight) AS w
               FROM edges WHERE src <> dst GROUP BY src, dst),
      cand AS (
        SELECT vid, c, 2.0 * w - 1.0 * 1.0 * (SELECT mw FROM mw) AS g
        FROM w_vc WHERE c < vid
      ),
      best AS (
        SELECT vid, c, g,
               row_number() OVER (PARTITION BY vid ORDER BY g DESC, c ASC) AS rn
        FROM cand
      )
    SELECT v.id,
           CAST(CASE WHEN b.g > 0 THEN b.c ELSE v.id END AS BIGINT) AS community
    FROM (SELECT DISTINCT src AS id FROM edges) v
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.vid = v.id"""


_TOKS = "list_filter(regexp_split_to_array(trim(text), '[^a-zA-Z0-9]+'), x -> x <> '')"
_TOKS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '[^a-zA-Z0-9]+'), x -> x <> '')"

_HASH_MOD = (1 << 31) - 1


def _ptok_sql(t: str, mult: int) -> str:
    """DuckDB re-derivation of functions.text.portable_token_hash:
    31-bit polynomial char hash, bit-for-bit identical to the Spark
    expression (tokens are ASCII alnum by TOKEN_SPLIT_RE, so ascii()
    codepoints agree across engines)."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({t}, ''), c -> ascii(c)::BIGINT)), "
        f"(acc, x) -> (acc * {mult} + x) % {_HASH_MOD})"
    )


def _fingerprint_sql() -> str:
    """functions.text.fingerprint(token_hash='portable'): two 31-bit
    polynomial streams over the ordered token-hash sequence, packed
    into one 62-bit long."""
    return f"""WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
        th AS (SELECT doc_id, list_transform(ts, t -> {_ptok_sql('t', 131)}) AS hs
               FROM toks)
        SELECT doc_id,
          list_reduce(list_prepend({2166136261 % _HASH_MOD}::BIGINT, hs),
                      (acc, x) -> (acc * 31 + x) % {_HASH_MOD}) * {1 << 31}
        + list_reduce(list_prepend(16777619::BIGINT, hs),
                      (acc, x) -> (acc * 37 + x) % {_HASH_MOD}) AS fingerprint
        FROM th"""


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    """functions.dedup.simhash_pairs(token_hash='portable'): the Spark
    side blocks candidates into 4 disjoint 16-bit tables, but by
    pigeonhole its output EQUALS the full all-pairs hamming filter —
    which is what this oracle computes directly (62 hash bits: two
    31-bit polynomial streams per token; fingerprint bits 62/63 are
    always 0). A doc with zero tokens gets fingerprint 0 (the CASE
    sums evaluate over NULL votes to 0 after the left join)."""
    vsums = ", ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(62)
    )
    fpexpr = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(62)
    )
    return f"""WITH toks AS (SELECT doc_id, {_TOKS_LOWER} AS ts FROM documents),
        th AS (SELECT doc_id, unnest(ts) AS t FROM toks),
        h AS (SELECT doc_id,
                     {_ptok_sql('t', 131)} * {1 << 31} + {_ptok_sql('t', 137)} AS h
              FROM th),
        v AS (SELECT doc_id, {vsums} FROM h GROUP BY doc_id),
        fp AS (SELECT d.doc_id, ({fpexpr})::BIGINT AS fp
               FROM documents d LEFT JOIN v USING (doc_id))
        SELECT a.doc_id AS a, b.doc_id AS b,
               CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
        FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}"""


def _occ(hay: str, needle: str) -> str:
    return f"(length({hay}) - length(replace({hay}, '{needle}', ''))) / {len(needle)}"


def _doc_quality_sql() -> str:
    padded = "(' ' || lower(text) || ' ')"
    stop = " + ".join(
        _occ(padded, m)
        for ms in [[" the ", " and ", " of "], [" der ", " und ", " die "], [" le ", " et ", " les "]]
        for m in ms
    )
    punct = f"({_occ('text', '.')} + {_occ('text', ',')})"
    return f"""WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len({_TOKS}) AS n_tokens,
             {punct} AS n_punct,
             ({stop}) AS n_stop
      FROM documents
    ), g AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_tok_len,
             CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
             CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END AS stop_ratio
      FROM f
    )
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
           ROUND(mean_tok_len, 6) AS mean_tok_len,
           ROUND(punct_ratio, 6) AS punct_ratio,
           ROUND(stop_ratio, 6) AS stop_ratio,
           ROUND(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                 + least(stop_ratio * 10.0, 1.0) * 0.3
                 + CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 12.0 THEN 0.3 ELSE 0.0 END,
                 6) AS quality_score
    FROM g"""


def _lang_id_sql() -> str:
    padded = "(' ' || lower(text) || ' ')"
    s = {
        "en": " + ".join(_occ(padded, m) for m in [" the ", " and ", " of "]),
        "de": " + ".join(_occ(padded, m) for m in [" der ", " und ", " die "]),
        "fr": " + ".join(_occ(padded, m) for m in [" le ", " et ", " les "]),
    }
    # fold in ascending language-code order (de, en, fr): ties keep the
    # earlier code — mirrors linkgraph.functions.text.language_id
    return f"""WITH s AS (
      SELECT doc_id, ({s["en"]}) AS s_en, ({s["de"]}) AS s_de, ({s["fr"]}) AS s_fr
      FROM documents
    ), fold AS (
      SELECT doc_id, s_en, s_de, s_fr,
             CASE WHEN s_en > s_de THEN s_en ELSE s_de END AS s2,
             CASE WHEN s_en > s_de THEN 'en' ELSE 'de' END AS l2
      FROM s
    )
    SELECT doc_id,
           CASE WHEN (CASE WHEN s_fr > s2 THEN s_fr ELSE s2 END) > 0
                THEN (CASE WHEN s_fr > s2 THEN 'fr' ELSE l2 END)
                ELSE 'und' END AS pred_lang
    FROM fold"""


def _ngram_jaccard_sql(threshold: float = 0.5) -> str:
    return f"""WITH toks AS (
      SELECT doc_id, {_TOKS_LOWER} AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t) - 2),
                                 i -> array_to_string(t[i:i+2], ' '))
             ELSE [] END)) AS shingle
      FROM toks
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), inters AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_inter
      FROM sh x JOIN sh y USING (shingle)
      WHERE x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT a, b,
           ROUND(CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter), 6) AS jaccard
    FROM inters
    JOIN sizes sa ON sa.doc_id = a
    JOIN sizes sb ON sb.doc_id = b
    WHERE CAST(n_inter AS DOUBLE) / (sa.sz + sb.sz - n_inter) >= {threshold}"""


def _knn_cosine_sql() -> str:
    return """WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 50 = 0
    ), scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qe, v.e), 6) AS sim
      FROM v CROSS JOIN q
      WHERE v.vec_id <> q.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5"""


def _corpus_clean_sql(
    min_quality: float = 0.5, lang: str = "en", threshold: float = 0.6
) -> str:
    """functions.corpus.clean_corpus: every stage recomputed in SQL
    over the SAME filtered subset — the quality/lang expressions are
    the proven _doc_quality_sql/_lang_id_sql trees (filter on the
    rounded score, as quality_features rounds), dedup keeps the min
    doc_id per md5 digest, and near-dup removal drops the b side of
    ALL exact n-gram-Jaccard pairs >= threshold (the minhash_verified
    recall guarantee lets the Spark side generate candidates via
    banded LSH)."""
    padded = "(' ' || lower(text) || ' ')"
    stop = " + ".join(
        _occ(padded, m)
        for ms in [[" the ", " and ", " of "], [" der ", " und ", " die "], [" le ", " et ", " les "]]
        for m in ms
    )
    s = {
        "en": " + ".join(_occ(padded, m) for m in [" the ", " and ", " of "]),
        "de": " + ".join(_occ(padded, m) for m in [" der ", " und ", " die "]),
        "fr": " + ".join(_occ(padded, m) for m in [" le ", " et ", " les "]),
    }
    return f"""WITH f AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             len({_TOKS}) AS n_tokens,
             ({stop}) AS n_stop,
             ({s["en"]}) AS s_en, ({s["de"]}) AS s_de, ({s["fr"]}) AS s_fr
      FROM documents
    ), g AS (
      SELECT doc_id, text, s_en, s_de, s_fr,
             CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_tok_len,
             CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END AS stop_ratio,
             n_tokens
      FROM f
    ), fold AS (
      SELECT doc_id, text, s_fr, mean_tok_len, stop_ratio, n_tokens,
             CASE WHEN s_en > s_de THEN s_en ELSE s_de END AS s2,
             CASE WHEN s_en > s_de THEN 'en' ELSE 'de' END AS l2
      FROM g
    ), scored AS (
      SELECT doc_id, text,
             ROUND(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                   + least(stop_ratio * 10.0, 1.0) * 0.3
                   + CASE WHEN mean_tok_len >= 3.0 AND mean_tok_len <= 12.0 THEN 0.3 ELSE 0.0 END,
                   6) AS quality_score,
             CASE WHEN (CASE WHEN s_fr > s2 THEN s_fr ELSE s2 END) > 0
                  THEN (CASE WHEN s_fr > s2 THEN 'fr' ELSE l2 END)
                  ELSE 'und' END AS pred_lang
      FROM fold
    ), kept AS MATERIALIZED (
      SELECT doc_id, text, quality_score, pred_lang
      FROM scored
      WHERE quality_score >= {min_quality} AND pred_lang = '{lang}'
    ), h AS (
      SELECT doc_id, md5(text) AS digest FROM kept
    ), canon AS (
      SELECT digest, min(doc_id) AS canonical_id FROM h GROUP BY digest
    ), kept2 AS MATERIALIZED (
      SELECT k.doc_id, k.text, k.quality_score, k.pred_lang
      FROM kept k
      JOIN h ON h.doc_id = k.doc_id
      JOIN canon ON canon.digest = h.digest AND canon.canonical_id = k.doc_id
    ), toks AS (
      SELECT doc_id, {_TOKS_LOWER} AS t FROM kept2
    ), sh AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t) - 2),
                                 i -> array_to_string(t[i:i+2], ' '))
             ELSE [] END)) AS shingle
      FROM toks
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id
    ), removed AS (
      SELECT DISTINCT y.doc_id AS doc_id
      FROM sh x JOIN sh y USING (shingle)
      WHERE x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id
      HAVING CAST(count(*) AS DOUBLE) / (
               (SELECT sz FROM sizes WHERE sizes.doc_id = x.doc_id)
             + (SELECT sz FROM sizes WHERE sizes.doc_id = y.doc_id)
             - count(*)) >= {threshold}
    )
    SELECT k.doc_id, k.quality_score, k.pred_lang
    FROM kept2 k
    LEFT JOIN removed r ON r.doc_id = k.doc_id
    WHERE r.doc_id IS NULL"""


def _split_bucket_sql(salt: int) -> str:
    """functions.corpus._key_bucket re-derived: portable polynomial
    char hash of '{salt}:{doc_id}:x7f3q' mod SPLIT_DENOM (hash is
    non-negative, so % == pmod)."""
    key = f"'{salt}:' || doc_id || ':x7f3q'"
    return f"({_ptok_sql(key, 131)}) % 1000000"


def _corpus_split_sql(test_frac: float = 0.1, salt: int = 17) -> str:
    thresh = int(round(test_frac * 1_000_000))
    return f"""SELECT doc_id, {_split_bucket_sql(salt)} AS bucket,
           CASE WHEN {_split_bucket_sql(salt)} < {thresh}
                THEN 'test' ELSE 'train' END AS split
    FROM documents"""


def _stratified_sample_sql(salt: int = 29) -> str:
    """functions.corpus.stratified_sample over language_id output with
    quotas en 0.5 / de 0.25 / fr 0.1 (und rows have no quota entry and
    are dropped — the NULL-threshold comparison on both engines)."""
    thresh = """CASE pred_lang WHEN 'en' THEN 500000
                               WHEN 'de' THEN 250000
                               WHEN 'fr' THEN 100000 END"""
    return f"""WITH lang AS MATERIALIZED ({_lang_id_sql()})
    SELECT doc_id, pred_lang, {_split_bucket_sql(salt)} AS bucket
    FROM lang
    WHERE {_split_bucket_sql(salt)} < ({thresh})"""


def _decontaminate_sql(n: int = 8) -> str:
    """functions.corpus.decontaminate with probe = doc_id % 50 == 0:
    distinct word n-grams per doc, contaminated = shares any shingle
    with the probe set, survivors anti-joined."""
    return f"""WITH toks AS (SELECT doc_id, {_TOKS_LOWER} AS t FROM documents),
    sh AS MATERIALIZED (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= {n}
             THEN list_transform(generate_series(1, len(t) - {n - 1}),
                                 i -> array_to_string(t[i:i+{n - 1}], ' '))
             ELSE [] END)) AS shingle
      FROM toks
    ),
    probe AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    bad AS (SELECT DISTINCT s.doc_id FROM sh s JOIN probe p USING (shingle))
    SELECT d.doc_id FROM documents d
    LEFT JOIN bad ON bad.doc_id = d.doc_id
    WHERE bad.doc_id IS NULL"""


def _pack_documents_sql(
    max_tokens: int = 512, n_shards: int = 8, salt: int = 41
) -> str:
    """functions.corpus.pack_documents: portable-hash shard, key-ordered
    exclusive prefix sum of token counts, bin every max_tokens."""
    key = f"'{salt}:' || doc_id || ':x7f3q'"
    return f"""WITH base AS (
      SELECT doc_id,
             CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
             CAST((({_ptok_sql(key, 131)}) % 1000000) % {n_shards} AS INT) AS shard
      FROM documents
    )
    SELECT doc_id, n_tokens, shard,
           CAST(shard AS BIGINT) * {1 << 32}
           + CAST(floor(COALESCE(SUM(n_tokens) OVER (
                 PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 / {max_tokens}.0) AS BIGINT) AS bin_id
    FROM base"""


def _minhash_lsh_sql(
    num_hashes: int = 32, bands: int = 8, threshold: float = 0.5
) -> str:
    """functions.dedup.minhash_lsh_pairs(shingle_hash='portable'):
    the (a_i, b_i) universal-hash constants come from the SAME
    ``minhash_coeffs`` call the Spark operator uses, inlined as SQL
    literals; the shingle CTE is the proven _ngram_jaccard_sql one;
    band buckets are the signature slices (list equality join)."""
    from linkgraph.functions.dedup import minhash_coeffs

    r = num_hashes // bands
    coeffs = minhash_coeffs(num_hashes)
    mins = ",\n               ".join(
        f"min(({a} * h + {b}) % {_HASH_MOD}) AS h{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    banded = "\n          UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, "
        f"[{', '.join(f'h{bi * r + j}' for j in range(r))}] AS vals FROM sig"
        for bi in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(num_hashes)
    )
    return f"""WITH toks AS (
      SELECT doc_id, {_TOKS_LOWER} AS t FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN list_transform(generate_series(1, len(t) - 2),
                                 i -> array_to_string(t[i:i+2], ' '))
             ELSE [] END)) AS shingle
      FROM toks
    ), ph AS (
      SELECT doc_id, {_ptok_sql('shingle', 131)} AS h FROM sh
    ), sig AS (
      SELECT doc_id, {mins}
      FROM ph GROUP BY doc_id
    ), banded AS (
          {banded}
    ), cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.vals = y.vals AND x.doc_id < y.doc_id
    )
    SELECT a, b, ({agree}) / {num_hashes}.0 AS est_jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = a
    JOIN sig sb ON sb.doc_id = b
    WHERE ({agree}) / {num_hashes}.0 >= {threshold}"""


def _knn_lsh_sql(
    n_planes: int = 6, k: int = 5, dim: int = 64, seed: int = 42
) -> str:
    """functions.similarity.knn_lsh: hyperplanes re-derived from the
    SAME seeded ``_hyperplanes`` call and inlined as literals (repr
    round-trips doubles exactly). Each projection is a left-associated
    addition chain — SQL ``+`` associates left, which is the identical
    IEEE evaluation order to Spark's ``F.aggregate`` left fold — so the
    bucket bits agree bit-for-bit; the multi-probe set (own bucket +
    each single-bit flip) and the rounded-cosine rerank mirror the
    operator."""
    from linkgraph.functions.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    bucket = " + ".join(
        "(CASE WHEN ("
        + " + ".join(f"e[{j + 1}] * ({p[j]!r})" for j in range(dim))
        + f") > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    masks = ", ".join(str(m) for m in [0] + [1 << i for i in range(n_planes)])
    return f"""WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), vb AS (
      SELECT vec_id, e, ({bucket})::BIGINT AS bucket FROM v
    ), q AS (
      SELECT vec_id AS query_id, e AS qe, bucket AS qb
      FROM vb WHERE vec_id % 50 = 0
    ), probes AS (
      SELECT query_id, qe, xor(qb, t.m) AS bucket
      FROM q CROSS JOIN unnest([{masks}]::BIGINT[]) AS t(m)
    ), scored AS (
      SELECT p.query_id, v.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.qe, v.e), 6) AS sim
      FROM vb v JOIN probes p USING (bucket)
      WHERE v.vec_id <> p.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}"""


def _knn_ivf_sql(
    n_centroids: int = 16, n_probe: int = 4, k: int = 5, dim: int = 64
) -> str:
    """functions.similarity.knn_ivf: the quantizer is recomputed FROM
    THE TABLE (smallest Knuth-hash ids, cid = rank by (hash, id)) —
    no inlined constants. Squared-L2 per (vector, centroid) is a
    left-associated addition chain, the identical IEEE order to
    Spark's ``F.aggregate`` left fold (the 0.0 seed absorbs exactly),
    so assignments and probe sets agree bit-for-bit; the rerank
    mirrors knn_lsh's rounded exact cosine."""
    chain = " + ".join(
        f"(v.e[{j}] - c.ce[{j}]) * (v.e[{j}] - c.ce[{j}])" for j in range(1, dim + 1)
    )
    return f"""WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), cent AS MATERIALIZED (
      SELECT CAST(row_number() OVER (
               ORDER BY (vec_id * 2654435761) % 2147483648, vec_id) AS INT) AS cid,
             e AS ce
      FROM v
      QUALIFY row_number() OVER (
        ORDER BY (vec_id * 2654435761) % 2147483648, vec_id) <= {n_centroids}
    ), dists AS MATERIALIZED (
      SELECT v.vec_id, v.e, c.cid, ({chain}) AS d
      FROM v CROSS JOIN cent c
    ), assigned AS (
      SELECT vec_id, e, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists
      ) WHERE rn = 1
    ), probes AS (
      SELECT vec_id AS query_id, e AS qe, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists WHERE vec_id % 50 = 0
      ) WHERE rn <= {n_probe}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.qe, a.e), 6) AS sim
      FROM assigned a JOIN probes p USING (cid)
      WHERE a.vec_id <> p.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}"""


def _knn_ivf_mor_sql(
    n_centroids: int = 16, n_probe: int = 4, k: int = 5, dim: int = 64
) -> str:
    """knn_ivf_join_table over a MAINTAINED table (_q_knn_ivf_mor):
    the corpus is the merge-on-read LIVE set — base rows minus the
    vec_id % 41 tombstones, plus the shifted-id delta batch
    (vec_id % 53, +10^7), plus the replace-re-added vec_id % 82 rows
    whose generation outlives the cut — recomputed here from the same
    modular slices. The quantizer is the BUILD-time one (derived from
    the full base table, frozen across upserts), same derivation and
    IEEE fold order as _knn_ivf_sql."""
    vchain = " + ".join(
        f"(l.e[{j}] - c.ce[{j}]) * (l.e[{j}] - c.ce[{j}])"
        for j in range(1, dim + 1)
    )
    qchain = " + ".join(
        f"(v.e[{j}] - c.ce[{j}]) * (v.e[{j}] - c.ce[{j}])"
        for j in range(1, dim + 1)
    )
    return f"""WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), cent AS MATERIALIZED (
      SELECT CAST(row_number() OVER (
               ORDER BY (vec_id * 2654435761) % 2147483648, vec_id) AS INT) AS cid,
             e AS ce
      FROM v
      QUALIFY row_number() OVER (
        ORDER BY (vec_id * 2654435761) % 2147483648, vec_id) <= {n_centroids}
    ), live AS (
      SELECT vec_id, e FROM v WHERE vec_id % 41 <> 0
      UNION ALL
      SELECT vec_id + 10000000 AS vec_id, e FROM v WHERE vec_id % 53 = 0
      UNION ALL
      SELECT vec_id, e FROM v WHERE vec_id % 82 = 0
    ), dists AS MATERIALIZED (
      SELECT l.vec_id, l.e, c.cid, ({vchain}) AS d
      FROM live l CROSS JOIN cent c
    ), assigned AS (
      SELECT vec_id, e, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM dists
      ) WHERE rn = 1
    ), qdists AS MATERIALIZED (
      SELECT v.vec_id, v.e, c.cid, ({qchain}) AS d
      FROM v CROSS JOIN cent c WHERE v.vec_id % 50 = 0
    ), probes AS (
      SELECT vec_id AS query_id, e AS qe, cid FROM (
        SELECT vec_id, e, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
        FROM qdists
      ) WHERE rn <= {n_probe}
    ), scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.qe, a.e), 6) AS sim
      FROM assigned a JOIN probes p USING (cid)
      WHERE a.vec_id <> p.query_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (
               PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}"""


def oracle_sql() -> dict[str, str]:
    return {
        "graph_edges": f"WITH {EDGES_CTE} SELECT src, dst, weight FROM edges",
        "degrees": f"""WITH {EDGES_CTE}
            SELECT src AS id, count(*) AS deg, CAST(sum(weight) AS DOUBLE) AS wdeg
            FROM edges GROUP BY src""",
        "pagerank_k8": _pagerank_sql(8),
        "knn_ivf_join": _knn_ivf_sql(16, 4, 5),
        "knn_ivf_mor": _knn_ivf_mor_sql(16, 4, 5),
        "triangle_count": f"""WITH {EDGES_CTE},
            canon AS (
              SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
              FROM edges WHERE src <> dst
            )
            SELECT count(*) AS n_triangles
            FROM canon e1
            JOIN canon e2 ON e1.dst = e2.src
            JOIN canon e3 ON e1.src = e3.src AND e2.dst = e3.dst""",
        "connected_components": _cc_sql(16),
        "cc_star": _cc_sql(16),
        "triangles_per_vertex": f"""WITH {EDGES_CTE},
            canon AS (
              SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
              FROM edges WHERE src <> dst
            ),
            tri AS (
              SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
              FROM canon e1
              JOIN canon e2 ON e1.dst = e2.src
              JOIN canon e3 ON e1.src = e3.src AND e2.dst = e3.dst
            ),
            parts AS (
              SELECT a AS id FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri
            )
            SELECT id, count(*) AS n_tri FROM parts GROUP BY id""",
        "lpa_k4": _lpa_sql(4),
        "louvain_move_round1": _louvain_move_round1_sql(),
        "graph_stats": _graph_stats_sql(),
        "community_sizes": _community_sizes_sql(),
        "louvain_contract": _louvain_contract_sql(),
        "hierarchy_flatten": _hierarchy_flatten_sql(),
        "comembership": f"""WITH {EDGES_CTE},
      {_move_cte('edges', '0')}
    SELECT x.id AS a, y.id AS b
    FROM moves0 x JOIN moves0 y ON x.community = y.community AND x.id < y.id""",
        "renumber_edges": _renumber_edges_sql(),
        "host_graph": f"""WITH {EDGES_CTE},
      pages AS (
        SELECT 'https://Host' || (src % 97) || '.example/p/' || src AS src,
               'https://Host' || (dst % 97) || '.example/p/' || dst AS dst,
               weight
        FROM edges
      )
    SELECT lower(regexp_extract(src, '^(?:[a-z][a-z0-9+.-]*://)?([^/?#]+)', 1)) AS src_host,
           lower(regexp_extract(dst, '^(?:[a-z][a-z0-9+.-]*://)?([^/?#]+)', 1)) AS dst_host,
           count(*) AS n_links, sum(weight) AS weight
    FROM pages GROUP BY 1, 2""",
        "zahn_move_round1": _zahn_move_round1_sql(),
        "doc_tokens": f"""SELECT doc_id,
              CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
              CAST(length(text) AS BIGINT) AS n_chars_computed
            FROM documents""",
        "doc_quality": _doc_quality_sql(),
        "lang_id": _lang_id_sql(),
        "exact_dedup": """WITH h AS (SELECT doc_id, md5(text) AS digest FROM documents),
            c AS (SELECT digest, min(doc_id) AS canonical_id FROM h GROUP BY digest)
            SELECT h.doc_id, c.canonical_id FROM h JOIN c USING (digest)""",
        "ngram_jaccard": _ngram_jaccard_sql(),
        # minhash_verified: Spark = LSH candidates + exact-Jaccard
        # verify; oracle = ALL exact pairs at the same threshold —
        # green means the banded LSH missed nothing on this data
        "minhash_verified": _ngram_jaccard_sql(threshold=0.6),
        "minhash_lsh": _minhash_lsh_sql(),
        "knn_lsh": _knn_lsh_sql(),
        "simhash_pairs": _simhash_pairs_sql(3),
        "doc_fingerprint": _fingerprint_sql(),
        "corpus_clean": _corpus_clean_sql(),
        "corpus_split": _corpus_split_sql(),
        "stratified_sample": _stratified_sample_sql(),
        "decontaminate": _decontaminate_sql(8),
        "pack_documents": _pack_documents_sql(),
        "knn_cosine": _knn_cosine_sql(),
        "knn_ivf": _knn_ivf_sql(),
        "embedding_near_dup": """WITH v AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
            )
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(a.e, b.e), 6) AS sim
            FROM v a JOIN v b ON a.vec_id < b.vec_id
            WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.4""",
        "events_window_agg": """SELECT date_trunc('hour', ts) AS hour, event_type,
              count(*) AS n, ROUND(sum(value), 6) AS sum_value
            FROM events GROUP BY 1, 2""",
        "check_symmetry": f"""WITH {EDGES_CTE}
            SELECT f.src, f.dst, f.weight, r.reverse_weight
            FROM dedup f
            LEFT JOIN (SELECT dst AS src, src AS dst, weight AS reverse_weight
                       FROM dedup) r USING (src, dst)
            WHERE r.reverse_weight IS NULL OR f.weight <> r.reverse_weight""",
        "display_reverse": f"""WITH {EDGES_CTE}
            SELECT dst AS a, src AS b, weight FROM edges WHERE src > dst""",
        "dp_reweight": f"""WITH {EDGES_CTE},
            deg AS (SELECT src AS id, count(*) AS d FROM edges GROUP BY src)
            SELECT e.src, e.dst,
                   round(2.0 * e.weight / (ds.d + dd.d), 9) AS weight
            FROM edges e
            JOIN deg ds ON ds.id = e.src
            JOIN deg dd ON dd.id = e.dst""",
        "condora_reweight": f"""WITH {EDGES_CTE},
            verts AS (SELECT DISTINCT src AS id FROM edges),
            loops AS (SELECT src AS id FROM edges WHERE src = dst),
            withloops AS MATERIALIZED (
              SELECT src, dst, weight FROM edges
              UNION ALL
              SELECT id AS src, id AS dst, 1.0 AS weight
              FROM verts WHERE id NOT IN (SELECT id FROM loops)
            ),
            deg AS (SELECT src AS id, count(*) AS d,
                           sum(CASE WHEN src = dst THEN weight ELSE 0.0 END) AS sl
                    FROM withloops GROUP BY src)
            SELECT e.src, e.dst,
                   round(2.0 * (2.0 * e.weight / (ds.d + dd.d))
                         - (ds.sl / (2.0 * ds.d) + dd.sl / (2.0 * dd.d)), 9) AS weight
            FROM withloops e
            JOIN deg ds ON ds.id = e.src
            JOIN deg dd ON dd.id = e.dst""",
        # minhash_lsh / knn_lsh: approximate candidate generation
        # (banded xxhash64 buckets / random-hyperplane probes) with no
        # recall guarantee -> genuinely not oracle-expressible; the
        # driver records rows-only checks and pytest covers semantics
        # (planted-dup recall, LSH-dominates-bruteforce). Their
        # VERIFIED counterparts (minhash_verified, knn_cosine) are
        # exact-oracle green above.
    }
