"""Deduplication operators over a documents table (task brief:
exact, MinHash+LSH, SimHash, n-gram Jaccard). Everything is built
from pyspark.sql functions — shingling, hashing (xxhash64), band
bucketing and the candidate joins are all JVM-side; no Python UDFs.

Scale notes:
* exact dedup = one hash-groupBy (min doc per digest);
* n-gram Jaccard = shingle explode -> self-join on shingle ->
  per-pair intersection count (classic inverted-index join). Hot
  shingles ( = stop-phrases) are the skew risk: ``max_shingle_df``
  drops shingles whose document frequency exceeds the cap, exactly
  like dropping stopwords from an inverted index;
* MinHash-LSH = signature via per-seed min of xxhash64(shingle, seed),
  banded into buckets, candidates = same-bucket pairs, verified with
  exact Jaccard on signatures (and optionally true shingle Jaccard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.functions.text import TOKEN_SPLIT_RE


def _tokens(col: Column) -> Column:
    return F.filter(F.split(F.trim(F.lower(col)), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram strings of the text column."""
    toks = _tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array())
    return F.array_distinct(grams)


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by md5 of the text: returns
    (doc_id, canonical_id) where canonical = min doc_id of the group."""
    h = df.select("doc_id", F.md5(F.col(text_col)).alias("digest"))
    canon = h.groupBy("digest").agg(F.min("doc_id").alias("canonical_id"))
    return h.join(canon, "digest").select("doc_id", "canonical_id")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Near-duplicate pairs (a < b) with exact n-gram Jaccard >=
    threshold. Returns (a, b, jaccard)."""
    sh = df.select(
        F.col("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )
    if max_shingle_df is not None:
        hot = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_cnt")).filter(
            F.col("df_cnt") > max_shingle_df
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "shingle")
    b = sh.select(F.col("doc_id").alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sa")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("sb")), "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sa") + F.col("sb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", n: int = 3, num_hashes: int = 32
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of
    xxhash64(shingle, seed=i). Returns (doc_id, sig array<long>)."""
    # explode + num_hashes plain min-aggregates: one narrow groupBy
    # instead of num_hashes nested array_min(transform(...)) per-row
    # expressions (which made whole-stage codegen compile a giant
    # expression tree — measured ~2 min at 64 hashes on 500 docs).
    # Same values: min over the same xxhash64(shingle, family) set.
    # (History note: the former transform lambda took a second
    # parameter, which F.transform silently fills with the element's
    # array INDEX — every family hashed with the shingle's position,
    # so one insertion shifted every hash and near-dups never
    # collided. Single-column hashing has no such trap.)
    # Docs with zero shingles (< n tokens) drop out: they have no
    # signature and can never be near-dup candidates.
    sh = df.select(
        F.col("doc_id"), F.explode(shingles(F.col(text_col), n)).alias("s")
    )
    m = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    sig = F.array(*[F.col(f"h{i}") for i in range(num_hashes)])
    return m.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """MinHash+LSH near-dup candidates: band the signature, bucket-join
    on (band index, band hash), then keep pairs whose signature-level
    Jaccard estimate (fraction of agreeing hashes) >= threshold.
    Returns (a, b, est_jaccard)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, n, num_hashes).persist()
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[bi * rows_per_band + r].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    est = (
        cand.join(sigs.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a")), "a")
        .join(sigs.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b")), "b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                    lambda v: v,
                )
            ).cast("double")
            / F.lit(num_hashes),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("a", "b", "est_jaccard")
    )
    from linkgraph.plans.superstep import barrier

    # materialize the (bounded) pair table, then release the signature
    # cache — repeated calls must not accumulate executor memory
    out = barrier(est)
    sigs.unpersist()
    return out


def minhash_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.6,
) -> DataFrame:
    """Two-stage near-dup detection — the production dedup shape at
    100 TB: banded MinHash-LSH candidate generation (every pair
    sharing >= 1 band bucket; no estimate filter) followed by EXACT
    n-gram Jaccard verification evaluated ONLY on the candidates.
    The O(n²) exact measure never materializes; its cost is the
    LSH-bucketed candidate count.

    Recall is the banding miss probability (1 - J^r)^b — with the
    default 16 bands × 2 rows a true pair at J = 0.6 is missed with
    p ≈ 8e-4, at J = 0.8 with p ≈ 1e-7 (deterministic per dataset:
    the hashing is seeded xxhash64). Returns (a, b, jaccard) with
    exact jaccard >= threshold."""
    cands = minhash_lsh_pairs(
        df, text_col, n, num_hashes, bands, threshold=0.0
    ).select("a", "b")
    sh = df.select(F.col("doc_id"), shingles(F.col(text_col), n).alias("sh"))
    sa = sh.select(F.col("doc_id").alias("a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash(
    df: DataFrame, text_col: str = "text", bits: int = 64, token_hash: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash over tokens: bit j of the fingerprint is the sign
    of sum over tokens of (+1 if bit j of hash(token) else -1).
    Returns (doc_id, simhash long).

    token_hash: 'xxhash64' (default, full 64 hash bits) or 'portable'
    (two 31-bit polynomial char streams packed into a 62-bit token
    hash — bits 62/63 of the fingerprint are then always 0 — exactly
    reproducible outside Spark; the harness oracle recomputes it in
    DuckDB SQL).

    Plan shape: explode tokens -> hash once per token row -> one
    groupBy(doc_id) with ``bits`` plain conditional sums. The former
    per-row form built ``bits`` copies of the token-hash subtree into
    one giant projection (whole-stage codegen measured minutes at 64
    bits); the narrow aggregate is also the right shape at scale —
    partial aggregation runs map-side and only (doc_id, 64 longs)
    rows shuffle. Docs with zero tokens keep fingerprint 0."""
    if token_hash == "portable":
        from linkgraph.functions.text import portable_token_hash

        def tok_h(t: Column) -> Column:
            return portable_token_hash(t, 131) * F.lit(1 << 31).cast(
                "long"
            ) + portable_token_hash(t, 137)

    elif token_hash == "xxhash64":
        def tok_h(t: Column) -> Column:
            return F.xxhash64(t)

    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")

    hashed = df.select(
        "doc_id", F.explode(_tokens(F.col(text_col))).alias("t")
    ).select("doc_id", tok_h(F.col("t")).alias("h"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(bits)
        ]
    )
    bit_cols = [
        F.when(F.col(f"v{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        * F.lit(2 ** j).cast("long")
        if j < 63
        else F.when(F.col(f"v{j}") > 0, F.lit(-(2 ** 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(bits)
    ]
    fp = sum(bit_cols[1:], bit_cols[0])
    return (
        df.select("doc_id")
        .join(votes.select("doc_id", fp.alias("_fp")), "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("_fp"), F.lit(0).cast("long")).alias("simhash"))
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
    token_hash: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs with GUARANTEED recall for hamming <=
    n_blocks - 1: the fingerprint is split into n_blocks disjoint
    16-bit blocks and candidates are bucketed on EVERY (block index,
    block value) — by pigeonhole, a pair differing in <= n_blocks-1
    bits agrees exactly on at least one block, so it collides in at
    least one table. (A single-prefix blocking misses any pair whose
    differing bits fall inside the prefix.) Candidates are verified
    with the exact hamming distance. Returns (a, b, hamming), eagerly
    materialized (the fingerprint cache is released on return)."""
    if max_hamming > n_blocks - 1:
        raise ValueError(
            f"recall guarantee needs n_blocks > max_hamming "
            f"(got n_blocks={n_blocks}, max_hamming={max_hamming})"
        )
    from linkgraph.plans.superstep import barrier

    width = 64 // n_blocks
    mask = (1 << width) - 1
    fps = simhash(df, text_col, token_hash=token_hash).persist()
    blocked = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("blk_i"),
                        F.shiftrightunsigned(F.col("simhash"), bi * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("blk_v"),
                    )
                    for bi in range(n_blocks)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.blk_i", "b.blk_v")
    x = blocked.select(
        F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), "blk_i", "blk_v"
    )
    y = blocked.select(
        F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), "blk_i", "blk_v"
    )
    out = barrier(
        x.join(y, ["blk_i", "blk_v"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()  # a pair may collide in several blocks
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    fps.unpersist()
    return out
