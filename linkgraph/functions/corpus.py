"""End-to-end corpus cleaning — the composed training-data pipeline
shape (task brief): quality filter -> language filter -> exact dedup
-> verified near-dup removal, over a documents table.

Every stage is one of the engine's existing scaled operators
(`quality_features` / `language_id` are pure Column expressions,
`exact_dedup` one hash-groupBy, `minhash_verified_pairs` the
banded-LSH + exact-verify two-stage dedup), so the composition
inherits their 100-TB shapes: no stage is quadratic, the only
all-pairs-flavored step is LSH-bucketed, and the near-dup measure is
evaluated ONLY on bucket-colliding candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.functions.dedup import exact_dedup, minhash_verified_pairs


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    lang: str = "en",
    jaccard_threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 32,
    shingle_hash: str = "xxhash64",
) -> DataFrame:
    """Surviving documents after the four cleaning stages.

    Near-dup removal rule: for every verified pair (a < b, exact
    n-gram Jaccard >= ``jaccard_threshold``) the HIGHER id is dropped
    — deterministic, order-free ("keep the lowest-id member"), and
    exactly reproducible by the harness oracle (which recomputes ALL
    exact pairs on the same filtered subset; equality additionally
    certifies the banded LSH's recall end-to-end — the
    minhash_verified guarantee applied to the composed pipeline).

    Returns (doc_id, quality_score rounded to 6, pred_lang).

    Plan shape: the quality score and language id are bare column
    expressions (text.quality_score_col / pred_lang_col — the SAME
    trees quality_features / language_id select, so results are
    unchanged), folded into ONE projection over the input — the former
    three-scans-plus-two-self-joins shape paid the document read and
    the text expressions three times. The filtered survivor set is
    then barriered once: every downstream stage (exact dedup, the
    three shingle passes inside minhash_verified_pairs, the final
    anti-join) re-reads ~survivor rows from the checkpoint instead of
    re-running the filter chain over the full corpus per reference —
    at 100 TB that is the difference between one corpus scan and five.
    """
    from linkgraph.functions.text import pred_lang_col, quality_score_col
    from linkgraph.plans.superstep import barrier

    kept = barrier(
        df.select(
            "doc_id",
            text_col,
            quality_score_col(F.col(text_col)).alias("quality_score"),
            pred_lang_col(F.col(text_col)).alias("pred_lang"),
        ).filter(
            (F.col("quality_score") >= min_quality) & (F.col("pred_lang") == lang)
        )
    )
    canon = exact_dedup(kept, text_col)
    kept = barrier(
        kept.join(
            canon.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id"),
            "doc_id",
        )
    )
    pairs = minhash_verified_pairs(
        kept,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        threshold=jaccard_threshold,
        shingle_hash=shingle_hash,
    )
    removed = pairs.select(F.col("b").alias("doc_id")).distinct()
    # quality_score is already rounded to 6 (the same rounding the
    # oracle applies before ITS filter)
    return kept.join(removed, "doc_id", "left_anti").select(
        "doc_id", "quality_score", "pred_lang"
    )


#: split/sample bucket denominator — thresholds are integer bucket
#: counts out of this, so both engines compare exact integers.
SPLIT_DENOM = 1_000_000


def _key_bucket(key_col: str, salt: int) -> F.Column:
    """Deterministic bucket in [0, SPLIT_DENOM) from the portable
    31-bit polynomial char hash of ``"{salt}:{key}:x7f3q"``.

    The constant tail matters: the polynomial hash is linear in the
    last character, so without it consecutive integer keys would land
    in consecutive buckets (striped, correlated splits). Each tail
    character multiplies a neighboring-key delta by 131, so adjacent
    keys end up ~uniformly spread. Pure Column arithmetic — no UDF, no
    shuffle — and bit-for-bit reproducible in any engine with 64-bit
    ints (the harness oracles re-derive it in DuckDB SQL), so a
    train/test split survives engine migrations and re-partitioning,
    and adding documents never reassigns existing ones (hash-based,
    not rank-based)."""
    from linkgraph.functions.text import portable_token_hash

    key = F.concat(
        F.lit(f"{salt}:"), F.col(key_col).cast("string"), F.lit(":x7f3q")
    )
    return F.pmod(portable_token_hash(key), F.lit(SPLIT_DENOM).cast("long"))


def split_corpus(
    df: DataFrame,
    test_frac: float = 0.1,
    key_col: str = "doc_id",
    salt: int = 17,
) -> DataFrame:
    """Deterministic train/test split for a training corpus: adds
    (bucket, split) where split = 'test' iff bucket < test_frac of the
    bucket space. One scan, zero shuffles; see ``_key_bucket`` for the
    reproducibility contract."""
    thresh = int(round(test_frac * SPLIT_DENOM))
    bucket = _key_bucket(key_col, salt)
    return df.withColumn("bucket", bucket).withColumn(
        "split",
        F.when(F.col("bucket") < F.lit(thresh), F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    group_col: str = "pred_lang",
    key_col: str = "doc_id",
    salt: int = 29,
) -> DataFrame:
    """Per-group deterministic fraction sampling — the data-mixing
    quota step of a training pipeline (e.g. keep 50% en / 25% de /
    10% fr). Rows whose group value has no entry in ``fractions`` are
    dropped. The keep decision is the same portable hash rule as
    ``split_corpus`` with per-group integer thresholds, so the sample
    is reproducible across engines/runs and FILTER-ONLY at 100 TB
    (one scan, no shuffle, no per-group sort — unlike exact-k quota
    sampling, which needs a global rank per group)."""
    thresholds = {g: int(round(f * SPLIT_DENOM)) for g, f in fractions.items()}
    thresh = F.lit(None).cast("long")
    for g, t in thresholds.items():
        thresh = F.when(F.col(group_col) == F.lit(g), F.lit(t)).otherwise(thresh)
    bucket = _key_bucket(key_col, salt)
    return df.withColumn("bucket", bucket).filter(
        F.col("bucket") < thresh
    )


def decontaminate(
    df: DataFrame,
    probe: DataFrame,
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: drop every document sharing ANY word
    n-gram with the probe set (the standard pre-training hygiene step —
    n defaults to 8, the common contamination rule). Returns the
    surviving rows of ``df`` with all columns.

    Scale shape: the probe side (an eval benchmark) is tiny, so its
    distinct shingles BROADCAST; the corpus pays one scan + a broadcast
    semi-join to find contaminated ids and a broadcast anti-join to
    drop them — corpus rows never shuffle. Shingling reuses
    ``dedup.shingle_arrays`` (the single-reference fold — tokenization
    is O(tokens), not O(tokens²))."""
    from linkgraph.functions.dedup import shingle_arrays

    probe_sh = (
        shingle_arrays(probe.select(text_col), text_col, n)
        .select(F.explode("sh").alias("shingle"))
        .distinct()
    )
    contaminated = (
        shingle_arrays(df.select("doc_id", text_col), text_col, n)
        .select("doc_id", F.explode("sh").alias("shingle"))
        .join(F.broadcast(probe_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return df.join(contaminated, "doc_id", "left_anti")


def pack_documents(
    df: DataFrame,
    max_tokens_per_bin: int = 2048,
    n_shards: int = 64,
    text_col: str = "text",
    key_col: str = "doc_id",
    salt: int = 41,
) -> DataFrame:
    """Sequence packing: assign every document to a fixed token-budget
    bin (the pre-training batch-packing step). Documents are sharded by
    the portable key hash, ordered by key inside each shard, and binned
    by the EXCLUSIVE prefix sum of their token counts — a new bin every
    ``max_tokens_per_bin`` tokens; a document straddling a boundary
    stays in the bin its prefix starts in (greedy contiguous fill).

    Deterministic (hash shard + key order — no partition-dependent
    state), and scalable: the only sort is the per-shard window, and a
    shard holds ~|corpus|/n_shards documents, so pick n_shards ~ the
    cluster's task parallelism at 100 TB (the global-sort packing this
    replaces is the single-reducer trap). Returns ``df`` plus
    (n_tokens, shard, bin_id); bin_id = shard * 2^32 + bin-in-shard.
    """
    from pyspark.sql import Window

    from linkgraph.functions.text import token_count

    out = df.withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))
    out = out.withColumn(
        "shard", F.pmod(_key_bucket(key_col, salt), F.lit(n_shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    bin_in_shard = F.floor(cum_excl / F.lit(max_tokens_per_bin)).cast("long")
    return out.withColumn(
        "bin_id",
        F.col("shard").cast("long") * F.lit(1 << 32).cast("long") + bin_in_shard,
    )
