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
from linkgraph.functions.text import language_id, quality_features


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
    """
    q = quality_features(df, text_col).select("doc_id", "quality_score")
    l = language_id(df, text_col)
    kept = (
        df.select("doc_id", text_col)
        .join(q, "doc_id")
        .join(l, "doc_id")
        .filter(
            (F.col("quality_score") >= min_quality) & (F.col("pred_lang") == lang)
        )
    )
    canon = exact_dedup(kept, text_col)
    kept = kept.join(
        canon.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id"),
        "doc_id",
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
    # quality_score is already rounded to 6 by quality_features (the
    # same rounding the oracle applies before ITS filter)
    return kept.join(removed, "doc_id", "left_anti").select(
        "doc_id", "quality_score", "pred_lang"
    )
