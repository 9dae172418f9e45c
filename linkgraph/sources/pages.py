"""Deterministic Common-Crawl-style pages table generator (FIXTURES.md
F1): (url:string, warc_ts:timestamp, html:binary, text:string,
lang:string). The reference has no ingest like this (its input is
pre-extracted edge lists, Preprocess.R:1-21); BASELINE.json's
input_hint mandates it for the web-scale path.

Determinism is counter-based (splitmix64 of (seed, row id, field)) so
the SAME rows are produced regardless of partitioning/cluster size —
a requirement for the byte-identical-text invariant and for building
the same graph at any parallelism. Generation itself is distributed:
``spark.range(n)`` + an Arrow-vectorized ``mapInPandas`` (no per-row
Python at the Spark row level).

Out-degree is Pareto-distributed (hubs exist) and targets are skewed
toward low page ids, so in-degree hubs exercise the salting/AQE skew
paths downstream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber birch cedar dune ember flint"
).split()
_LANGS = ["en", "de", "fr"]
EPOCH = pd.Timestamp("2024-01-01T00:00:00")


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized counter-based hashing."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
        z = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK
        return (z ^ (z >> np.uint64(31))) & _MASK


def _h(seed: int, i: np.ndarray, field: int) -> np.ndarray:
    return _mix(_mix(i.astype(np.uint64) ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)) ^ np.uint64(field))


def url_of(i: int | np.ndarray, n_sites: int) -> "np.ndarray | str":
    if np.isscalar(i):
        return f"https://site{int(i) % n_sites}.example/page{int(i)}"
    idx = np.asarray(i)
    return np.array(
        [f"https://site{int(j) % n_sites}.example/page{int(j)}" for j in idx]
    )


def _page_batch(ids: np.ndarray, n_pages: int, n_sites: int, seed: int,
                max_out: int) -> pd.DataFrame:
    rows = []
    u01 = (_h(seed, ids, 1).astype(np.float64) / 2**64)
    # Pareto(a=1.2) out-degrees clipped to [1, max_out] — Zipf-ish hubs
    outdeg = np.clip((1.0 / np.power(1.0 - u01, 1.0 / 1.2)).astype(np.int64), 1, max_out)
    for pos, i in enumerate(ids):
        i = int(i)
        title_w = _WORDS[int(_h(seed, np.array([i]), 2)[0]) % len(_WORDS)]
        title = f"Page {i} {title_w}"
        sents = []
        for s in range(3):
            widx = _h(seed, np.arange(i * 8, i * 8 + 6, dtype=np.uint64), 10 + s) % len(_WORDS)
            sents.append(" ".join(_WORDS[int(w)] for w in widx) + ".")
        d = int(outdeg[pos])
        tv = _h(seed, np.arange(i * 131, i * 131 + d, dtype=np.uint64), 3).astype(np.float64) / 2**64
        # quadratic skew toward low ids -> in-degree hubs
        targets = np.minimum((tv * tv * n_pages).astype(np.int64), n_pages - 1)
        links = [
            (f"https://site{int(t) % n_sites}.example/page{int(t)}", f"link {int(t)}")
            for t in targets
        ]
        text = " ".join([title] + sents + [a for _, a in links])
        html = (
            f"<html><head><title>{title}</title></head><body>"
            + "".join(f"<p>{s}</p>" for s in sents)
            + "".join(f'<a href="{u}">{a}</a>' for u, a in links)
            + "</body></html>"
        )
        rows.append(
            (
                f"https://site{i % n_sites}.example/page{i}",
                EPOCH + pd.Timedelta(seconds=i),
                html.encode("utf-8"),
                text,
                _LANGS[i % len(_LANGS)],
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_sites: int | None = None,
    seed: int = 42,
    max_out: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    n_sites = n_sites or max(1, n_pages // 50)
    rng = spark.range(n_pages, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield _page_batch(ids, n_pages, n_sites, seed, max_out)

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)
