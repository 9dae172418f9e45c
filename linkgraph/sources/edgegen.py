"""Direct deterministic link-graph edge generator — the pages
generator's graph topology without the HTML cost, for large-scale
benchmarking (scaling evidence needs O(10^8) edges; generating HTML at
that size is pointless work). Same counter-based splitmix64 scheme as
sources.pages: identical output under any partitioning / core count.

Topology: out-degree ~ Pareto(a) clipped to [1, max_out] (out-hubs);
targets quadratically skewed toward low vertex ids (in-hubs), so skew
handling is genuinely exercised at benchmark scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from linkgraph.sources.pages import _h


def generate_edges(
    spark: SparkSession,
    n_vertices: int,
    seed: int = 42,
    base_out: int = 0,
    max_out: int = 64,
    pareto_a: float = 1.2,
    partitions: int | None = None,
) -> DataFrame:
    """Directed (src:long, dst:long, weight:double) edge table,
    ~``n_vertices * E[outdeg]`` rows, self-loops removed. base_out adds
    a constant to every out-degree (web pages average ~10-40 links;
    base_out=10 gives realistic density for throughput benchmarks)."""
    rng = spark.range(n_vertices, numPartitions=partitions)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            u01 = _h(seed, ids, 1).astype(np.float64) / 2**64
            outdeg = base_out + np.clip(
                (1.0 / np.power(1.0 - u01, 1.0 / pareto_a)).astype(np.int64),
                1,
                max_out,
            )
            src = np.repeat(ids.astype(np.int64), outdeg)
            # per-edge counters: vertex*131 + j (same scheme as pages)
            starts = ids.astype(np.int64) * 131
            offsets = np.arange(outdeg.sum()) - np.repeat(
                np.cumsum(outdeg) - outdeg, outdeg
            )
            ctr = (np.repeat(starts, outdeg) + offsets).astype(np.uint64)
            tv = _h(seed, ctr, 3).astype(np.float64) / 2**64
            dst = np.minimum((tv * tv * n_vertices).astype(np.int64), n_vertices - 1)
            keep = src != dst
            yield pd.DataFrame(
                {
                    "src": src[keep],
                    "dst": dst[keep],
                    "weight": np.ones(int(keep.sum())),
                }
            )

    return rng.mapInPandas(gen, schema="src long, dst long, weight double")
