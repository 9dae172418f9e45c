"""Distributed dense-id assignment (global sorted rank) — no
single-partition exchange.

The naive ``row_number().over(Window.orderBy(col))`` collapses ALL
rows into one task: at 10^12 urls (S4/K5) or |V| level-0 communities
(A6) that single executor sort is the worst scale-killer available.
The reference parallelizes exactly this step with an exclusive scan
(``src/gpu-louvain/community_aggregation.cu:267-273``); the Spark
analog below is the classic range-partition + per-partition-offset
scheme:

1. range-repartition the distinct keys (contiguous, globally ordered
   key ranges — one sampling pass + one shuffle);
2. rank within each range partition (hash window keyed on the
   partition id: every task sorts only its own slice);
3. collect the P per-partition row counts (P rows, O(#partitions)),
   exclusive-scan them on the driver, and add the broadcast offset.

Because the ranges are contiguous in key order and keys are distinct,
``offset(partition) + local_rank`` IS the global sorted rank — the id
of a key is independent of the partition count and of where the
sampled range boundaries happen to fall, so the mapping is
deterministic across runs and cluster sizes (byte-identical to the
old global-window path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.plans.superstep import barrier, release


def dense_ids(
    df: DataFrame,
    col: str,
    out_col: str = "id",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Deterministic dense 0-based ids for the distinct non-null values
    of ``df[col]``: id = rank of the key in global sort order.

    Returns ``(mapping, n)``: an eagerly-materialized
    (col, out_col:long) DataFrame — materialization pins the sampled
    range boundaries so the offset table (computed in a separate
    action) can never drift from the final result — plus the distinct
    key count, already known from the offset pass (callers such as the
    Louvain contraction loop read it instead of running a count()).
    """
    spark = df.sparkSession
    nparts = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = df.select(col).where(F.col(col).isNotNull()).distinct()
    if nparts == 1:
        # single-range fast path (callers pass num_partitions=1 when the
        # key count is known small, e.g. post-contraction Louvain
        # levels): the offset table is trivially {0: 0}, so the
        # per-partition-count collect is unnecessary — ONE action total,
        # with the key count observed during the same materialization.
        # id = global sorted rank, identical to the multi-range path.
        from pyspark.sql import Observation

        obs = Observation()
        out = barrier(
            keys.coalesce(1)
            .withColumn(
                out_col,
                (F.row_number().over(Window.orderBy(col)) - 1).cast("long"),
            )
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        return out, int(obs.get["n"])
    ranged = keys.repartitionByRange(nparts, F.col(col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # per-range-partition rank: the window hash-partitions on _pid, so
    # each task sorts ONE range slice (bounded by the range partitioner's
    # balanced sampling) — never the whole key set.
    local = ranged.withColumn(
        "_lrank", F.row_number().over(Window.partitionBy("_pid").orderBy(col))
    ).persist()
    counts = {
        int(r["_pid"]): int(r["cnt"])
        for r in local.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, running = [], 0
    for pid in sorted(counts):
        offsets.append((pid, running))
        running += counts[pid]
    if not offsets:
        local.unpersist()
        field = dict(df.dtypes)[col]
        out = spark.createDataFrame([], f"`{col}` {field}, {out_col} long")
        return out, 0
    off_df = F.broadcast(
        spark.createDataFrame(offsets, schema="_pid int, _off long")
    )
    out = barrier(
        local.join(off_df, "_pid").select(
            col, (F.col("_off") + F.col("_lrank") - 1).cast("long").alias(out_col)
        )
    )
    local.unpersist()
    return out, running


def release_dense_ids(df: DataFrame) -> None:
    """Free the executor blocks of a dense_ids result once consumed."""
    release(df)
