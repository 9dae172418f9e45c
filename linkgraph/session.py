"""SparkSession factory tuned for the link-graph workload.

Local-mode testing stands in for a multi-executor cluster; all sizing
knobs are parameterized so the same code path serves ``local[8]`` /
``local[32]`` scaling runs (BASELINE.md) and a real cluster via
``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "linkgraph",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    hive_warehouse: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    AQE is on (runtime coalescing + skew-join splitting — the Spark
    analog of the reference's degree bucketing, see SURVEY.md §4 X2);
    Arrow transfer is on (the pandas-UDF fast path, §4 X8).

    hive_warehouse (or $SPARK_GRAFT_HIVE_DIR): OPT-IN durable catalog
    — an embedded-Derby Hive metastore rooted at the given directory,
    so catalog-known bucketed layouts (K1 adjacency, L18 IVF tables)
    keep their zero-initial-exchange plans across SESSIONS, not just
    within one (VERDICT r5 #6; asserted by the cross-session pytest).
    Off by default: embedded Derby holds a single-process lock on its
    metastore_db, which would break concurrent harness invocations —
    the in-memory catalog stays the concurrency-safe default, and a
    production deployment points this at a real metastore/Iceberg
    catalog instead.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    # Pin BLAS pools to one thread per Python worker BEFORE the JVM
    # (and hence the pyspark daemon + workers) launches: Spark tasks
    # are the parallelism unit, so N concurrent workers each spawning
    # an ncpu-thread BLAS pool oversubscribes the box quadratically
    # (measured: the 32-core IVF rerank ran 2.4x slower unpinned).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")

    hive_warehouse = hive_warehouse or os.environ.get("SPARK_GRAFT_HIVE_DIR")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow transfer allocates netty DIRECT buffers that are only
        # reclaimed when their (tiny) heap references get collected; a
        # large mostly-empty heap never GCs, direct garbage piles up,
        # and java.nio.Bits.reserveMemory then forces serial
        # System.gc() storms mid-stage (measured: back-to-back
        # Arrow-UDF jobs at local[32] degraded 1.1s -> 60s; a GC
        # between jobs restores 1.1s). Spark's ContextCleaner owns the
        # periodic-GC knob — default 30min, far too lazy for
        # Arrow-heavy sessions.
        .config("spark.cleaner.periodicGC.interval", "60s")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if hive_warehouse:
        builder = (
            builder.config("spark.sql.catalogImplementation", "hive")
            .config("spark.sql.warehouse.dir", f"{hive_warehouse}/warehouse")
            .config(
                "javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={hive_warehouse}/metastore_db;create=true",
            )
            .enableHiveSupport()
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
