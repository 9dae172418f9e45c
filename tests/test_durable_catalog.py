"""Durable catalog probe (VERDICT r5 #6): with the opt-in
embedded-Derby Hive metastore (get_spark(hive_warehouse=...)), a
bucketed K1 layout written in one SESSION keeps its catalog-known
bucketing — and therefore its zero-initial-exchange plans — in a
FRESH session, without re-registration.

Each phase runs in its own subprocess (its own JVM + SparkSession):
the writer creates the bucketed adjacency table, the reader — a new
process that never saw the writer's catalog — plans a src-keyed
aggregation over it and asserts the bucketed scan feeds it with no
Exchange. Embedded Derby locks its metastore per process, so the two
phases run sequentially (the in-memory catalog stays the default for
exactly that concurrency reason — see linkgraph/session.py).
"""
from __future__ import annotations

import subprocess
import sys
import textwrap


def _run(code: str, hive_dir: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        timeout=300,
        env={
            "PATH": "/usr/bin:/bin",
            "HOME": "/root",
            "SPARK_GRAFT_HIVE_DIR": hive_dir,
            "PYTHONPATH": "/root/repo",
        },
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


def test_bucketed_spec_survives_sessions(tmp_path):
    hive_dir = str(tmp_path / "cat")
    data_dir = str(tmp_path / "adj")
    _run(
        f"""
        import os
        from linkgraph.session import get_spark
        from linkgraph.graph.build import write_adjacency_table
        from linkgraph.sources.testdata import undirected_edges
        spark = get_spark("writer", master="local[4]", shuffle_partitions=4)
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
        write_adjacency_table(
            undirected_edges(spark, "/root/testdata/sf0.001"),
            "durable_adj", {data_dir!r}, num_buckets=4)
        print("WROTE", spark.table("durable_adj").count())
        """,
        hive_dir,
    )
    out = _run(
        """
        from pyspark.sql import functions as F
        from linkgraph.session import get_spark
        from linkgraph.graph.build import read_adjacency_table
        spark = get_spark("reader", master="local[4]", shuffle_partitions=4)
        # fresh session, fresh JVM: the table must already be known
        t = read_adjacency_table(spark, "durable_adj")
        agg = t.groupBy("src").agg(F.sum("weight").alias("w"))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        plan = agg._jdf.queryExecution().executedPlan().toString()
        print("EXCHANGES", plan.count("Exchange"))
        print("BUCKETED", "Bucketed: true" in plan)
        print("ROWS", t.count())
        """,
        hive_dir,
    )
    assert "EXCHANGES 0" in out, out
    assert "BUCKETED True" in out, out
    assert "ROWS 2796" in out, out  # sf0.001 symmetric deduped edges
