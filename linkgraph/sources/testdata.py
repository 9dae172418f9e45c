"""Derive a deterministic link graph from the driver's TPC-H-ish
parquet tables (TESTDATA.md) so every graph operator has an exact
ANSI-SQL oracle over the same inputs (FIXTURES.md F5).

Canonical derivation (mirrored verbatim by SQL in __spark_entry__.py
— any change here MUST be reflected there):

    C        = count(*) of customer               (vertex domain size)
    raw      = orders -> (src = o_custkey, dst = o_orderkey % C),
               keeping src != dst                  (directed link list)
    dedup    = group raw by (src,dst), weight = count(*)  (S3 clean)
    sym      = dedup ∪ reversed(dedup), re-grouped        (S2 symmetrize)

`raw`/`dedup` is the directed web-link analog; `sym` is the
undirected working table of the community queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def vertex_domain(spark: SparkSession, sf_dir: str) -> int:
    return _table(spark, sf_dir, "customer").count()


def directed_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduped directed edges (src, dst, weight=multiplicity)."""
    c = vertex_domain(spark, sf_dir)
    orders = _table(spark, sf_dir, "orders")
    raw = orders.select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("o_orderkey") % F.lit(c)).cast("long").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    return raw.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("weight")
    )


def undirected_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized weighted edges: weight(u,v) = multiplicity of (u,v)
    plus multiplicity of (v,u) in the directed list."""
    d = directed_edges(spark, sf_dir)
    rev = d.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    return d.unionByName(rev).groupBy("src", "dst").agg(F.sum("weight").alias("weight"))


# The same derivation as DuckDB SQL CTEs, for oracle_sql() composition.
EDGES_CTE = """
  nverts AS (SELECT count(*) AS c FROM customer),
  raw AS MATERIALIZED (
    SELECT CAST(o_custkey AS BIGINT) AS src,
           CAST(o_orderkey % (SELECT c FROM nverts) AS BIGINT) AS dst
    FROM orders
    WHERE CAST(o_custkey AS BIGINT) <> CAST(o_orderkey % (SELECT c FROM nverts) AS BIGINT)
  ),
  dedup AS (
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS weight
    FROM raw GROUP BY src, dst
  ),
  edges AS MATERIALIZED (
    SELECT src, dst, CAST(sum(weight) AS DOUBLE) AS weight FROM (
      SELECT src, dst, weight FROM dedup
      UNION ALL
      SELECT dst AS src, src AS dst, weight FROM dedup
    ) GROUP BY src, dst
  )
"""
