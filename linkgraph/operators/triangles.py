"""Triangle counting via ordered 3-way self-join (SURVEY.md §2.K).

A triangle is counted once by joining e1⋈e2 on the shared vertex and
semi-joining the closing edge. The DEFAULT orientation is by DEGREE
(each edge points from its lower-degree to its higher-degree endpoint,
ties by id): on a Zipfian web graph the wedge join's fan-out is then
bounded by O(sqrt(|E|)) per vertex instead of exploding quadratically
on hubs — the same skew the reference degree-buckets for
(``modularity_optimisation.cuh:8-9``). ``degree_order=False`` gives
the plain src<dst orientation (cheaper by two degree joins on
hub-free graphs; identical counts either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.graph.build import canonicalize


def triangle_count(
    spark: SparkSession, edges: DataFrame, degree_order: bool = True
) -> DataFrame:
    """Global triangle count. Returns a 1-row DataFrame (n_triangles:long).

    edges: any edge table (directed or undirected rows, self-loops ok)
    — canonicalized internally to one src<dst row per undirected edge.
    """
    e = canonicalize(edges).filter(F.col("src") != F.col("dst")).select("src", "dst")
    if degree_order:
        # re-orient edges from lower-degree to higher-degree endpoint
        # (ties by id) — bounds the join fan-out of hub vertices.
        deg = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        e = (
            e.join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "ds"), "src")
            .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dd"), "dst")
            .select(
                F.when(
                    (F.col("ds") < F.col("dd"))
                    | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))),
                    F.struct(F.col("src").alias("a"), F.col("dst").alias("b")),
                )
                .otherwise(F.struct(F.col("dst").alias("a"), F.col("src").alias("b")))
                .alias("e")
            )
            .select("e.a", "e.b")
            .withColumnsRenamed({"a": "src", "b": "dst"})
        )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
            "left_semi",
        )
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def triangles_per_vertex(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Per-vertex triangle participation count (id, n_tri)."""
    e = canonicalize(edges).filter(F.col("src") != F.col("dst")).select("src", "dst")
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .select(
            F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
        )
    )
    verts = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    return verts.groupBy("id").agg(F.count(F.lit(1)).alias("n_tri"))
