"""Triangle counting via ordered 3-way self-join (SURVEY.md §2.K).

A triangle is counted once by joining e1⋈e2 on the shared vertex and
semi-joining the closing edge. Orientation is ADAPTIVE by default
(``degree_order=None``): one ``agg(max(degree))`` probe picks the
strategy —

* hub-free graphs (max degree <= ``hub_threshold``) use the plain
  ``src < dst`` orientation: no degree joins, the cheap path;
* skewed graphs re-orient each edge from its lower-degree to its
  higher-degree endpoint (ties by id), bounding the wedge join's
  fan-out at O(sqrt(|E|)) per vertex instead of exploding
  quadratically on hubs — the same skew the reference degree-buckets
  for (``modularity_optimisation.cuh:8-9``).

Both orientations produce identical counts; the probe is one scan of
the degree table (already needed on the ordered path) and is dwarfed
by the wedge join it sizes. Pass ``degree_order=True/False`` to skip
the probe and force a strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.graph.build import canonicalize


def _degrees(e: DataFrame) -> DataFrame:
    return (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def _max_src_degree(edges: DataFrame) -> int:
    """Probe scalar for the adaptive orientation, run on the RAW input
    (canonicalization would halve src-side counts): max src-side row
    count. One narrow scan + agg — exact degree on a symmetric table
    (the engine's canonical input); on raw one-directional tables it is
    a lower bound, so a pure-sink hub can slip through to the plain
    path (slower, never wrong) — pass degree_order=True to force."""
    row = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).agg(F.max("d")).first()
    return int(row[0] or 0)


def _orient(e: DataFrame, degree_order: bool, hub_threshold: int = 0) -> DataFrame:
    """Canonical src<dst edges -> oriented wedge-join input (see module
    docstring). ``e`` must already be canonicalized and self-loop-free;
    the adaptive probe happens in the callers (on the raw input)."""
    if not degree_order:
        return e
    deg = _degrees(e).persist()
    out = (
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
    # the orientation result is consumed by two join legs + a semi-join
    # leg; let the persisted deg table go once the plan is built
    deg.unpersist()
    return out


def _wedges(e: DataFrame) -> DataFrame:
    """e1⋈e2 wedge join + closing-edge columns, shared by both APIs."""
    e1, e2 = e.alias("e1"), e.alias("e2")
    return e1.join(e2, F.col("e1.dst") == F.col("e2.src"))


def triangle_count(
    spark: SparkSession,
    edges: DataFrame,
    degree_order: bool | None = None,
    hub_threshold: int = 1000,
) -> DataFrame:
    """Global triangle count. Returns a 1-row DataFrame (n_triangles:long).

    edges: any edge table (directed or undirected rows, self-loops ok)
    — canonicalized internally to one src<dst row per undirected edge.
    degree_order: None = adaptive probe (default); True/False forces
    the ordered/plain orientation.
    """
    if degree_order is None:
        degree_order = _max_src_degree(edges) > hub_threshold
    e = canonicalize(edges).filter(F.col("src") != F.col("dst")).select("src", "dst")
    e = _orient(e, degree_order)
    e3 = e.alias("e3")
    tri = _wedges(e).join(
        e3,
        (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
        "left_semi",
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def triangles_per_vertex(
    spark: SparkSession,
    edges: DataFrame,
    degree_order: bool | None = None,
    hub_threshold: int = 1000,
) -> DataFrame:
    """Per-vertex triangle participation count (id, n_tri). Same
    adaptive orientation as triangle_count — per-vertex counts are
    orientation-invariant (the triangle set is)."""
    if degree_order is None:
        degree_order = _max_src_degree(edges) > hub_threshold
    e = canonicalize(edges).filter(F.col("src") != F.col("dst")).select("src", "dst")
    e = _orient(e, degree_order)
    e3 = e.alias("e3")
    tri = (
        _wedges(e)
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
