"""Label-propagation community detection — synchronous rounds with the
reference GPU path's deterministic selection semantics.

This is literally the Louvain inner move step with gain ≡ incident
weight sum (SURVEY.md §2.K): A1 neighbor-label weight aggregation +
W2 arg-max with lowest-label tie-break (reference
``modularity_optimisation.cu:157-160``) + a stability rule (keep the
current label whenever it already attains the maximum weight) that
plays the role of the reference's W3 swap guard against synchronous
two-cycle oscillation.

Scale notes: per round = one join (state gather, J2) + one two-key
aggregation + one arg-max aggregation. Hub skew on the (id, label)
aggregation is absorbed by map-side partial aggregation; the arg-max
uses ``max_by`` over a struct (single shuffle) instead of a window
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.plans.superstep import SuperstepRunner


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 20,
    broadcast_threshold: int = 5_000_000,
    checkpoint_dir: str | None = None,
    run_id: str = "lpa",
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Returns (id:long, label:long). edges: undirected weighted table
    (both directions present, e.g. from graph.build.build_graph);
    self-loops are ignored (P3 self-loop filter)."""
    e = edges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.coalesce(F.col("weight"), F.lit(1.0)).cast("double").alias("weight"),
    ).filter(F.col("src") != F.col("dst")).persist()

    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = verts.withColumn("label", F.col("id"))
    n = verts.count()
    small = n <= broadcast_threshold

    def step(st: DataFrame, i: int) -> DataFrame:
        labels = st.select(F.col("id").alias("nid"), F.col("label").alias("nbr_label"))
        if small:
            labels = F.broadcast(labels)
        # A1: weight mass per (vertex, neighboring label)
        by_label = (
            e.join(labels, e.dst == F.col("nid"))
            .groupBy(F.col("src").alias("vid"), "nbr_label")
            .agg(F.sum("weight").alias("w"))
        )
        # W2 + stability: order by (w desc, is_current desc, label asc)
        cur = st.select(F.col("id").alias("vid"), F.col("label").alias("cur_label"))
        if small:
            cur = F.broadcast(cur)
        best = (
            by_label.join(cur, "vid")
            .groupBy("vid")
            .agg(
                F.max_by(
                    "nbr_label",
                    F.struct(
                        F.col("w").alias("w"),
                        (F.col("nbr_label") == F.col("cur_label")).alias("is_cur"),
                        (-F.col("nbr_label")).alias("neg_label"),
                    ),
                ).alias("best_label")
            )
        )
        return st.join(best, st.id == best.vid, "left").select(
            st.id,
            st.label.alias("old_label"),
            F.coalesce(F.col("best_label"), st.label).alias("label"),
        )

    def converge(old: DataFrame, new: DataFrame, i: int) -> tuple[bool, float]:
        changed = (
            new.agg(
                F.sum((F.col("label") != F.col("old_label")).cast("long")).alias("c")
            ).first()["c"]
            or 0
        )
        return changed == 0, float(changed)

    runner = runner or SuperstepRunner(
        spark, run_id=run_id, checkpoint_dir=checkpoint_dir, max_iter=max_iter
    )
    final = runner.run(state, step, converge)
    e.unpersist()
    return final.select("id", "label")
