"""Connected components via synchronous min-label propagation.

Superstep recurrence (SURVEY.md §2.K): label' = min(label_v, min of
neighbor labels); converged when no label changes (the reference's
moves-count loop test, ``src/louvain.cpp:460`` analog). Labels are
exact (integer min) — no FP concerns; final label = min vertex id of
the component, which is also what the union-find oracle asserts.

Scale notes: each superstep is one join + one min-aggregation over
the (cached, src-partitioned) symmetric edge table; rounds = graph
diameter. Web graphs have small effective diameter (~6-20 supersteps);
for pathological high-diameter graphs the alternating large-star /
small-star algorithm (Kiveris et al.) halves rounds — a later
optimization hook, not needed for parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.plans.superstep import SuperstepRunner


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 100,
    broadcast_threshold: int = 5_000_000,
    checkpoint_dir: str | None = None,
    run_id: str = "cc",
    runner: SuperstepRunner | None = None,
) -> DataFrame:
    """Returns (id:long, component:long) on the undirected graph.

    edges may be directed rows; symmetry is ensured internally so the
    min flows both ways.
    """
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).filter(F.col("src") != F.col("dst")).distinct().persist()

    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    state = verts.withColumn("component", F.col("id"))
    n = verts.count()
    small = n <= broadcast_threshold

    def step(st: DataFrame, i: int) -> DataFrame:
        labels = st.select("id", "component")
        if small:
            labels = F.broadcast(labels)
        nbr_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        return st.join(nbr_min, st.id == nbr_min.src, "left").select(
            st.id,
            st.component.alias("old_component"),
            F.least(st.component, F.coalesce(F.col("nbr_min"), st.component)).alias(
                "component"
            ),
        )

    def converge(old: DataFrame, new: DataFrame, i: int) -> tuple[bool, float]:
        changed = (
            new.agg(
                F.sum(
                    (F.col("component") != F.col("old_component")).cast("long")
                ).alias("c")
            ).first()["c"]
            or 0
        )
        return changed == 0, float(changed)

    runner = runner or SuperstepRunner(
        spark, run_id=run_id, checkpoint_dir=checkpoint_dir, max_iter=max_iter
    )
    final = runner.run(state, step, converge)
    sym.unpersist()
    return final.select("id", "component")
