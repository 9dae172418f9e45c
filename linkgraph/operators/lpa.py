"""Label-propagation community detection — synchronous rounds with the
reference GPU path's deterministic selection semantics.

This is literally the Louvain inner move step with gain ≡ incident
weight sum (SURVEY.md §2.K): A1 neighbor-label weight aggregation +
W2 arg-max with lowest-label tie-break (reference
``modularity_optimisation.cu:157-160``) + a stability rule (keep the
current label whenever it already attains the maximum weight) that
plays the role of the reference's W3 swap guard against synchronous
two-cycle oscillation.

Scale design (same substrate as operators.pagerank/components):
* the edge table is hash-partitioned on dst ONCE and persisted — the
  per-round gather join never re-exchanges the edge side (shuffle-hash
  with the id-partitioned state as build side above the broadcast
  threshold);
* the vertex's own label enters the aggregation as a zero-weight
  "self row" unioned with the gather output, so NO second state join
  is needed for the stability tie-break (w + 0.0 == w exactly, and
  max(is_cur) marks the current label — semantics identical to the
  former join formulation);
* per round = groupBy(vid,label) with map-side combine (the only
  edge-sized shuffle) + a label-count-sized arg-max groupBy(vid) whose
  output satisfies the update join's distribution.
Hub skew on the (id, label) aggregation is absorbed by map-side
partial aggregation; the arg-max uses ``max_by`` over a struct
(single shuffle) instead of a window sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from linkgraph.plans.superstep import SuperstepRunner, barrier


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 20,
    broadcast_threshold: int = 5_000_000,
    salt_hubs: bool | None = None,
    n_salts: int = 8,
    hub_degree_threshold: int = 1_000_000,
    checkpoint_dir: str | None = None,
    run_id: str = "lpa",
    runner: SuperstepRunner | None = None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """Returns (id:long, label:long). edges: undirected weighted table
    (both directions present, e.g. from graph.build.build_graph);
    self-loops are ignored (P3 self-loop filter).

    salt_hubs: None (default) probes max degree once per call and
    turns a salted two-level (vid, label) aggregation on automatically
    above ``hub_degree_threshold`` (SURVEY.md §4 X2): the salt derives
    from the neighbor id, so a hub's (vid, popular-label) rows spread
    over n_salts partial reducers — result exact (sum is associative).

    pre_partitioned=True: ``edges`` is already the symmetric table,
    hash(src)-partitioned at the session partition count (the K1
    bucketed layout): the one-time repartition is skipped and the
    gather runs along the co-located src side (aggregating per dst) —
    identical labels by symmetry, zero initial exchange."""
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.coalesce(F.col("weight"), F.lit(1.0)).cast("double").alias("weight"),
    ).filter(F.col("src") != F.col("dst"))
    if pre_partitioned:
        gather_key, agg_key = "src", "dst"
    else:
        e = e.repartition(n_part, "dst")
        gather_key, agg_key = "dst", "src"
    e = e.persist()

    if pre_partitioned:
        # the pre_partitioned contract is the SYMMETRIC table, so the
        # src domain IS the vertex domain: ONE degree aggregation —
        # exchange-free on the hash(src) layout (alias-aware output
        # partitioning carries hash(src) through the id rename) —
        # yields the vertex set, the vertex count AND the salt probe's
        # degree scalars; the former union-distinct vertex shuffle and
        # the separate probe job are gone, and the state is derived
        # from the already-id-partitioned aggregate with no
        # repartition exchange.
        deg = barrier(
            e.groupBy(F.col("src").alias("id")).agg(
                F.count(F.lit(1)).alias("d")
            ),
            preserve_partitioning=True,
        )
        row = deg.agg(
            F.count(F.lit(1)).alias("n"),
            F.max("d").alias("mx"),
            F.sum("d").alias("tot"),
        ).first()
        n = int(row["n"] or 0)
        small = False
        if salt_hubs is None:
            max_deg = int(row["mx"] or 0)
            rows_per_reducer = float(row["tot"] or 0) / max(n_part, 1)
            salt_hubs = (
                max_deg > hub_degree_threshold
                and max_deg > rows_per_reducer / 4.0
            )
        state = deg.select("id").withColumn("label", F.col("id"))
    else:
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        n = verts.count()
        small = n <= broadcast_threshold
        if salt_hubs is None:
            # two-term probe: absolute degree AND reducer row share (see
            # pagerank.py — salting below genuine pin-a-reducer scale is
            # pure fixed overhead)
            row = (
                e.groupBy("src")
                .agg(F.count(F.lit(1)).alias("d"))
                .agg(F.max("d").alias("mx"), F.sum("d").alias("tot"))
                .first()
            )
            max_deg = int(row["mx"] or 0)
            rows_per_reducer = float(row["tot"] or 0) / max(n_part, 1)
            salt_hubs = (
                max_deg > hub_degree_threshold
                and max_deg > rows_per_reducer / 4.0
            )
        if small:
            state = verts.withColumn("label", F.col("id"))
        else:
            # checkpoint before aliasing label := id (see components.py
            # — keeps the preserved hash partitioning on the id column)
            state = barrier(
                verts.repartition(n_part, "id"), preserve_partitioning=True
            ).withColumn("label", F.col("id"))

    def step(st: DataFrame, i: int) -> DataFrame:
        labels = st.select(F.col("id").alias("nid"), F.col("label").alias("nbr_label"))
        labels = F.broadcast(labels) if small else labels.hint("shuffle_hash")
        # A1 gather: (vertex, neighboring label, weight); the vertex's
        # own label rides along as a zero-weight self row (no cur join)
        contribs = e.join(labels, e[gather_key] == F.col("nid")).select(
            F.col(agg_key).alias("vid"),
            "nbr_label",
            "weight",
            F.lit(False).alias("is_cur"),
            F.pmod(F.xxhash64(F.col("nid")), F.lit(n_salts)).alias("salt"),
        )
        self_rows = st.select(
            F.col("id").alias("vid"),
            F.col("label").alias("nbr_label"),
            F.lit(0.0).alias("weight"),
            F.lit(True).alias("is_cur"),
            F.lit(0).cast("long").alias("salt"),
        )
        rows = contribs.unionByName(self_rows)
        if salt_hubs:
            # partial per (vid, label, salt) spreads hub keys; final
            # per (vid, label) — exact, deterministic
            by_label = (
                rows.groupBy("vid", "nbr_label", "salt")
                .agg(F.sum("weight").alias("w"), F.max("is_cur").alias("is_cur"))
                .groupBy("vid", "nbr_label")
                .agg(F.sum("w").alias("w"), F.max("is_cur").alias("is_cur"))
            )
        else:
            by_label = rows.groupBy("vid", "nbr_label").agg(
                F.sum("weight").alias("w"), F.max("is_cur").alias("is_cur")
            )
        # W2 + stability: order by (w desc, is_current desc, label asc)
        best = by_label.groupBy("vid").agg(
            F.max_by(
                "nbr_label",
                F.struct(
                    F.col("w").alias("w"),
                    F.col("is_cur").alias("is_cur"),
                    (-F.col("nbr_label")).alias("neg_label"),
                ),
            ).alias("best_label")
        )
        if not small:
            best = best.hint("shuffle_hash")
        out = st.join(best, st.id == best.vid, "left").select(
            st.id,
            st.label.alias("old_label"),
            F.coalesce(F.col("best_label"), st.label).alias("label"),
        )
        # changed-count rides the barrier's materialization (no
        # separate per-superstep count job)
        obs = Observation()
        ctx["obs"] = obs
        return out.observe(
            obs,
            F.sum((F.col("label") != F.col("old_label")).cast("long")).alias("c"),
        )

    ctx: dict[str, Observation] = {}

    def converge(old: DataFrame, new: DataFrame, i: int) -> tuple[bool, float]:
        changed = int(ctx.pop("obs").get["c"] or 0)
        return changed == 0, float(changed)

    runner = runner or SuperstepRunner(
        spark, run_id=run_id, checkpoint_dir=checkpoint_dir, max_iter=max_iter,
        preserve_partitioning=not small,
    )
    final = runner.run(state, step, converge)
    e.unpersist()
    return final.select("id", "label")
