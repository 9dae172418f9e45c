"""PageRank as checkpointed DataFrame supersteps.

The flagship query (BASELINE.json metric: edges-processed/sec per
superstep, convergence at per-vertex delta < 1e-6). Reuses the
reference's superstep skeleton (SURVEY.md §2.K): J2 state-gather join,
A2 degree normalization, X6 scalar-driven convergence loop.

Scale design — ONE exchange per superstep on the big path:
* ``edges_norm`` (edge weight / source out-weight) is computed ONCE,
  hash-partitioned on src and persisted (the CSR-style layout, K1).
* the state is kept hash-partitioned on id with the SAME partition
  count; ``barrier`` (localCheckpoint) preserves partitioning, so the
  edges⋈state join needs NO exchange on either side (shuffle-hash
  join, state partition as build side).
* the only per-superstep shuffle is the contribs groupBy(dst) — the
  inherent scatter of PageRank; its output is hash-partitioned on dst,
  which satisfies the state-update join's distribution, so that join
  is also exchange-free.
* below ``broadcast_threshold`` vertices the state is broadcast
  instead (small graphs / harness runs) — note a broadcast build is
  driver-serial, so the threshold is deliberately modest. A
  pre-partitioned input (the K1 bucketed layout) selects the
  co-partitioned plan regardless of size: the per-superstep broadcast
  rebuild costs more than the exchange-free shuffle-hash join from
  ~10^4 vertices up (measured), and it is the plan the layout exists
  for.
* hub skew on the dst-side aggregation is absorbed by map-side
  partial aggregation (sum is associative) + AQE; an explicit salted
  two-level aggregation is available for extreme in-degree skew
  (salt_hubs=True).
* one scalar action per superstep: per-vertex delta + next step's
  dangling mass in a single agg over the materialized new state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from linkgraph.plans.superstep import SuperstepRunner


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    broadcast_threshold: int = 1_000_000,
    salt_hubs: bool | None = None,
    n_salts: int = 8,
    hub_degree_threshold: int = 1_000_000,
    pre_partitioned: bool = False,
    checkpoint_dir: str | None = None,
    run_id: str = "pagerank",
    runner: SuperstepRunner | None = None,
    chain: int = 1,
) -> DataFrame:
    """Power iteration to ``max |score - score'| < tol``.

    edges: directed (src, dst, weight). Dangling vertices (no
    out-edges) redistribute their mass uniformly — the standard
    formulation, matched exactly by the NumPy oracle in tests.
    Returns (id:long, score:double).

    salt_hubs: None (default) probes max in-degree once per call (one
    scan + agg, amortized over the iteration) and turns the salted
    two-level aggregation on automatically above
    ``hub_degree_threshold`` — the reference's degree-bucket idea
    (SURVEY.md §4 X2) as a data-driven default, so a Zipfian in-hub
    never lands on a single reducer. True/False skips the probe.

    pre_partitioned=True: the caller guarantees ``edges`` is already
    hash(src)-partitioned with the session's shuffle partition count —
    e.g. the K1 bucketed layout read via
    ``graph.build.read_adjacency_table`` — so the one-time
    edges_norm repartition is skipped (zero initial exchange;
    plan-audited).

    chain: power iterations per MATERIALIZED superstep (barrier-
    elision). Each runner superstep lazily composes ``chain``
    iterations into one Spark job — the per-job fixed cost (driver
    round trip, task scheduling, localCheckpoint, Observation fetch)
    is paid once per chain instead of once per iteration, which is
    the measured floor on small/contracted graphs (STATUS.md pages-
    spine profile) and a real win at scale too (fewer global barriers
    per convergence). Intermediate iterations fold the dangling mass
    in-plan as a broadcast 1-row scalar (exchange reuse makes the
    rescan free); the convergence test (max per-vertex delta < tol)
    is evaluated on the chain's LAST iteration pair, so a run may
    execute up to chain-1 iterations past convergence — same
    fixpoint criterion, coarser test granularity. chain=1 (default)
    is the reference-exact per-iteration schedule and the plan-audit
    configuration; runner.max_iter counts CHAINS when chain > 1.
    Scores equal the chain=1 run's at the same iteration count
    (identical per-iteration arithmetic; tested allclose).
    """
    edges = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        F.coalesce(F.col("weight"), F.lit(1.0)).cast("double").alias("weight"),
    )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # normalized transition weights — computed once, hash-partitioned on
    # src (CSR-style layout), reused by every superstep with no exchange
    edges_norm = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("p")
    )
    if not pre_partitioned:
        edges_norm = edges_norm.repartition(n_part, "src")
    edges_norm = edges_norm.persist()
    n = verts.count()  # also materializes verts
    if n == 0:
        return spark.createDataFrame([], "id long, score double")
    if salt_hubs is None:
        # two-term probe (VERDICT r3 #9): degree alone over-triggers —
        # map-side partial aggregation already absorbs moderate hubs,
        # and the salted two-level agg is pure fixed overhead there.
        # Salting engages only when the hub is BOTH above the absolute
        # threshold AND holds a row share that would pin one reducer
        # (> 1/4 of the average reducer's input rows).
        row = (
            edges.groupBy("dst")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.max("d").alias("mx"), F.sum("d").alias("tot"))
            .first()
        )
        max_in = int(row["mx"] or 0)
        rows_per_reducer = float(row["tot"] or 0) / max(n_part, 1)
        salt_hubs = (
            max_in > hub_degree_threshold and max_in > rows_per_reducer / 4.0
        )

    dangling_flag = verts.join(out_w, verts.id == out_w.src, "left").select(
        "id", F.col("out_w").isNull().alias("is_dangling")
    )
    n_dangling = (
        dangling_flag.filter(F.col("is_dangling")).count() if chain > 1 else -1
    )
    # state partitioned on id to match edges_norm's src-partitioning;
    # barrier preserves it across supersteps
    state = dangling_flag.withColumn("score", F.lit(1.0 / n)).repartition(n_part, "id")

    small = (not pre_partitioned) and n <= broadcast_threshold
    # dangling mass is carried across supersteps by `converge`; None
    # means "recompute from current state" — covers both the first
    # superstep and a mid-run resume from a durable checkpoint.
    ctx: dict[str, float | None] = {"dangling": None}

    def _one_iteration(cur: DataFrame, base_col) -> DataFrame:
        scores = cur.select("id", "score")
        # broadcast below threshold (driver-serial build: small graphs
        # only); above it, shuffle-hash with the id-partitioned state as
        # build side — zero exchange since both sides are pre-partitioned
        scores = F.broadcast(scores) if small else scores.hint("shuffle_hash")
        contribs = edges_norm.join(scores, edges_norm.src == scores.id).select(
            F.col("src"), F.col("dst"), (F.col("score") * F.col("p")).alias("contrib")
        )
        if salt_hubs:
            # two-level agg: partial per (dst, salt), final per dst —
            # the degree-bucket idea from the reference GPU kernels
            # (SURVEY.md §4 X2) expressed as salted aggregation. The
            # salt derives from the contributing source id, so a hub's
            # incoming rows spread over n_salts reducers
            # deterministically (sum is associative: result exact).
            salted = contribs.withColumn(
                "salt", F.pmod(F.xxhash64("src"), F.lit(n_salts))
            )
            incoming = (
                salted.groupBy("dst", "salt")
                .agg(F.sum("contrib").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("incoming"))
            )
        else:
            incoming = contribs.groupBy("dst").agg(F.sum("contrib").alias("incoming"))
        # rename the join key: chained iterations join `cur` with a
        # frame DERIVED from `cur`, where a shared `dst`/`id` lineage
        # would trip ambiguous-self-join resolution
        incoming = incoming.select(F.col("dst").alias("in_id"), "incoming")
        if not small:
            # incoming is hash-partitioned on dst by the agg; with the
            # state partitioned on id this join is exchange-free too
            incoming = incoming.hint("shuffle_hash")
        return cur.join(incoming, cur.id == F.col("in_id"), "left").select(
            cur.id,
            cur.is_dangling,
            cur.score.alias("old_score"),
            (base_col + F.lit(damping) * F.coalesce(F.col("incoming"), F.lit(0.0))).alias(
                "score"
            ),
        )

    def step(st: DataFrame, i: int) -> DataFrame:
        if ctx["dangling"] is None:
            ctx["dangling"] = float(
                st.agg(
                    F.sum(F.when(F.col("is_dangling"), F.col("score")).otherwise(0.0))
                ).first()[0]
                or 0.0
            )
        cur = st
        for j in range(max(1, chain)):
            if j == 0 or n_dangling == 0:
                # no dangling vertices -> the dangling term is 0.0
                # forever and every chained iteration's base is the
                # same constant: no in-plan scalar needed (the common
                # case for link graphs where every page links out)
                base_col = F.lit(
                    (1.0 - damping) / n + damping * ctx["dangling"] / n
                )
            else:
                # intermediate chained iteration: the dangling mass is
                # a 1-row broadcast scalar folded into the same plan
                # (the rescan of `cur` reuses its exchanges)
                dm = cur.agg(
                    F.sum(
                        F.when(F.col("is_dangling"), F.col("score")).otherwise(0.0)
                    ).alias("dmass")
                )
                cur = cur.crossJoin(F.broadcast(dm))
                base_col = F.lit((1.0 - damping) / n) + F.lit(
                    damping / n
                ) * F.coalesce(F.col("dmass"), F.lit(0.0))
            cur = _one_iteration(cur, base_col)
        # convergence scalars ride the barrier's own materialization
        # (zero extra jobs per superstep): max per-vertex delta + the
        # NEXT superstep's dangling mass
        obs = Observation()
        ctx["obs"] = obs
        return cur.observe(
            obs,
            F.max(F.abs(F.col("score") - F.col("old_score"))).alias("delta"),
            F.sum(
                F.when(F.col("is_dangling"), F.col("score")).otherwise(0.0)
            ).alias("dmass"),
        )

    def converge(old: DataFrame, new: DataFrame, i: int) -> tuple[bool, float]:
        row = ctx.pop("obs").get
        delta = float(row["delta"])
        ctx["dangling"] = float(row["dmass"] or 0.0)
        return delta < tol, delta

    runner = runner or SuperstepRunner(
        spark, run_id=run_id, checkpoint_dir=checkpoint_dir, max_iter=max_iter,
        preserve_partitioning=not small,
    )
    final = runner.run(state, step, converge)
    edges_norm.unpersist()
    return final.select("id", "score")
