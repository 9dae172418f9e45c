"""Connected components via synchronous min-label propagation.

Superstep recurrence (SURVEY.md §2.K): label' = min(label_v, min of
neighbor labels); converged when no label changes (the reference's
moves-count loop test, ``src/louvain.cpp:460`` analog). Labels are
exact (integer min) — no FP concerns; final label = min vertex id of
the component, which is also what the union-find oracle asserts.

Scale design — ONE exchange per superstep on the big path (the same
shape as operators.pagerank, SURVEY.md §4 X6):
* the symmetric edge table is hash-partitioned on dst ONCE and
  persisted; the state stays hash-partitioned on id with the same
  partition count across barriers (localCheckpoint preserves
  partitioning), so the edges⋈labels gather join needs NO exchange on
  either side (shuffle-hash, state as build side);
* the only per-superstep shuffle is the min-aggregation's groupBy(src)
  — whose output is src-hash-partitioned, satisfying the update join's
  distribution, so that join is exchange-free too;
* below broadcast_threshold vertices the label table is broadcast
  instead (small graphs / harness runs).
Rounds = graph diameter. Web graphs have small effective diameter
(~6-20 supersteps); for pathological high-diameter graphs (long
chains — the web-scale straggler case) ``algorithm="star"`` switches
to the alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond"), which converges
in O(log n) rounds regardless of diameter and yields the identical
min-id labels.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from linkgraph.plans.superstep import SuperstepRunner, barrier, release


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 100,
    broadcast_threshold: int = 5_000_000,
    checkpoint_dir: str | None = None,
    run_id: str = "cc",
    runner: SuperstepRunner | None = None,
    algorithm: str = "min-label",
    pre_partitioned: bool = False,
    chain: int | str = "auto",
    chain_cap: int = 4,
    chain_probe_floor: float = 0.75,
) -> DataFrame:
    """Returns (id:long, component:long) on the undirected graph.

    edges may be directed rows; symmetry is ensured internally so the
    min flows both ways. algorithm: "min-label" (default — one
    exchange per superstep, rounds = diameter) or "star" (large-star /
    small-star contraction — O(log n) rounds, for high-diameter
    graphs; identical labels).

    pre_partitioned=True: the caller guarantees ``edges`` is already
    the SYMMETRIC deduped table, hash(src)-partitioned at the
    session's shuffle partition count (the K1 bucketed layout read via
    ``graph.build.read_adjacency_table``). The one-time
    symmetrize/distinct/repartition is skipped and the superstep
    gathers along the co-located src side instead (aggregating per
    dst) — identical labels by symmetry, zero initial exchange
    (plan-audited).

    chain: min-label iterations composed per MATERIALIZED superstep
    (barrier-elision, the pagerank.chain analog). Min-label
    propagation is monotone and idempotent — iterations past the
    fixpoint are exact no-ops — so the final labels are IDENTICAL for
    every chain schedule; only the per-job fixed costs (driver round
    trip, localCheckpoint, Observation) are amortized, and the
    changed-count convergence test is simply evaluated on the chain's
    last iteration pair. "auto" (default) doubles the chain each
    superstep (1, 1, 2, 4, ... capped at ``chain_cap``): rounds-to-go
    equals the remaining graph diameter, which is unobservable, and
    doubling reaches any diameter D in O(log D) jobs with at most
    ~2x iteration overshoot. chain=1 is the reference-exact
    one-iteration-per-job schedule (the plan-audit configuration);
    runner.max_iter counts chains.

    chain_cap defaults to 4 because each chained min-label iteration
    references the accumulated plan twice (the neighbor aggregation
    AND the least(own, nbr_min) update), so plan size doubles per
    chained iteration — 2^4 embedded copies is the measured-safe
    planning zone (the pagerank chain avoids the doubling by updating
    onto the barriered leaf, but min-label needs the CURRENT label on
    the update side, which lives only on the accumulated frame).
    """
    if algorithm == "star":
        return connected_components_star(spark, edges, max_iter=max_iter)
    if algorithm != "min-label":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if pre_partitioned:
        sym = e.filter(F.col("src") != F.col("dst")).persist()
        gather_key, agg_key = "src", "dst"
    else:
        # dst-partitioned once: every superstep's gather join reads
        # this cache with no fresh exchange on the edge side
        sym = (
            e.unionByName(
                e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .repartition(n_part, "dst")
            .persist()
        )
        gather_key, agg_key = "dst", "src"

    if pre_partitioned:
        # the pre_partitioned contract is the SYMMETRIC table, so the
        # src domain IS the vertex domain: distinct(src) runs
        # exchange-free on the hash(src) layout (alias-aware output
        # partitioning carries hash(src) through the id rename) and
        # comes out id-partitioned — no union-distinct shuffle, no
        # repartition exchange before the state checkpoint.
        small = False
        state = barrier(
            e.select(F.col("src").alias("id")).distinct(),
            preserve_partitioning=True,
        ).withColumn("component", F.col("id"))
    else:
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        n = verts.count()
        small = n <= broadcast_threshold
        if small:
            state = verts.withColumn("component", F.col("id"))
        else:
            # checkpoint the bare id-partitioned vertex set BEFORE
            # aliasing component := id — checkpointing after the alias
            # remaps the preserved hash partitioning onto the alias
            # column, and every id-keyed superstep join would
            # re-exchange the state
            state = barrier(
                verts.repartition(n_part, "id"), preserve_partitioning=True
            ).withColumn("component", F.col("id"))

    if isinstance(chain, str) and chain != "auto":
        raise ValueError(f"chain must be an int or 'auto', got {chain!r}")
    auto = isinstance(chain, str)
    chain_fixed = 1 if auto else max(1, chain)

    def step(st: DataFrame, i: int) -> DataFrame:
        k = ctx["chain_next"] if auto else chain_fixed
        ctx["last_chain"] = k
        cur = st.select("id", "component")
        for j in range(k):
            # the label side is aliased so chained iterations (joining
            # `cur` with a frame DERIVED from `cur`) never trip
            # ambiguous-self-join resolution; the single-iteration plan
            # is unchanged (pure alias)
            labels = cur.select(
                F.col("id").alias("lid"), F.col("component")
            )
            labels = F.broadcast(labels) if small else labels.hint("shuffle_hash")
            nbr_min = (
                sym.join(labels, sym[gather_key] == F.col("lid"))
                .groupBy(F.col(agg_key).alias("vid"))
                .agg(F.min("component").alias("nbr_min"))
            )
            if not small:
                # nbr_min is hash-partitioned on the vertex key by the
                # agg; the state is partitioned on id — exchange-free
                # shuffle-hash update join
                nbr_min = nbr_min.hint("shuffle_hash")
            prev = cur
            cur = prev.join(nbr_min, prev.id == F.col("vid"), "left").select(
                prev.id,
                prev.component.alias("old_component"),
                F.least(
                    prev.component, F.coalesce(F.col("nbr_min"), prev.component)
                ).alias("component"),
            )
            if j < k - 1:
                cur = cur.select("id", "component")
        # changed-count of the LAST iteration pair rides the barrier's
        # materialization (no separate per-superstep count job)
        obs = Observation()
        ctx["obs"] = obs
        return cur.observe(
            obs,
            F.sum(
                (F.col("component") != F.col("old_component")).cast("long")
            ).alias("c"),
        )

    ctx: dict = {
        "chain_next": 1,
        "last_chain": 1,
        # self-calibration (see pagerank.converge): chaining pays only
        # where the per-job floor dominates; probe, keep only if it
        # beats the unchained per-iteration cost
        "t_last": None,
        "uni_cost": None,
        "no_chain": False,
    }

    def converge(old: DataFrame, new: DataFrame, i: int) -> tuple[bool, float]:
        changed = int(ctx.pop("obs").get["c"] or 0)
        if auto:
            now = time.perf_counter()
            iters = ctx["last_chain"]
            if ctx["t_last"] is not None:
                per_iter = (now - ctx["t_last"]) / iters
                if iters == 1:
                    u = ctx["uni_cost"]
                    ctx["uni_cost"] = per_iter if u is None else min(u, per_iter)
                elif ctx["uni_cost"] is not None and per_iter >= 0.9 * ctx["uni_cost"]:
                    ctx["no_chain"] = True
            ctx["t_last"] = now
            if changed:
                if (
                    ctx["no_chain"]
                    or ctx["uni_cost"] is None
                    or ctx["uni_cost"] < chain_probe_floor
                ):
                    # same probe gate as pagerank: below
                    # ``chain_probe_floor`` per unchained superstep the
                    # job floor is within codegen-compile territory and
                    # a chained probe can only lose (measured ~+0.5s at
                    # the bench's 0.65s supersteps); at cluster-scale
                    # floors the probe engages and the doubling
                    # schedule takes over
                    ctx["chain_next"] = 1
                else:
                    ctx["chain_next"] = min(max(1, chain_cap), 2 * ctx["last_chain"])
        return changed == 0, float(changed)

    runner = runner or SuperstepRunner(
        spark, run_id=run_id, checkpoint_dir=checkpoint_dir, max_iter=max_iter,
        preserve_partitioning=not small,
    )
    final = runner.run(state, step, converge)
    sym.unpersist()
    return final.select("id", "component")


def _large_star(l: DataFrame) -> DataFrame:
    """Large-star round: for each node u, connect every STRICTLY LARGER
    neighbor to m = min(Γ(u) ∪ {u}). Preserves connectivity; shrinks
    tall trees geometrically (Kiveris et al. §3)."""
    sym = l.unionByName(
        l.select(F.col("src").alias("dst"), F.col("dst").alias("src")).select(
            "src", "dst"
        )
    )
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(l: DataFrame) -> DataFrame:
    """Small-star round: orient edges high->low; for each node u,
    connect u and all its smaller neighbors to m = min(N(u))."""
    o = (
        l.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
    )
    mins = o.groupBy("src").agg(F.min("dst").alias("m"))
    rewired = o.join(mins, "src").select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    self_edges = mins.select("src", F.col("m").alias("dst"))
    return (
        rewired.unionByName(self_edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components_star(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 60,
    metrics: list[dict] | None = None,
) -> DataFrame:
    """Alternating large-star / small-star contraction — O(log n)
    rounds independent of graph diameter (min-label propagation needs
    diameter rounds: a 4096-chain = 4096 supersteps; the star
    algorithm converges in ~a dozen). Returns (id, component) with
    component = min vertex id of the component — byte-identical to the
    min-label path.

    Convergence: the edge multiset is a fixpoint of small∘large. The
    check is exact: row counts first (cheap, differs in most rounds),
    set difference only when counts match.
    """
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    l = barrier(
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .distinct()
    )
    n_edges = l.count()
    for rnd in range(max_iter):
        if n_edges == 0:
            break
        new = barrier(_small_star(_large_star(l)))
        n_new = new.count()
        if metrics is not None:
            metrics.append({"round": rnd, "edges": n_new})
        if n_new == n_edges and new.exceptAll(l).isEmpty():
            release(l)
            l = new
            break
        release(l)
        l, n_edges = new, n_new
    # final l is a union of stars rooted at component minima: each node
    # points at its root (roots/isolated vertices point at themselves)
    labels = l.groupBy(F.col("src").alias("id")).agg(F.min("dst").alias("component"))
    out = verts.join(labels, "id", "left").select(
        "id", F.coalesce("component", F.col("id")).alias("component")
    )
    result = barrier(out)
    release(l)
    verts.unpersist()
    return result
