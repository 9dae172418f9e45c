"""Generalized Louvain: the same multi-level synchronous-round engine
driven by ANY of the reference's 10 quality functions (SURVEY.md §2.I,
-q id in the reference CLI — factory at src/main_louvain.cpp:998-1059).

Differences from operators.louvain (the GPU-exact default, id 0):
* gain = the CPU comparison formula of the selected metric
  (functions/quality.py, transcribed from the reference headers) with
  the CPU's remove-then-evaluate semantics: the node's own community
  is evaluated with the node removed (tot/w_c/in adjusted), and a move
  happens only if best-candidate gain > max(own gain, 0) — mirroring
  the CPU loop's best_increase init (src/louvain.cpp:413-428).
* convergence = moves count per synchronous round (the scalar the
  reference's pass loop uses, src/louvain.cpp:458-460); the metric's
  full quality() value is computed at every level boundary (the scalar
  the reference prints per pass) and recorded in metrics.
* node weights (nodes_w, src/graph_binary.h:67) are tracked across
  contractions — several metrics (Zahn/OwZad/Goldberg/DevInd/DevUni/
  DP/BalMod) depend on them.
* the W3 swap guard is kept: synchronous rounds need it regardless of
  metric (documented divergence from the sequential CPU loop).

Reference driver preprocessing reproduced here
(main_louvain.cpp:1000-1060, applied at nbc == 0 — level 0 — only):
* max_w (Graph::max_weight) is computed ONCE at level 0 and reused at
  every contracted level (contraction inflates weights; recomputing
  would change Zahn/OwZad/Goldberg/DP/BalMod semantics).
* CondorA (4): add_selfloops, then CondorA::graph_weighting; the side
  scalar sum_se feeds quality().
* DP (7): max_w from the ORIGINAL weights, then DP::graph_weighting;
  the side scalar sum_sq feeds quality().
* ShiMalik (8): kappa (live non-empty-community count) gates the gain
  at kappa < kappa_min; here kappa is the count at round start (the
  sequential CPU updates it mid-scan — a documented synchronous-round
  divergence), recomputed only when the gate can fire (kappa_min > 1).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.functions.quality import (
    GAIN_FUNCTIONS,
    QualityInputs,
    graph_weighting,
    quality_value,
)
from linkgraph.graph.hierarchy import add_selfloops
from linkgraph.operators.louvain import _dense_communities, _k_table
from linkgraph.plans.superstep import barrier, release


@dataclass
class GeneralizedLouvainResult:
    assignment: DataFrame
    levels: int
    quality_id: int
    quality: float = 0.0
    metrics: list[dict] = field(default_factory=list)


def _gain(qid: int, q: QualityInputs, params: dict) -> F.Column:
    name, fn = GAIN_FUNCTIONS[qid]
    if qid == 2:
        return fn(q, alpha=params.get("alpha", 0.5))
    if qid == 8:
        return fn(q, kappa=params.get("kappa", 1.0), kappa_min=params.get("kappa_min", 0.0))
    return fn(q)


def _round_core(
    e: DataFrame,
    state: DataFrame,
    node_w: DataFrame,
    k_df: DataFrame,
    self_df: DataFrame,
    small: bool,
    n_part: int,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared per-round frames: per_node (id, community, k, w_u,
    self_w), joined (vid, c_dst, w, cur, k, w_u, self_w) — one row per
    (vertex, neighboring community) from the round's SINGLE gather —
    and comm (community, tot, w_c, csize, in_c).

    in_c = Σ_v e(v->C(v)) + Σ member self-loops (= the reference
    in[c]: every symmetric intra-community row counted once plus
    self-loops) — derived from the gather output instead of the former
    second edge double-join, so the edge table is scanned/joined
    exactly ONCE per round. Big path: e must be dst-partitioned (the
    per-level checkpoint); the gather join exchanges only the
    vertex-sized label side, and the A1 aggregation repartitions on
    src — no per-round edge re-exchange (plan-audited)."""
    labels = state.select(F.col("id").alias("nid"), F.col("community").alias("c_dst"))
    labels = F.broadcast(labels) if small else labels.hint("shuffle_hash")
    gather = (
        e.filter(F.col("src") != F.col("dst"))
        .join(labels, e.dst == F.col("nid"))
        .select("src", "c_dst", "weight")
    )
    if not small:
        gather = gather.repartition(n_part, "src")
    w_vc = gather.groupBy("src", "c_dst").agg(F.sum("weight").alias("w"))

    per_node = (
        state.join(k_df, "id", "left")
        .join(node_w, "id", "left")
        .join(self_df, "id", "left")
        .select(
            "id",
            "community",
            F.coalesce("k", F.lit(0.0)).alias("k"),
            F.coalesce("w_u", F.lit(1.0)).alias("w_u"),
            F.coalesce("self_w", F.lit(0.0)).alias("self_w"),
        )
    )
    st = F.broadcast(per_node) if small else per_node.hint("shuffle_hash")
    joined = w_vc.join(st, w_vc.src == st.id).select(
        F.col("src").alias("vid"),
        "c_dst",
        "w",
        F.col("community").alias("cur"),
        "k",
        "w_u",
        "self_w",
    )
    base = per_node.groupBy("community").agg(
        F.sum("k").alias("tot"),
        F.sum("w_u").alias("w_c"),
        F.count(F.lit(1)).alias("csize"),
        F.sum("self_w").alias("sc"),
    )
    inc = (
        joined.filter(F.col("c_dst") == F.col("cur"))
        .groupBy(F.col("cur").alias("community"))
        .agg(F.sum("w").alias("iw"))
    )
    comm = (
        base.join(inc, "community", "left")
        .withColumn("in_c", F.coalesce("iw", F.lit(0.0)) + F.col("sc"))
        .select("community", "tot", "w_c", "csize", "in_c")
    )
    return per_node, joined, comm


def _move_round_q(
    e: DataFrame,
    state: DataFrame,
    node_w: DataFrame,
    k_df: DataFrame,
    self_df: DataFrame,
    qid: int,
    params: dict,
    m2: float,
    n: float,
    max_w: float,
    small: bool,
    n_part: int,
) -> DataFrame:
    per_node, joined, comm = _round_core(
        e, state, node_w, k_df, self_df, small, n_part
    )
    if small:
        comm = F.broadcast(comm)

    own = per_node.withColumnRenamed("id", "vid").withColumnRenamed(
        "community", "cur"
    ).join(
        comm.select(
            F.col("community").alias("cur"),
            F.col("tot").alias("tot_cur"),
            F.col("w_c").alias("w_c_cur"),
            F.col("csize").alias("size_cur"),
            F.col("in_c").alias("in_cur"),
        ),
        "cur",
    )
    e_own = joined.filter(F.col("c_dst") == F.col("cur")).select(
        F.col("vid").alias("eid"), F.col("w").alias("e_own")
    )
    with_own = own.join(e_own, own.vid == F.col("eid"), "left").withColumn(
        "e_own", F.coalesce("e_own", F.lit(0.0))
    )
    # own-community gain with the node removed (CPU remove() semantics)
    q_own = QualityInputs(
        dnc=F.col("e_own"),
        degc=F.col("k"),
        tot_c=F.col("tot_cur") - F.col("k"),
        in_c=F.col("in_cur") - (F.lit(2.0) * F.col("e_own") + F.col("self_w")),
        self_v=F.col("self_w"),
        w_u=F.col("w_u"),
        w_c=F.col("w_c_cur") - F.col("w_u"),
        m2=m2,
        n=n,
        max_w=max_w,
    )
    own_pack = with_own.select(
        "vid",
        F.greatest(_gain(qid, q_own, params), F.lit(0.0)).alias("own_gain"),
        "size_cur",
    )

    q_cand = QualityInputs(
        dnc=F.col("w"),
        degc=F.col("k"),
        tot_c=F.col("tot_c"),
        in_c=F.col("in_cc"),
        self_v=F.col("self_w"),
        w_u=F.col("w_u"),
        w_c=F.col("w_cc"),
        m2=m2,
        n=n,
        max_w=max_w,
    )
    cands = joined.filter(F.col("c_dst") != F.col("cur")).join(
        comm.select(
            F.col("community").alias("c_dst"),
            F.col("tot").alias("tot_c"),
            F.col("w_c").alias("w_cc"),
            F.col("csize").alias("size_c"),
            F.col("in_c").alias("in_cc"),
        ),
        "c_dst",
    )
    gain = _gain(qid, q_cand, params)
    # W3 swap guard as two filtered argmaxes chosen by the own row's
    # size_cur (the id-0 pattern — the guard needs the own community's
    # size, which is not on the candidate row)
    strict_ok = (F.col("c_dst") < F.col("cur")) | (F.col("size_c") > 1)
    val = F.struct(F.col("c_dst").alias("bc"), gain.alias("bg"))
    ordr = F.struct(gain.alias("g"), (-F.col("c_dst")).alias("negc"))
    best = cands.groupBy(F.col("vid").alias("bid")).agg(
        F.max_by(val, F.when(strict_ok, ordr)).alias("b_strict"),
        F.max_by(val, ordr).alias("b_any"),
    )
    return (
        state.join(best, state.id == F.col("bid"), "left")
        .join(own_pack, state.id == F.col("vid"), "left")
        .withColumn(
            "b",
            F.when(F.col("size_cur") > 1, F.col("b_any")).otherwise(
                F.col("b_strict")
            ),
        )
        .select(
            state.id,
            F.when(
                F.col("b").isNotNull()
                & (F.col("b.bg") > F.coalesce(F.col("own_gain"), F.lit(0.0))),
                F.col("b.bc"),
            )
            .otherwise(state.community)
            .alias("community"),
            state.community.alias("old_community"),
        )
    )


def louvain_generalized(
    spark: SparkSession,
    edges: DataFrame,
    quality_id: int = 0,
    params: dict | None = None,
    max_rounds_per_level: int = 50,
    max_levels: int = 10,
    broadcast_threshold: int = 5_000_000,
) -> GeneralizedLouvainResult:
    """Multi-level Louvain under quality function ``quality_id`` (0-9,
    the reference's -q ids). Level-0 preprocessing (self-loop injection
    + graph_weighting for CondorA/DP, one-time max_w) is applied
    internally, matching the reference driver's call order
    (main_louvain.cpp:1022-1045); add_selfloops is idempotent, so
    callers that already injected loops are unaffected."""
    params = dict(params or {})
    e = edges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.coalesce(F.col("weight"), F.lit(1.0)).cast("double").alias("weight"),
    )
    side = 0.0
    max_w = 1.0
    if quality_id == 7:
        # DP: max_weight from the ORIGINAL weights, then reweight
        max_w = float(e.agg(F.max("weight")).first()[0] or 1.0)
        e, side = graph_weighting(e, 7)
    elif quality_id == 4:
        e = add_selfloops(e)
        e, side = graph_weighting(e, 4)
    e = e.persist()
    m2 = float(e.agg(F.sum("weight")).first()[0] or 0.0)
    if quality_id not in (4, 7):
        max_w = float(e.agg(F.max("weight")).first()[0] or 1.0)
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = float(verts.count())  # sum_nodes_w with unit node weights
    small = n <= broadcast_threshold
    metrics: list[dict] = []

    if m2 == 0.0:
        # edgeless graph: every vertex its own dense community
        e.unpersist()
        dense, _ = _dense_communities(verts.select(F.col("id").alias("community")))
        assignment = dense.select(
            F.col("community").alias("id"), F.col("cid").alias("community")
        )
        return GeneralizedLouvainResult(
            assignment=assignment, levels=0, quality_id=quality_id,
            quality=0.0, metrics=metrics,
        )

    kappa_min = params.get("kappa_min", 0.0)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # big path: dst-partition the edge table once per level (the id-0
    # machinery) so no round ever re-exchanges the edge side
    cur_edges = (
        e
        if small
        else barrier(
            e.repartition(n_part, "dst"),
            reset_stats=True,
            preserve_partitioning=True,
        )
    )
    state = verts.select("id", F.col("id").alias("community"))
    node_w = verts.select("id", F.lit(1.0).alias("w_u"))
    orig_map = verts.select(F.col("id").alias("orig"), F.col("id").alias("node"))
    levels_done = 0
    n_nodes = int(n)  # per-level vertex count, updated by contraction
    q_final = 0.0
    for level in range(max_levels):
        state = barrier(state, reset_stats=True)
        k_df = _k_table(cur_edges).persist()
        self_df = (
            cur_edges.filter(F.col("src") == F.col("dst"))
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("weight").alias("self_w"))
        ).persist()
        moved_any = False
        for rnd in range(max_rounds_per_level):
            _t0 = time.perf_counter()
            if quality_id == 8 and kappa_min > 1:
                # live kappa at round start (see module docstring)
                params["kappa"] = float(
                    state.join(k_df, "id")
                    .filter(F.col("k") > 0.0)
                    .select("community")
                    .distinct()
                    .count()
                )
            new_state = barrier(
                _move_round_q(
                    cur_edges, state, node_w, k_df, self_df,
                    quality_id, params, m2, n, max_w, small, n_part,
                ),
                reset_stats=True,
            )
            moves = new_state.filter(
                F.col("community") != F.col("old_community")
            ).count()
            release(state)
            state = new_state  # keep the barriered frame (release registry)
            metrics.append(
                {
                    "level": level,
                    "round": rnd,
                    "moves": moves,
                    "seconds": round(time.perf_counter() - _t0, 3),
                }
            )
            if moves == 0:
                break
            moved_any = True
        # the metric's quality() value at this level's fixpoint — the
        # scalar the reference prints each pass
        _, _, comm = _round_core(
            cur_edges, state, node_w, k_df, self_df, small, n_part
        )
        q_final = quality_value(
            comm, quality_id, m2, n, max_w,
            alpha=params.get("alpha", 0.5), side=side,
        )
        metrics.append({"level": level, "quality": q_final})
        k_df.unpersist()
        self_df.unpersist()
        levels_done = level + 1
        if not moved_any:
            break
        dense_raw, n_comms = _dense_communities(state)
        dense = F.broadcast(dense_raw) if small else dense_raw
        state_dense = barrier(
            state.join(dense, "community").select("id", F.col("cid").alias("community"))
        )
        orig_map = barrier(
            orig_map.join(state_dense, orig_map.node == state_dense.id).select(
                "orig", F.col("community").alias("node")
            ),
            reset_stats=True,
        )
        if n_comms == n_nodes:
            break
        n_nodes = n_comms
        map_s = state_dense.select(F.col("id").alias("ms"), F.col("community").alias("cs"))
        map_d = state_dense.select(F.col("id").alias("md"), F.col("community").alias("cd"))
        if small:
            map_s, map_d = F.broadcast(map_s), F.broadcast(map_d)
        contracted = (
            cur_edges.join(map_s, cur_edges.src == F.col("ms"))
            .join(map_d, cur_edges.dst == F.col("md"))
            .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
            .agg(F.sum("weight").alias("weight"))
        )
        if not small:
            contracted = contracted.repartition(n_part, "dst")
        nxt = barrier(
            contracted,
            reset_stats=not small,
            preserve_partitioning=not small,
        )
        node_w = barrier(
            node_w.join(state_dense, "id")
            .groupBy(F.col("community").alias("id"))
            .agg(F.sum("w_u").alias("w_u"))
        )
        if cur_edges is not e:
            release(cur_edges)
        cur_edges = nxt
        state = dense.select(F.col("cid").alias("id"), F.col("cid").alias("community"))

    if cur_edges is not e:
        release(cur_edges)
    e.unpersist()
    assignment = orig_map.select(F.col("orig").alias("id"), F.col("node").alias("community"))
    return GeneralizedLouvainResult(
        assignment=assignment,
        levels=levels_done,
        quality_id=quality_id,
        quality=q_final,
        metrics=metrics,
    )
