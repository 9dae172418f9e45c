"""Delta-screening: compute the re-evaluation frontier R (SURVEY.md
§2 J4-J6, §4 X1) following the GPU semantics of
/root/reference/src/gpu-louvain/node_eval.cu (the authors' original
contribution), which are well-defined — the CPU heuristic is buggy by
its own comments (src/main_louvain.cpp:735,742,768).

* deletion side (``nodeEval_del_gpu`` :1243-1348 via
  ``computeCommunitiesDelSV`` :1059-1110): for every deleted edge whose
  endpoints shared a community under the previous partition, mark the
  source vertex (both directions are present, so both endpoints) and
  mark that community. Inter-community deletions are ignored.
* addition side (``nodeEval_add_gpu`` :818-1057): per source vertex of
  added edges, candidate communities = own + communities of the new
  edges' targets (``computeCommunitiesSVGeneral``); evaluate the exact
  Louvain gain against candidates only (``computeBestComm`` :108-278 —
  same gain/guard/tie-break/acceptance as the move kernel, computed on
  the NEW graph with the warm-started partition); on acceptance mark
  the vertex and its best community.
* expansion (both sides): marked vertices' neighbors
  (``computeFinalNodeEval`` :438-489) + all members of marked
  communities (``computeNodeEval`` :547-561); R = the union.

Skew note (J5): giant communities make the members-expansion join hot;
it is a semi-join on the community key, which AQE skew-split handles —
and R is only ever used as a semi-join filter afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.streaming.deltas import symmetrize_delta


def _expand(
    edges: DataFrame, state: DataFrame, seeds: DataFrame, comms: DataFrame
) -> DataFrame:
    """J6 neighbor expansion + J5 community-members expansion."""
    nbrs = edges.join(
        seeds.select(F.col("id").alias("src")), "src", "left_semi"
    ).select(F.col("dst").alias("id"))
    members = state.join(comms, "community", "left_semi").select("id")
    return seeds.unionByName(nbrs).unionByName(members).distinct()


def frontier_del(
    spark: SparkSession,
    new_edges: DataFrame,
    state: DataFrame,
    delta_del: DataFrame,
) -> DataFrame:
    """R for a deletion batch. state = previous partition (id, community);
    new_edges = graph AFTER the deletions. Returns (id)."""
    sym = symmetrize_delta(delta_del)
    st_s = state.select(F.col("id").alias("sid"), F.col("community").alias("cs"))
    st_d = state.select(F.col("id").alias("did"), F.col("community").alias("cd"))
    intra = (
        sym.join(st_s, sym.src == F.col("sid"))
        .join(st_d, sym.dst == F.col("did"))
        .filter(F.col("cs") == F.col("cd"))
    )
    seeds = intra.select(F.col("src").alias("id")).distinct()
    comms = intra.select(F.col("cs").alias("community")).distinct()
    return _expand(new_edges, state, seeds, comms)


def frontier_add(
    spark: SparkSession,
    new_edges: DataFrame,
    state: DataFrame,
    delta_add: DataFrame,
    broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """R for an addition batch. state = previous partition extended to
    new nodes (seed_new_nodes); new_edges = graph AFTER the additions.
    Returns (id)."""
    m = float(new_edges.agg(F.sum("weight")).first()[0] or 0.0) / 2.0
    denom = 2.0 * m * m
    sym = symmetrize_delta(delta_add)

    # candidate communities per source vertex: own + targets'
    st = state.select("id", "community")
    n = st.count()
    small = n <= broadcast_threshold
    stb = F.broadcast(st) if small else st
    sources = sym.select(F.col("src").alias("vid")).distinct()
    tgt_cands = (
        sym.join(stb.withColumnRenamed("id", "dst"), "dst")
        .select(F.col("src").alias("vid"), F.col("community").alias("cand_c"))
    )
    own_cands = sources.join(stb.withColumnRenamed("id", "vid"), "vid").select(
        "vid", F.col("community").alias("cand_c")
    )
    cands_set = tgt_cands.unionByName(own_cands).distinct()

    # exact Louvain gain on the NEW graph, restricted to candidate comms
    k_df = new_edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k"))
    comm = (
        st.join(k_df, "id", "left")
        .groupBy("community")
        .agg(
            F.sum(F.coalesce("k", F.lit(0.0))).alias("tot"),
            F.count(F.lit(1)).alias("csize"),
        )
    )
    if small:
        comm = F.broadcast(comm)

    labels = st.select(F.col("id").alias("nid"), F.col("community").alias("c_dst"))
    if small:
        labels = F.broadcast(labels)
    w_vc = (
        new_edges.join(sources.withColumnRenamed("vid", "src"), "src", "left_semi")
        .filter(F.col("src") != F.col("dst"))
        .join(labels, new_edges.dst == F.col("nid"))
        .groupBy(F.col("src").alias("vid"), "c_dst")
        .agg(F.sum("weight").alias("w"))
        # findInHashTable gate: only candidate communities participate
        .join(
            cands_set.withColumnRenamed("cand_c", "c_dst"),
            ["vid", "c_dst"],
            "left_semi",
        )
    )
    own = (
        sources.join(stb.withColumnRenamed("id", "vid"), "vid")
        .withColumnRenamed("community", "cur")
        .join(k_df.withColumnRenamed("id", "vid"), "vid", "left")
        .withColumn("k", F.coalesce("k", F.lit(0.0)))
        .join(
            comm.select(
                F.col("community").alias("cur"),
                F.col("tot").alias("tot_cur"),
                F.col("csize").alias("size_cur"),
            ),
            "cur",
        )
    )
    joined = w_vc.join(own, "vid")
    e_own = joined.filter(F.col("c_dst") == F.col("cur")).select(
        F.col("vid").alias("eid"), F.col("w").alias("e_own")
    )
    cand_gain = (
        joined.filter(F.col("c_dst") != F.col("cur"))
        .join(
            comm.select(
                F.col("community").alias("c_dst"),
                F.col("tot").alias("tot_c"),
                F.col("csize").alias("size_c"),
            ),
            "c_dst",
        )
        .filter(
            (F.col("c_dst") < F.col("cur"))
            | (F.col("size_c") > 1)
            | (F.col("size_cur") > 1)
        )
        .withColumn(
            "gain",
            F.col("w") / F.lit(m)
            + F.col("k") * ((F.col("tot_cur") - F.col("k")) - F.col("tot_c")) / F.lit(denom),
        )
    )
    best = cand_gain.groupBy("vid").agg(
        F.max_by(
            F.struct(F.col("c_dst").alias("bc"), F.col("gain").alias("bg")),
            F.struct(F.col("gain"), (-F.col("c_dst")).alias("negc")),
        ).alias("b")
    )
    accepted = (
        best.join(e_own, best.vid == F.col("eid"), "left")
        .filter(
            F.col("b.bg") - F.coalesce(F.col("e_own"), F.lit(0.0)) / F.lit(m) > 0.0
        )
        .select(F.col("vid").alias("id"), F.col("b.bc").alias("community"))
    )
    seeds = accepted.select("id").distinct()
    comms_marked = accepted.select("community").distinct()
    return _expand(new_edges, state, seeds, comms_marked)
