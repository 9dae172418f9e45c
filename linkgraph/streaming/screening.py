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


def _local_guard(
    state_n: int, new_edges: DataFrame, local_threshold: int, local_edge_cap: int
) -> bool:
    """The louvain-style doubly-guarded collect check: vertex count
    under the threshold AND edge rows under the cap (the second count
    is one cheap job over the loop's already-barriered graph version —
    and only runs once the vertex guard has passed)."""
    if local_threshold <= 0 or state_n > local_threshold:
        return False
    return new_edges.count() <= local_edge_cap


def _collect_graph(new_edges: DataFrame, state: DataFrame):
    """(adjacency dict, state dict, edge-row triples) via Arrow."""
    epdf = new_edges.select("src", "dst", "weight").toPandas()
    spdf = state.select("id", "community").toPandas()
    st = dict(
        zip((int(i) for i in spdf["id"]), (int(c) for c in spdf["community"]))
    )
    return epdf, st


def _ids_df(spark: SparkSession, ids) -> DataFrame:
    import pandas as pd

    if not ids:
        return spark.createDataFrame([], "id long")
    return spark.createDataFrame(
        pd.DataFrame({"id": sorted(ids)}).astype("int64"), schema="id long"
    )


def _frontier_del_local(
    spark: SparkSession,
    new_edges: DataFrame,
    state: DataFrame,
    delta_del: DataFrame,
) -> DataFrame:
    """Driver-side replay of frontier_del on a guarded-small graph —
    set semantics only (marks, expansion): no floating point anywhere,
    so the returned id set is IDENTICAL to the distributed plan's."""
    epdf, st = _collect_graph(new_edges, state)
    dpdf = symmetrize_delta(delta_del).toPandas()
    seeds: set[int] = set()
    comms: set[int] = set()
    for u, v in zip(dpdf["src"], dpdf["dst"]):
        u, v = int(u), int(v)
        cu, cv = st.get(u), st.get(v)
        if cu is not None and cu == cv:
            seeds.add(u)
            comms.add(cu)
    out = set(seeds)
    if seeds:
        src_np, dst_np = epdf["src"].to_numpy(), epdf["dst"].to_numpy()
        for u, v in zip(src_np, dst_np):
            if int(u) in seeds:
                out.add(int(v))
    for vid, c in st.items():
        if c in comms:
            out.add(vid)
    return _ids_df(spark, out)


def _frontier_add_local(
    spark: SparkSession,
    new_edges: DataFrame,
    state: DataFrame,
    delta_add: DataFrame,
) -> DataFrame:
    """Driver-side replay of frontier_add on a guarded-small graph.

    The gain arithmetic evaluates the same expression tree as the
    distributed plan — w/m + k*((tot_cur-k)-tot_c)/(2*m*m) on sums of
    edge weights that are exact in float64 for integer-valued weights
    (the louvain local fast path's determinism argument) — so marks,
    tie-breaks and acceptances are identical."""
    from collections import defaultdict

    epdf, st = _collect_graph(new_edges, state)
    src_np = epdf["src"].to_numpy()
    dst_np = epdf["dst"].to_numpy()
    w_np = epdf["weight"].to_numpy()
    m = float(w_np.sum()) / 2.0
    denom = 2.0 * m * m
    dpdf = symmetrize_delta(delta_add).toPandas()
    sources = set(int(u) for u in dpdf["src"])

    # candidate communities per source: own + the new edges' targets'
    cands: dict[int, set[int]] = defaultdict(set)
    for u, v in zip(dpdf["src"], dpdf["dst"]):
        u, v = int(u), int(v)
        cv = st.get(v)
        if cv is not None:
            cands[u].add(cv)
    for u in sources:
        cu = st.get(u)
        if cu is not None:
            cands[u].add(cu)

    k = defaultdict(float)
    for u, w in zip(src_np, w_np):
        k[int(u)] += w
    tot = defaultdict(float)
    size = defaultdict(int)
    for vid, c in st.items():
        tot[c] += k[vid]
        size[c] += 1

    # w_vc restricted to sources (the semi-join) and candidate comms
    w_vc: dict[int, dict[int, float]] = {u: defaultdict(float) for u in sources}
    for u, v, w in zip(src_np, dst_np, w_np):
        u = int(u)
        if u in sources and u != int(v):
            cv = st.get(int(v))
            if cv is not None:
                w_vc[u][cv] += w

    seeds: set[int] = set()
    comms_marked: set[int] = set()
    for u in sources:
        cur = st.get(u)
        if cur is None:
            continue  # inner own-join: sources must be in state
        ku = k[u]
        tot_cur, size_cur = tot[cur], size[cur]
        cand_set = cands.get(u, ())
        best_g, best_c = None, None
        for c, w in w_vc[u].items():
            if c == cur or c not in cand_set:
                continue
            if not (c < cur or size[c] > 1 or size_cur > 1):
                continue
            g = w / m + ku * ((tot_cur - ku) - tot[c]) / denom
            if best_g is None or g > best_g or (g == best_g and c < best_c):
                best_g, best_c = g, c
        if best_g is None:
            continue
        e_own = w_vc[u].get(cur, 0.0)
        if best_g - e_own / m > 0.0:
            seeds.add(u)
            comms_marked.add(best_c)
    out = set(seeds)
    if seeds:
        for u, v in zip(src_np, dst_np):
            if int(u) in seeds:
                out.add(int(v))
    for vid, c in st.items():
        if c in comms_marked:
            out.add(vid)
    return _ids_df(spark, out)


def frontier_del(
    spark: SparkSession,
    new_edges: DataFrame,
    state: DataFrame,
    delta_del: DataFrame,
    local_threshold: int = 50_000,
    local_edge_cap: int = 5_000_000,
    n_vertices: int | None = None,
) -> DataFrame:
    """R for a deletion batch. state = previous partition (id, community);
    new_edges = graph AFTER the deletions. Returns (id).

    Under the doubly-guarded thresholds (vertexes AND edge rows — the
    louvain full-local guards) the frontier is computed on the driver:
    the deletion side is pure set logic (no arithmetic at all), so the
    R set is identical, and the ~10-stage distributed plan's fixed
    costs are skipped. local_threshold=0 forces the distributed plan."""
    n = n_vertices if n_vertices is not None else state.count()
    if _local_guard(n, new_edges, local_threshold, local_edge_cap):
        return _frontier_del_local(spark, new_edges, state, delta_del)
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
    local_threshold: int = 50_000,
    local_edge_cap: int = 5_000_000,
    n_vertices: int | None = None,
) -> DataFrame:
    """R for an addition batch. state = previous partition extended to
    new nodes (seed_new_nodes); new_edges = graph AFTER the additions.
    Returns (id).

    Under the doubly-guarded thresholds the frontier is computed on
    the driver (_frontier_add_local — same expression tree, identical
    marks; the distributed plan pays ~10 stages incl. three broadcast
    builds on the critical path, measured 4-6s of pure fixed cost at
    bench scale). local_threshold=0 forces the distributed plan."""
    st = state.select("id", "community")
    n = n_vertices if n_vertices is not None else st.count()
    if _local_guard(n, new_edges, local_threshold, local_edge_cap):
        return _frontier_add_local(spark, new_edges, state, delta_add)
    m = float(new_edges.agg(F.sum("weight")).first()[0] or 0.0) / 2.0
    denom = 2.0 * m * m
    sym = symmetrize_delta(delta_add)

    # candidate communities per source vertex: own + targets'
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
