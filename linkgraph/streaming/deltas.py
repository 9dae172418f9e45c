"""Edge-batch graph mutation (SURVEY.md §2.G) — the reference's
180/245-line in-place CSR shift-copy machinery (``buildNewGraph_add``
src/main_louvain.cpp:143-322, ``buildNewGraph_del`` :423-667)
collapses into union+groupBy / left-anti-join over an immutable edge
snapshot. Each timestep produces a new edge-table version (at scale:
an Iceberg snapshot; here: a fresh barriered DataFrame).

Divergence note (documented, intentional): the reference's add path
has known defects by its own comments (:138-142 — no duplicate check,
weights of existing edges not updated). We implement the well-defined
semantics: adding an existing edge accumulates its weight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.plans.ranks import dense_ids
from linkgraph.plans.superstep import barrier


def symmetrize_delta(delta: DataFrame) -> DataFrame:
    """Delta rows (src, dst[, weight]) -> both directions, self-loops
    once (the GPU driver symmetrizes delEdges the same way,
    src/main_louvain_gpu.cpp:430,601-604)."""
    d = delta.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        (F.coalesce(F.col("weight"), F.lit(1.0)).cast("double") if "weight" in delta.columns
         else F.lit(1.0)).alias("weight"),
    )
    rev = d.filter(F.col("src") != F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return d.unionByName(rev)


def apply_deletions(edges: DataFrame, delta_del: DataFrame) -> DataFrame:
    """G2: remove (src,dst) and (dst,src) — left-anti join replaces the
    reference's tombstone+compact machinery. The batch side is
    broadcast (delta batches are micro-batch-sized by the streaming
    model — a bulk delete should rebuild the graph instead), so the
    surviving rows KEEP the edge table's partitioning — the
    incremental loop's src-partitioned invariant crosses deletion
    phases with zero exchange."""
    sym = symmetrize_delta(delta_del).select("src", "dst")
    return edges.join(F.broadcast(sym), ["src", "dst"], "left_anti")


def apply_additions(
    edges: DataFrame, delta_add: DataFrame, repartition_src: int | None = None
) -> DataFrame:
    """G1: insert symmetrized delta edges; duplicate (src,dst) pairs
    merge by weight sum (clean() semantics).

    repartition_src: partition the unioned rows on hash(src) BEFORE
    the merge — hash(src) satisfies the (src, dst) grouping's
    distribution, so the aggregation runs exchange-free on top and the
    new graph version comes out src-partitioned (the incremental loop
    keeps this invariant so every warm Louvain call runs
    pre-partitioned). Same rows either way."""
    sym = symmetrize_delta(delta_add)
    u = edges.select("src", "dst", "weight").unionByName(sym)
    if repartition_src:
        u = u.repartition(repartition_src, "src")
    return u.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))


def seed_new_nodes(
    spark, new_edges: DataFrame, state: DataFrame, batch: DataFrame | None = None
) -> DataFrame:
    """G4 (src/main_louvain.cpp:1484-1498): vertices first appearing in
    this batch get a community: degree-1 nodes whose single neighbor is
    an old node adopt that neighbor's community; all others get fresh
    singleton communities (ids max(community)+1, +2, ... assigned in
    ascending node-id order, matching the reference's sequential loop).

    state: (id, community) over old nodes. Returns the extended state.
    batch: optional — the addition batch (src, dst, ...) that produced
    ``new_edges``. Pre-batch endpoints are invariantly ⊆ state, so new
    vertices can only be batch endpoints: candidates come from the
    (tiny) batch instead of a full-graph endpoint distinct, and a batch
    touching only known vertices returns ``state`` after one cheap
    emptiness probe. Identical result either way.
    """
    if batch is not None:
        verts = (
            batch.select(F.col("src").cast("long").alias("id"))
            .unionByName(batch.select(F.col("dst").cast("long").alias("id")))
            .distinct()
        )
    else:
        verts = (
            new_edges.select(F.col("src").alias("id"))
            .unionByName(new_edges.select(F.col("dst").alias("id")))
            .distinct()
        )
    old = state.select("id", "community")
    new_nodes = verts.join(old, "id", "left_anti")
    if batch is not None and new_nodes.isEmpty():
        return state

    deg = new_edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # the single neighbor of degree-1 new nodes
    nbr = (
        new_edges.join(new_nodes, new_edges.src == new_nodes.id, "left_semi")
        .select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
    )
    adopt = (
        new_nodes.join(deg, "id")
        .filter(F.col("deg") == 1)
        .join(nbr, "id")
        .join(
            old.select(F.col("id").alias("nbr"), F.col("community").alias("nbr_comm")),
            "nbr",
        )  # inner: neighbor must be an OLD node
        .select("id", F.col("nbr_comm").alias("community"))
    )
    rest = new_nodes.join(adopt.select("id"), "id", "left_anti")
    n_comm = state.agg(F.max("community")).first()[0]
    n_comm = int(n_comm) + 1 if n_comm is not None else 0
    # ascending-node-id rank without a single-partition window (the
    # batch's new-node set is usually small, but the ingest spine
    # should never contain a SinglePartition exchange on any path)
    fresh_ranks, _ = dense_ids(rest, "id", out_col="rank")
    fresh = fresh_ranks.select(
        "id", (F.col("rank") + F.lit(n_comm)).alias("community")
    )
    return barrier(old.unionByName(adopt).unionByName(fresh.select("id", "community")))
