"""Hierarchy / output post-processing operators (SURVEY.md §2.H) and
small graph-mutation utilities (§2.G G3, §2.D A10).

* flatten_hierarchy — H1 (reference ``main_hierarchy.cpp:112-161``):
  node -> community at level l by composing per-level mappings (J7).
* community_members — H2 (``find_NodCom``, main_louvain.cpp:352-416):
  per-community member lists (prefer the flat state table at scale;
  collect_list is for tooling/debug parity).
* comembership_matrix — H3 (``main_matrix.cpp:113-170``): pairs of
  vertices sharing a community — O(sum |c|^2) self-join, small-scale
  debugging tool only (documented as such in the reference too).
* add_selfloops — G3 (``Graph::add_selfloops``,
  graph_binary.cpp:151-183): append (v,v,1.0) for nodes lacking one
  (required by the CondorA quality metric, id 4).
* graph_stats — A10 max reductions + counts (max weight / max degree /
  community count; graph_binary.cpp:132-140, main_louvain.cpp:1285-88).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_hierarchy(hierarchy: DataFrame, level: int | None = None) -> DataFrame:
    """Compose (level, node, community) mappings bottom-up; returns
    (node, community) at the requested level (default: deepest)."""
    levels = [r[0] for r in hierarchy.select("level").distinct().orderBy("level").collect()]
    if level is not None:
        levels = [l for l in levels if l <= level]
    flat = hierarchy.filter(F.col("level") == levels[0]).select("node", "community")
    for l in levels[1:]:
        nxt = hierarchy.filter(F.col("level") == l).select(
            F.col("node").alias("c_in"), F.col("community").alias("c_out")
        )
        flat = flat.join(nxt, flat.community == F.col("c_in")).select(
            "node", F.col("c_out").alias("community")
        )
    return flat


def community_members(state: DataFrame) -> DataFrame:
    """(community, members array<long>, size) — K3/H2 sink shape."""
    return state.groupBy("community").agg(
        F.sort_array(F.collect_list("id")).alias("members"),
        F.count(F.lit(1)).alias("size"),
    )


def community_sizes(state: DataFrame) -> DataFrame:
    """cluster{t}.txt analog (K3): community -> member count."""
    return state.groupBy("community").agg(F.count(F.lit(1)).alias("size"))


def comembership_pairs(state: DataFrame) -> DataFrame:
    """H3 sparse form: (a, b) vertex pairs (a < b) sharing a community."""
    x = state.select(F.col("id").alias("a"), "community")
    y = state.select(F.col("id").alias("b"), "community")
    return x.join(y, "community").filter(F.col("a") < F.col("b")).select("a", "b")


def contract_graph(
    edges: DataFrame, mapping: DataFrame, broadcast_maps: bool = False
) -> DataFrame:
    """A7: quotient graph under a (id, community) assignment — both
    endpoints remapped, parallel edges merged by weight sum (reference
    ``community_aggregation.cu:248-347``). On a symmetric input the
    output is symmetric; intra-community weight collapses onto the
    diagonal (self-loops). The Louvain level loops call this with their
    per-level dense assignment; ``broadcast_maps`` mirrors their
    small-graph path."""
    map_s = mapping.select(F.col("id").alias("ms"), F.col("community").alias("cs"))
    map_d = mapping.select(F.col("id").alias("md"), F.col("community").alias("cd"))
    if broadcast_maps:
        map_s, map_d = F.broadcast(map_s), F.broadcast(map_d)
    return (
        edges.join(map_s, edges.src == F.col("ms"))
        .join(map_d, edges.dst == F.col("md"))
        .groupBy(F.col("cs").alias("src"), F.col("cd").alias("dst"))
        .agg(F.sum("weight").alias("weight"))
    )


def add_selfloops(edges: DataFrame) -> DataFrame:
    """G3: ensure every vertex has a self-loop (weight 1.0 where absent)."""
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    have = edges.filter(F.col("src") == F.col("dst")).select(
        F.col("src").alias("id")
    ).distinct()
    missing = verts.join(have, "id", "left_anti").select(
        F.col("id").alias("src"), F.col("id").alias("dst"), F.lit(1.0).alias("weight")
    )
    return edges.unionByName(missing)


def graph_stats(edges: DataFrame) -> DataFrame:
    """One-row A10 reductions: edge count, max weight, max degree, n."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    return edges.agg(
        F.count(F.lit(1)).alias("nb_links"),
        F.max("weight").alias("max_weight"),
        F.countDistinct("src").alias("n_src"),
    ).crossJoin(deg.agg(F.max("d").alias("max_degree")))
