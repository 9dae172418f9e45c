"""Debug echo sinks (SURVEY.md §2.A K4) — the reference's graph
inspection utilities re-expressed as DataFrames (so they are real
distributed sinks, not driver prints):

* display_adjacency — ``Graph::display`` (graph_binary.cpp:185-200):
  one row per vertex with its sorted (neighbor, weight) list.
* display_reverse  — ``Graph::display_reverse`` (:202-215): the edge
  list restricted to node > neighbor (one row per undirected edge,
  emitted as (low, high, weight) exactly as the reference prints).
* check_symmetry   — ``Graph::check_symmetry`` (:217-240): rows where
  (i,j) and (j,i) carry different weights (empty == symmetric). The
  reference's O(deg²) nested scan becomes one self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def display_adjacency(edges: DataFrame) -> DataFrame:
    """(node, neighbors array<struct<dst,weight>>) sorted by dst —
    the CSR adjacency echo, one row per vertex."""
    return (
        edges.select(
            F.col("src").alias("node"),
            F.struct(F.col("dst"), F.col("weight")).alias("nb"),
        )
        .groupBy("node")
        .agg(F.sort_array(F.collect_list("nb")).alias("neighbors"))
    )


def display_reverse(edges: DataFrame) -> DataFrame:
    """Edges with src > dst, printed low-id first (reference emits
    ``neigh node weight`` for node > neigh): (a, b, weight), a < b."""
    return edges.filter(F.col("src") > F.col("dst")).select(
        F.col("dst").alias("a"), F.col("src").alias("b"), "weight"
    )


def check_symmetry(edges: DataFrame) -> DataFrame:
    """Asymmetry violations: (src, dst, weight, reverse_weight) where
    the (dst,src) row is missing or carries a different weight.
    Empty result == the table is a valid symmetric graph."""
    fwd = edges.select("src", "dst", "weight")
    rev = edges.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("weight").alias("reverse_weight"),
    )
    return (
        fwd.join(rev, ["src", "dst"], "left")
        .filter(
            F.col("reverse_weight").isNull()
            | (F.col("weight") != F.col("reverse_weight"))
        )
        .select("src", "dst", "weight", "reverse_weight")
    )
