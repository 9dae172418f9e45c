"""Per-timestep incremental loop — the reference's specialty
(src/main_louvain.cpp:1217-1611 / main_louvain_gpu.cpp:1229-1633):
each timestep applies a deletion batch then an addition batch, each
phase = mutate graph -> (seed new nodes) -> delta-screening frontier R
-> warm-started Louvain restricted to R (skipped when R is empty,
copying the partition forward).

The reference's "streaming" is exactly this sequential micro-batch
loop (SURVEY.md §2.J) — state (edges_vt, n2c) carried across steps; we
carry (edges DataFrame snapshot, state DataFrame) and persist per-phase
metrics incl. the headline delta-screening win, R%%
(src/main_louvain.cpp:1348,1544).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.operators.louvain import louvain
from linkgraph.plans.superstep import barrier
from linkgraph.streaming.deltas import (
    apply_additions,
    apply_deletions,
    seed_new_nodes,
)
from linkgraph.streaming.screening import frontier_add, frontier_del


@dataclass
class IncrementalRun:
    state: DataFrame  # (id, community) after the last timestep
    edges: DataFrame  # final graph version
    modularity: float
    metrics: list[dict] = field(default_factory=list)


def run_incremental(
    spark: SparkSession,
    base_edges: DataFrame,
    deltas: DataFrame,
    min_gain: float = 1e-6,
    max_levels: int = 20,
    checkpoint_dir: str | None = None,
    screening: bool = True,
) -> IncrementalRun:
    """base_edges: symmetric weighted table (build_graph output).
    deltas: (ts:int, op:'add'|'del', src, dst[, weight]).

    screening=False is the GPU driver's -f full-re-evaluation mode
    (main_louvain_gpu.cpp:95-97,946-953): every phase still warm-starts
    from the carried partition but evaluates ALL vertices (frontier =
    whole vertex set, R%% = 100) — the natural A/B baseline for the
    delta-screening win.
    """
    edges = barrier(base_edges.select("src", "dst", "weight"))
    res = louvain(spark, edges, min_gain=min_gain, max_levels=max_levels)
    state = barrier(res.assignment)
    q = res.modularity
    metrics: list[dict] = [
        {"ts": -1, "phase": "static", "r_size": -1, "r_frac": 1.0, "q": q}
    ]

    ts_list = [r.ts for r in deltas.select("ts").distinct().orderBy("ts").collect()]
    for ts in ts_list:
        for phase in ("del", "add"):
            batch = deltas.filter((F.col("ts") == ts) & (F.col("op") == phase)).select(
                "src", "dst", *(["weight"] if "weight" in deltas.columns else [])
            )
            if batch.isEmpty():
                continue
            if phase == "del":
                new_edges = barrier(apply_deletions(edges, batch))
                verts = state.select("id")
                r = barrier(
                    frontier_del(spark, new_edges, state, batch)
                    if screening
                    else verts
                )
            else:
                new_edges = barrier(apply_additions(edges, batch))
                state = seed_new_nodes(spark, new_edges, state)
                verts = state.select("id")
                r = barrier(
                    frontier_add(spark, new_edges, state, batch)
                    if screening
                    else verts
                )
            n = verts.count()
            r_size = r.count()
            if r_size > 0:
                res = louvain(
                    spark,
                    new_edges,
                    min_gain=min_gain,
                    max_levels=max_levels,
                    init_partition=state,
                    frontier=r,
                    vertices=verts,
                )
                state = barrier(res.assignment)
                q = res.modularity
            edges = new_edges
            metrics.append(
                {
                    "ts": ts,
                    "phase": phase,
                    "r_size": r_size,
                    "r_frac": r_size / n if n else 0.0,
                    "q": q,
                }
            )
    return IncrementalRun(state=state, edges=edges, modularity=q, metrics=metrics)
