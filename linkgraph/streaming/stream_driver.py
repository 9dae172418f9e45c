"""Structured-Streaming wrapper for the incremental layer (stretch
beyond reference parity — SURVEY.md §1.4 notes the reference is
strictly micro-batch-per-timestep; this adapts the same per-batch
transition to a live stream via foreachBatch).

A delta stream (ts, op, src, dst, weight) — e.g. a file source watching
a landing directory, or Kafka in production — drives
``IncrementalStream.process_batch`` exactly once per micro-batch:
apply deletions, apply additions, seed new nodes, compute the
delta-screening frontier, and re-run warm-started Louvain on R.
State (edges + partition) lives in driver-held barriered DataFrames,
checkpointed durably per batch when a checkpoint dir is given —
so a restart resumes from the last completed batch (exactly-once at
the batch level, the foreachBatch idempotency contract).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.plans.superstep import barrier
from linkgraph.streaming.deltas import apply_additions, apply_deletions, seed_new_nodes
from linkgraph.streaming.incremental import run_incremental  # noqa: F401 (parity anchor)
from linkgraph.operators.louvain import louvain
from linkgraph.streaming.screening import frontier_add, frontier_del

DELTA_SCHEMA = "ts int, op string, src long, dst long, weight double"


class IncrementalStream:
    def __init__(
        self,
        spark: SparkSession,
        base_edges: DataFrame,
        checkpoint_dir: str | None = None,
        min_gain: float = 1e-6,
    ):
        self.spark = spark
        self.min_gain = min_gain
        self.checkpoint_dir = checkpoint_dir
        self.edges = barrier(base_edges.select("src", "dst", "weight"))
        res = louvain(spark, self.edges, min_gain=min_gain)
        self.state = barrier(res.assignment)
        self.modularity = res.modularity
        self.batches_done = -1
        if checkpoint_dir:
            self._restore()

    # -- durable state ------------------------------------------------
    def _save(self, batch_id: int) -> None:
        if not self.checkpoint_dir:
            return
        base = os.path.join(self.checkpoint_dir, f"batch={batch_id}")
        self.edges.write.mode("overwrite").parquet(f"{base}/edges")
        self.state.write.mode("overwrite").parquet(f"{base}/state")
        with open(os.path.join(self.checkpoint_dir, "MANIFEST.json"), "w") as f:
            json.dump({"batch_id": batch_id, "modularity": self.modularity}, f)

    def _restore(self) -> None:
        mp = os.path.join(self.checkpoint_dir, "MANIFEST.json")
        if not os.path.exists(mp):
            return
        with open(mp) as f:
            m = json.load(f)
        base = os.path.join(self.checkpoint_dir, f"batch={m['batch_id']}")
        self.edges = barrier(self.spark.read.parquet(f"{base}/edges"))
        self.state = barrier(self.spark.read.parquet(f"{base}/state"))
        self.modularity = m["modularity"]
        self.batches_done = m["batch_id"]

    # -- the foreachBatch sink -----------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= self.batches_done:
            return  # replayed batch after restart: idempotent skip
        # One micro-batch may span MANY timesteps (availableNow folds
        # all pending files into one batch) — reference semantics are
        # del-phase then add-phase PER TIMESTEP in ts order
        # (run_incremental's inner loop): an edge added at ts_i and
        # deleted at ts_j > i within the same batch must not survive.
        ts_list = [
            r.ts for r in batch_df.select("ts").distinct().orderBy("ts").collect()
        ]
        for ts, phase in ((t, p) for t in ts_list for p in ("del", "add")):
            batch = batch_df.filter(
                (F.col("ts") == ts) & (F.col("op") == phase)
            ).select("src", "dst", "weight")
            if batch.isEmpty():
                continue
            if phase == "del":
                new_edges = barrier(apply_deletions(self.edges, batch))
                verts = self.state.select("id")
                r = barrier(frontier_del(self.spark, new_edges, self.state, batch))
            else:
                new_edges = barrier(apply_additions(self.edges, batch))
                self.state = seed_new_nodes(self.spark, new_edges, self.state)
                verts = self.state.select("id")
                r = barrier(frontier_add(self.spark, new_edges, self.state, batch))
            if not r.isEmpty():
                res = louvain(
                    self.spark,
                    new_edges,
                    min_gain=self.min_gain,
                    init_partition=self.state,
                    frontier=r,
                    vertices=verts,
                )
                self.state = barrier(res.assignment)
                self.modularity = res.modularity
            self.edges = new_edges
        self.batches_done = batch_id
        self._save(batch_id)

    def attach(self, delta_stream: DataFrame, **trigger):
        """Start the streaming query: delta_stream must be a streaming
        DataFrame with DELTA_SCHEMA columns."""
        return (
            delta_stream.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .trigger(**(trigger or {"availableNow": True}))
            .start()
        )
