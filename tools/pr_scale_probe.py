"""Run fixed-superstep PageRank on a prebuilt edge parquet at a given
core count and print per-superstep timing JSON (one line).

Usage: python tools/pr_scale_probe.py <edges_parquet> <cores> [supersteps]

Used by tools/bench_scaling.py to evidence the north rule's two-
cluster-size scaling criterion at local[N] vs local[4N].
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark  # noqa: E402


def main() -> None:
    path, cores = sys.argv[1], int(sys.argv[2])
    supersteps = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    broadcast_threshold = int(sys.argv[4]) if len(sys.argv) > 4 else 5_000_000
    # fixed partition count across core counts: strong scaling must vary
    # ONLY the parallelism level, not the plan
    parts = int(os.environ.get("SPARK_GRAFT_BENCH_PARTS", "64"))
    spark = get_spark(
        f"pr-scale-{cores}", master=f"local[{cores}]", shuffle_partitions=parts
    )
    from linkgraph.operators.pagerank import pagerank
    from linkgraph.plans.superstep import SuperstepRunner

    edges = spark.read.parquet(path).persist()
    n_edges = edges.count()

    # two full runs in ONE JVM: the second is the JIT-warm steady state;
    # min-of-medians controls for GC/interference spikes (observed 1.5x
    # run-to-run swings across separate JVMs on this shared box)
    import statistics

    per_run = []
    wall = 0.0
    for rep in range(2):
        runner = SuperstepRunner(
            spark,
            run_id=f"scale{cores}-r{rep}",
            max_iter=supersteps,
            # big-path mode: state hash partitioning survives barriers, so
            # both superstep joins are exchange-free (plans/superstep.py)
            preserve_partitioning=True,
        )
        t0 = time.perf_counter()
        pagerank(
            spark, edges, tol=0.0, runner=runner,
            broadcast_threshold=broadcast_threshold,
        ).count()
        wall = time.perf_counter() - t0
        secs = [m["seconds"] for m in runner.metrics]
        tail = secs[len(secs) // 2 :] if len(secs) > 3 else secs
        per_run.append(statistics.median(tail))
    per_step = min(per_run)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_edges": n_edges,
                "supersteps": len(secs),
                "wall_sec": round(wall, 3),
                "per_superstep_sec": round(per_step, 4),
                "edges_per_sec_per_superstep": round(n_edges / per_step, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
