"""Scaling-evidence runner (north rule: throughput at two parallelism
levels + scaling efficiency, the sandbox proxy for N vs 4N executors).

Generates a deterministic dense link graph once (sources.edgegen),
then runs fixed-superstep PageRank at local[8] and local[32] in
separate processes (tools/pr_scale_probe.py) with an identical plan
(fixed shuffle-partition count), and writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_vertices] [supersteps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EDGES = "/tmp/linkgraph_scale_edges"


def run(cmd: list[str], env: dict | None = None) -> str:
    e = dict(os.environ)
    e.update(env or {})
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=e, cwd=ROOT, check=True
    )
    return out.stdout.strip().splitlines()[-1]


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    supersteps = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    gen = f"""
import sys; sys.path.insert(0, {ROOT!r})
from linkgraph.session import get_spark
from linkgraph.sources.edgegen import generate_edges
spark = get_spark("scale-gen", master="local[32]", shuffle_partitions=64)
e = generate_edges(spark, {n_vertices}, seed=42, base_out=12, partitions=128)
e.write.mode("overwrite").parquet({EDGES!r})
print("EDGES", spark.read.parquet({EDGES!r}).count())
"""
    print(run([sys.executable, "-c", gen], env={"SPARK_GRAFT_DRIVER_MEM": "48g"}))

    results = {}
    for cores in (32, 8):
        line = run(
            [
                sys.executable,
                "tools/pr_scale_probe.py",
                EDGES,
                str(cores),
                str(supersteps),
                "0",
            ],
            env={"SPARK_GRAFT_DRIVER_MEM": "48g", "SPARK_GRAFT_BENCH_PARTS": "64"},
        )
        results[cores] = json.loads(line)
        print(line)

    t8 = results[8]["per_superstep_sec"]
    t32 = results[32]["per_superstep_sec"]
    speedup = t8 / t32
    efficiency = speedup / 4.0
    n_edges = results[32]["n_edges"]

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured throughput + scaling evidence

Workload: PageRank, {supersteps} fixed supersteps, deterministic dense
link graph (sources/edgegen.py, seed=42, {n_vertices:,} vertices,
{n_edges:,} directed edges), identical plan at both parallelism levels
(64 shuffle partitions, shuffle-hash joins, one exchange per
superstep), single machine, separate JVMs.

| parallelism | per-superstep sec | edges/sec/superstep |
|---|---|---|
| local[8]  | {t8:.3f} | {results[8]['edges_per_sec_per_superstep']:,.0f} |
| local[32] | {t32:.3f} | {results[32]['edges_per_sec_per_superstep']:,.0f} |

* speedup 8->32 cores (4x parallelism): **{speedup:.2f}x**
* strong-scaling efficiency (speedup/4): **{efficiency:.2f}**

Caveat (honest proxy limits): this is one machine sharing memory
bandwidth and one disk for shuffle, not N vs 4N executors with
independent memory/IO; the north rule's >=0.8 target assumes the
latter. The per-superstep plan shuffles only the contribution
aggregation (~{n_edges:,} rows); everything else is exchange-free
(pre-partitioned edges, partitioning-preserving state checkpoints).
"""
        )
    print(json.dumps({"speedup": round(speedup, 3), "efficiency": round(efficiency, 3)}))


if __name__ == "__main__":
    main()
