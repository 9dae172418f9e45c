"""ANN tier at-scale evidence: IVF index build + indexed top-k query
over a large synthetic embedding table at two parallelism levels — the
similarity tier's analog of the PageRank scaling probe (north rule:
throughput at N and 4N cores + scaling efficiency; graph-tier evidence
lives in tools/bench_scaling.py, corpus-tier in
tools/corpus_scale_bench.py).

Vectors are generated deterministically with pure Column expressions
(no driver-side data): 64-dim uniform [-1, 1) from xxhash64 streams.
Three timed phases per level, the production IVF shape
(functions/similarity.py build_ivf_index / knn_ivf_indexed):

* ASSIGN — quantize the full corpus (Arrow-batched matmul against the
  precomputed 128-centroid quantizer) into a noop sink: the CPU-bound
  scalable kernel, isolated from disk. The scaling headline. The
  quantizer itself is untimed prep (one-time sampled training, shared
  verbatim across levels — the graph tier treats its bucketed-layout
  build the same way).
* BUILD — assign + shuffle by list id + cid-partitioned parquet
  write. Adds a fixed single-disk I/O floor locally; absolutes only.
* QUERY — a query batch against the index: quantize driver-side,
  read only the probed list partitions, shuffle-free mapInArrow
  matmul rerank (queries ship in the closure).

Usage:
  python tools/ann_scale_bench.py [n_vectors]          # orchestrate
  python tools/ann_scale_bench.py --probe CORES        # one JVM probe
Writes/refreshes the "## ANN tier at scale" section of
BENCH/BASELINE.md (preserving other sections) and prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _code_version() -> str:
    """git HEAD of the repo — cached results are stamped with it so a
    code change invalidates them instead of reprinting a stale wall
    time as freshly measured (ADVICE r5)."""
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=ROOT, timeout=10,
        )
        return out.stdout.strip() or "unknown"
    except Exception:
        return "unknown"
sys.path.insert(0, ROOT)

VECS = "/tmp/linkgraph_scale_vecs"
CENTS = "/tmp/linkgraph_scale_vecs_centroids.json"
MARK = "## ANN tier at scale"
DIM = 64
N_CENTROIDS = 128  # > the 64-list inline threshold: the scale path
N_PROBE = 8
K = 10
QUERY_STRIDE = 20000  # ~n/20000 queries


def _generate(n_vectors: int) -> None:
    from pyspark.sql import functions as F

    from linkgraph.session import get_spark

    spark = get_spark(
        "ann-scale-gen", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ids = spark.range(n_vectors).select(F.col("id").alias("vec_id"))
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(17)), F.lit(2_000_001))
            / 1_000_000.0
            - 1.0
        ),
    )
    (
        ids.repartition(128)
        .select("vec_id", emb.alias("embedding"))
        .write.mode("overwrite")
        .parquet(VECS)
    )
    print("VECS", spark.read.parquet(VECS).count())
    from linkgraph.functions.similarity import ivf_centroids

    cents = ivf_centroids(spark.read.parquet(VECS), N_CENTROIDS)
    with open(CENTS, "w") as f:
        json.dump(cents, f)


def _probe(cores: int) -> None:
    from pyspark.sql import functions as F

    from linkgraph.session import get_spark

    spark = get_spark(
        "ann-scale-probe", master=f"local[{cores}]", shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from linkgraph.functions.similarity import (
        build_ivf_index,
        knn_ivf_indexed,
        knn_ivf_join,
    )

    with open(CENTS) as f:
        cents = [(int(cid), ce) for cid, ce in json.load(f)]
    vectors = spark.read.parquet(VECS)
    n_vectors = vectors.count()
    queries = vectors.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    n_queries = queries.count()
    idx = "/tmp/linkgraph_ivf_idx"  # shared: probes run serially, overwrite
    from linkgraph.functions.similarity import _np_quantizer_udfs

    assign_udf, _ = _np_quantizer_udfs(cents, 1)
    assigned = vectors.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("nv"),
    ).withColumn("cid", assign_udf(F.col("nv")))
    assign_walls, build_walls, query_walls, join_walls = [], [], [], []
    rows = jrows = 0
    for _ in range(2):  # two in-JVM runs per phase, min (warmup guard)
        # assignment only, noop sink: the CPU-bound scalable kernel,
        # isolated from the disk-bandwidth-bound partitioned write
        t0 = time.perf_counter()
        assigned.write.format("noop").mode("overwrite").save()
        assign_walls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        build_ivf_index(vectors, idx, centroids=cents)
        build_walls.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        rows = knn_ivf_indexed(
            spark, idx, queries, k=K, n_probe=N_PROBE
        ).count()
        query_walls.append(time.perf_counter() - t0)
        # distributed JOIN path (round 5): same batch, nothing
        # collected — queries quantize distributed and cogroup against
        # the index lists (the corpus-vs-corpus shape; pays one corpus
        # exchange instead of the driver batch cap)
        t0 = time.perf_counter()
        jrows = knn_ivf_join(
            spark, idx, queries, k=K, n_probe=N_PROBE
        ).count()
        join_walls.append(time.perf_counter() - t0)
    print(json.dumps({
        "cores": cores, "n_vectors": n_vectors, "n_queries": n_queries,
        "result_rows": rows, "join_rows": jrows,
        "assign_sec": round(min(assign_walls), 2),
        "build_sec": round(min(build_walls), 2),
        "query_sec": round(min(query_walls), 2),
        "join_sec": round(min(join_walls), 2),
        "assign_vectors_per_sec": round(n_vectors / min(assign_walls), 1),
    }))


def _bigjoin(cores: int) -> None:
    """VERDICT r4 #2 done-criterion: the distributed query JOIN at a
    query side far past the serving path's driver-batch cap (>= 1M
    query rows; knn_ivf_indexed hard-fails at 100k). Reuses the index
    the scaling probes built. n_probe=1 keeps the rerank FLOPs at a
    one-box-feasible 1.6e13 while exercising exactly the 100-TB shape:
    nothing collected, queries quantize distributed, one corpus
    exchange into the cogrouped per-list BLAS rerank."""
    from pyspark.sql import functions as F

    from linkgraph.session import get_spark

    spark = get_spark(
        "ann-bigjoin-probe", master=f"local[{cores}]", shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from linkgraph.functions.similarity import knn_ivf_join

    vectors = spark.read.parquet(VECS)
    n_vectors = vectors.count()
    queries = vectors.filter(F.col("vec_id") % 16 == 0)
    n_queries = queries.count()
    t0 = time.perf_counter()
    rows = knn_ivf_join(
        spark, "/tmp/linkgraph_ivf_idx", queries, k=K, n_probe=1
    ).count()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "cores": cores, "n_vectors": n_vectors, "n_queries": n_queries,
        "result_rows": rows, "wall_sec": round(wall, 2),
        "queries_per_sec": round(n_queries / wall, 1),
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        _probe(int(sys.argv[2]))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--bigjoin":
        _bigjoin(int(sys.argv[2]))
        return
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000

    if not os.path.exists(os.path.join(VECS, "_SUCCESS")) or not os.path.exists(
        CENTS
    ):
        _generate(n_vectors)

    # per-level results cached on disk: a killed orchestration resumes
    # with only the missing parallelism levels (same-n guard)
    cache = VECS + "_results.json"
    ver = _code_version()
    results = {}
    if os.path.exists(cache):
        with open(cache) as f:
            results = {
                int(c): r
                for c, r in json.load(f).items()
                if r["n_vectors"] == n_vectors and r.get("code") == ver
            }
    for cores in (32, 8, 2):
        if cores in results:
            print(json.dumps(results[cores]), "(cached)")
            continue
        out = subprocess.run(
            [sys.executable, "tools/ann_scale_bench.py", "--probe", str(cores)],
            capture_output=True, text=True, cwd=ROOT, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cores] = json.loads(line)
        results[cores]["code"] = ver
        print(line)
        with open(cache, "w") as f:
            json.dump(results, f)

    # one-shot big-join entry at full parallelism (absolute number:
    # the >=1M-query corpus-vs-corpus shape; the scaling pair above is
    # the assign kernel) — cached like the probes: a killed
    # orchestration resumes without repaying the ~20-minute run
    bj_cache = VECS + "_bigjoin.json"
    bigjoin = None
    if os.path.exists(bj_cache):
        with open(bj_cache) as f:
            c = json.load(f)
        if c.get("n_vectors") == n_vectors and c.get("code") == ver:
            bigjoin = c
            print(json.dumps(bigjoin), "(cached)")
    if bigjoin is None:
        out = subprocess.run(
            [sys.executable, "tools/ann_scale_bench.py", "--bigjoin", "32"],
            capture_output=True, text=True, cwd=ROOT, check=True,
        )
        bigjoin = json.loads(out.stdout.strip().splitlines()[-1])
        bigjoin["code"] = ver
        with open(bj_cache, "w") as f:
            json.dump(bigjoin, f)
        print(json.dumps(bigjoin))

    a2, a8, a32 = (results[c]["assign_sec"] for c in (2, 8, 32))
    b2, b8, b32 = (results[c]["build_sec"] for c in (2, 8, 32))
    q2, q8, q32 = (results[c]["query_sec"] for c in (2, 8, 32))
    j2, j8, j32 = (results[c]["join_sec"] for c in (2, 8, 32))
    eff_2_8 = round(a2 / a8 / 4.0, 3)
    eff_8_32 = round(a8 / a32 / 4.0, 3)
    rows = {results[c]["result_rows"] for c in (2, 8, 32)} | {
        results[c]["join_rows"] for c in (2, 8, 32)
    }
    summary = {
        "metric": f"ivf index assign/build/query ({results[32]['n_vectors']:,} vectors)",
        "assign_walls": {c: results[c]["assign_sec"] for c in (2, 8, 32)},
        "build_walls": {c: results[c]["build_sec"] for c in (2, 8, 32)},
        "query_walls": {c: results[c]["query_sec"] for c in (2, 8, 32)},
        "join_walls": {c: results[c]["join_sec"] for c in (2, 8, 32)},
        "result_rows": results[32]["result_rows"],
        "rows_identical_across_levels": len(rows) == 1,
        "assign_efficiency_2_to_8": eff_2_8,
        "assign_efficiency_8_to_32": eff_8_32,
        "bigjoin_queries": bigjoin["n_queries"],
        "bigjoin_sec": bigjoin["wall_sec"],
        "bigjoin_queries_per_sec": bigjoin["queries_per_sec"],
    }
    print(json.dumps(summary))

    from md_section import replace_section

    path = os.path.join(ROOT, "BENCH", "BASELINE.md")
    old = open(path).read() if os.path.exists(path) else ""
    section = f"""{MARK}

IVF-flat over {results[32]["n_vectors"]:,} deterministic 64-dim
vectors, {N_CENTROIDS} inverted lists, the production indexed shape
(tools/ann_scale_bench.py; quantizer training is untimed one-time
prep, shared verbatim across levels): ASSIGN = the Arrow-batched
matmul quantization of the full corpus into a noop sink (the
CPU-bound scalable kernel, isolated); BUILD = assign + shuffle-by-list
+ cid-partitioned parquet write; QUERY = a
{results[32]["n_queries"]}-query batch (k={K}, {N_PROBE} probes) —
quantize driver-side, read ONLY probed list partitions (zero corpus
shuffle: queries ship in the mapInArrow closure, each Arrow batch
reranks in one BLAS matmul, partial top-k rows leave the worker).
Two in-JVM runs per phase per level, min taken:

| cores | assign (s) | assign vec/s | build (s) | query batch (s) | join batch (s) |
|---|---|---|---|---|---|
| 2 | {a2} | {results[2]["assign_vectors_per_sec"]:,} | {b2} | {q2} | {j2} |
| 8 | {a8} | {results[8]["assign_vectors_per_sec"]:,} | {b8} | {q8} | {j8} |
| 32 | {a32} | {results[32]["assign_vectors_per_sec"]:,} | {b32} | {q32} | {j32} |

North-rule pair local[2] -> local[8] on the corpus-scan-bound ASSIGN:
speedup {round(a2 / a8, 2)}x, efficiency **{eff_2_8}**; 8 -> 32:
{round(a8 / a32, 2)}x ({eff_8_32} — the one-box bandwidth ceiling the
PageRank probe documents). BUILD adds ~2 GB of shuffle + parquet
writes to this box's single ~310 MB/s virtio disk (measured with dd
oflag=direct) — a fixed I/O floor no core count removes locally and
exactly what a cluster's per-node disks parallelize; reported as
absolutes, not scaling evidence. QUERY (shuffle-free) also scales
monotonically: 2 -> 8 {round(q2 / q8, 2)}x, 8 -> 32
{round(q8 / q32, 2)}x. JOIN = the round-5 distributed query join
(knn_ivf_join: same batch, nothing collected, one corpus exchange +
cogrouped per-list rerank with hot-list splitting armed — the
corpus-vs-corpus shape): 2 -> 8 {round(j2 / j8, 2)}x, 8 -> 32
{round(j8 / j32, 2)}x. {results[32]["result_rows"]:,} result rows,
identical at every level AND between the serving and join paths
(deterministic operators — the scaling runs double as an equality
check: {summary["rows_identical_across_levels"]}).

Big-batch join (the >=1M-query corpus-vs-corpus shape the serving
path's driver cap forbids — knn_ivf_indexed fail-fasts at 100k):
{bigjoin["n_queries"]:,} query rows x n_probe=1 against the same
{bigjoin["n_vectors"]:,}-vector index at local[32] —
**{bigjoin["wall_sec"]:,}s, {bigjoin["queries_per_sec"]:,.0f}
queries/s**, {bigjoin["result_rows"]:,} result rows, zero driver
collect (queries quantize distributed; one corpus exchange into the
cogrouped BLAS rerank).
"""
    with open(path, "w") as f:
        f.write(replace_section(old, MARK, section))


if __name__ == "__main__":
    main()
