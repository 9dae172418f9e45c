"""Round-6 profiling: per-phase breakdown of the heavy bench entries
(louvain rounds, incremental phases, corpus stages, CC/LPA supersteps).
Run: python tools/profile_r06.py [louvain|incremental|corpus|iter|all]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("profile-r06", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    import tempfile

    from linkgraph.graph.build import read_adjacency_table, write_adjacency_table
    from linkgraph.sources.testdata import undirected_edges

    spark.sql("DROP TABLE IF EXISTS bench_adjacency")
    write_adjacency_table(
        undirected_edges(spark, SF_DIR),
        "bench_adjacency",
        os.path.join(tempfile.mkdtemp(prefix="prof_adj_"), "adjacency"),
        num_buckets=CPUS,
    )
    edges = read_adjacency_table(spark, "bench_adjacency").persist()
    n_edges = edges.count()
    from pyspark.sql import functions as F

    n_verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    print(f"== graph: {n_edges} edge rows, {n_verts} vertices")

    if which in ("louvain", "all"):
        from linkgraph.operators.louvain import louvain

        t0 = time.perf_counter()
        res = louvain(spark, edges, pre_partitioned=True)
        res.assignment.count()
        t1 = time.perf_counter()
        print(f"== louvain total {t1-t0:.2f}s levels={res.levels} q={res.modularity:.6f}")
        for m in res.metrics:
            print("   round", m)

    if which in ("incremental", "all"):
        from linkgraph.operators.louvain import louvain
        from linkgraph.streaming.incremental import run_incremental

        # rebuild the bench's delta fixture
        res = louvain(spark, edges, pre_partitioned=True)
        assign = res.assignment.persist()
        assign.count()
        canon = edges.filter(F.col("src") < F.col("dst"))
        a_s = assign.select(F.col("id").alias("src"), F.col("community").alias("cs"))
        a_d = assign.select(F.col("id").alias("dst"), F.col("community").alias("cd"))
        intra = (
            canon.join(a_s, "src").join(a_d, "dst")
            .filter(F.col("cs") == F.col("cd"))
            .select("src", "dst", "weight", F.col("cs").alias("community"))
            .persist()
        )
        sizes = assign.groupBy("community").count()
        target = (
            intra.groupBy("community").agg(F.count(F.lit(1)).alias("ec"))
            .filter(F.col("ec") >= 5)
            .join(sizes, "community")
            .orderBy("count", "community")
            .first()
        )
        sel = (
            intra.filter(F.col("community") == target["community"])
            .orderBy("src", "dst")
            .limit(20)
            .select("src", "dst", "weight")
            .persist()
        )
        sel.count()
        dels = sel.select(
            F.lit(0).alias("ts"), F.lit("del").alias("op"), "src", "dst", "weight"
        )
        adds = sel.select(
            F.lit(1).alias("ts"), F.lit("add").alias("op"), "src", "dst", "weight"
        )
        deltas = dels.unionByName(adds).persist()
        deltas.count()

        import linkgraph.streaming.incremental as inc

        t0 = time.perf_counter()
        run = run_incremental(spark, edges, deltas, pre_partitioned=True)
        run.state.count()
        t1 = time.perf_counter()
        print(f"== incremental total {t1-t0:.2f}s")
        for m in run.metrics:
            print("   phase", m)

    if which in ("corpus", "all"):
        from linkgraph.functions.corpus import clean_corpus
        from linkgraph.functions.dedup import exact_dedup, minhash_verified_pairs
        from linkgraph.functions.text import language_id, quality_features

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()
        print("== corpus docs:", docs.count())
        t0 = time.perf_counter()
        q = quality_features(docs, "text").select("doc_id", "quality_score")
        l = language_id(docs, "text")
        kept = (
            docs.select("doc_id", "text")
            .join(q, "doc_id")
            .join(l, "doc_id")
            .filter((F.col("quality_score") >= 0.5) & (F.col("pred_lang") == "en"))
        )
        kept.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        print(f"   quality+lang filter: {t1-t0:.2f}s")
        canon = exact_dedup(kept, "text")
        kept2 = kept.join(
            canon.filter(F.col("doc_id") == F.col("canonical_id")).select("doc_id"),
            "doc_id",
        )
        kept2.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(f"   exact dedup: {t2-t1:.2f}s")
        pairs = minhash_verified_pairs(
            kept2, "text", num_hashes=64, bands=32, threshold=0.6,
            shingle_hash="xxhash64",
        )
        pairs.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        print(f"   minhash_verified_pairs: {t3-t2:.2f}s")
        t4 = time.perf_counter()
        n = clean_corpus(docs).count()
        t5 = time.perf_counter()
        print(f"   clean_corpus end-to-end: {t5-t4:.2f}s survivors={n}")

    if which in ("iter", "all"):
        from linkgraph.operators.components import connected_components
        from linkgraph.operators.lpa import label_propagation
        from linkgraph.operators.pagerank import pagerank
        from linkgraph.plans.superstep import SuperstepRunner

        r = SuperstepRunner(spark, run_id="prof-pr", max_iter=100)
        t0 = time.perf_counter()
        pagerank(spark, edges, tol=1e-6, runner=r, pre_partitioned=True).count()
        t1 = time.perf_counter()
        print(f"== pagerank {t1-t0:.2f}s supersteps={len(r.metrics)}")
        for m in r.metrics:
            print(f"   ss{m['superstep']}: {m['seconds']:.3f}s delta={m['delta']:.2e}")

        r = SuperstepRunner(spark, run_id="prof-cc", max_iter=100)
        t0 = time.perf_counter()
        connected_components(spark, edges, runner=r, pre_partitioned=True).count()
        t1 = time.perf_counter()
        print(f"== cc {t1-t0:.2f}s supersteps={len(r.metrics)}")
        for m in r.metrics:
            print(f"   ss{m['superstep']}: {m['seconds']:.3f}s delta={m['delta']}")

        r = SuperstepRunner(spark, run_id="prof-lpa", max_iter=4)
        t0 = time.perf_counter()
        label_propagation(spark, edges, runner=r, pre_partitioned=True).count()
        t1 = time.perf_counter()
        print(f"== lpa {t1-t0:.2f}s supersteps={len(r.metrics)}")
        for m in r.metrics:
            print(f"   ss{m['superstep']}: {m['seconds']:.3f}s delta={m['delta']}")


if __name__ == "__main__":
    main()
