"""Round-6 louvain internals profiler: wraps the internal phases with
wall timers (monkeypatch, measurement-only) to find where the 16s goes.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def wrap(mod, name, label=None):
    fn = getattr(mod, name)
    lbl = label or name

    def timed(*a, **kw):
        t0 = time.perf_counter()
        r = fn(*a, **kw)
        print(f"   [{lbl}] {time.perf_counter()-t0:.2f}s", flush=True)
        return r

    setattr(mod, name, timed)
    return fn


def main() -> None:
    spark = get_spark("prof-lou-r06", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
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
    edges.count()

    import linkgraph.graph.hierarchy as hier
    import linkgraph.operators.louvain as lou
    import linkgraph.operators.louvain_local as loul

    wrap(lou, "_one_level")
    wrap(lou, "_dense_communities")
    wrap(lou, "_round_tables")
    wrap(lou, "_apply_moves")
    wrap(hier, "contract_graph")
    wrap(loul, "run_local_levels")

    t0 = time.perf_counter()
    res = lou.louvain(spark, edges, pre_partitioned=True)
    t_build = time.perf_counter() - t0
    res.assignment.count()
    t_total = time.perf_counter() - t0
    print(f"== louvain build {t_build:.2f}s, +assignment.count {t_total:.2f}s, levels={res.levels}")


if __name__ == "__main__":
    main()
