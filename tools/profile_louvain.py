"""Profile louvain at a given sf dir: wraps the internals with timers
to attribute wall time to round tables / Q scalar / moves / contraction
/ dense ids / barriers. Usage:
  python tools/profile_louvain.py [sf_dir] [cpus]
"""

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkgraph.session import get_spark  # noqa: E402

acc = defaultdict(float)
cnt = defaultdict(int)


def wrap(mod, name, label=None):
    fn = getattr(mod, name)
    lab = label or name

    def inner(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        acc[lab] += time.perf_counter() - t0
        cnt[lab] += 1
        return out

    setattr(mod, name, inner)
    return fn


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    spark = get_spark("profile-louvain", master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    import linkgraph.operators.louvain as L
    import linkgraph.plans.superstep as S
    import linkgraph.plans.ranks as R

    wrap(L, "_round_tables")
    wrap(L, "_q_from_aggregates")
    wrap(L, "_apply_moves")
    wrap(L, "_dense_communities")
    wrap(L, "_one_level")
    wrap(R, "dense_ids")
    # barrier is imported by name into louvain's namespace
    orig_barrier = L.barrier

    def timed_barrier(*a, **kw):
        t0 = time.perf_counter()
        out = orig_barrier(*a, **kw)
        acc["barrier"] += time.perf_counter() - t0
        cnt["barrier"] += 1
        return out

    L.barrier = timed_barrier
    S.barrier = timed_barrier

    from linkgraph.sources.testdata import undirected_edges

    edges = undirected_edges(spark, sf_dir).persist()
    ne = edges.count()
    t0 = time.perf_counter()
    res = L.louvain(spark, edges)
    res.assignment.count()
    total = time.perf_counter() - t0
    print(f"edges={ne} levels={res.levels} Q={res.modularity:.6f} total={total:.2f}s")
    rounds_per_level = defaultdict(int)
    for m in res.metrics:
        if "round" in m:
            rounds_per_level[m["level"]] += 1
    print("rounds/level:", dict(rounds_per_level))
    inner_sum = 0.0
    for k in sorted(acc, key=lambda k: -acc[k]):
        print(f"  {k:24s} {acc[k]:8.2f}s  x{cnt[k]}")
        if k not in ("_one_level",):
            inner_sum += acc[k]
    print(f"  (sum w/o _one_level)    {inner_sum:8.2f}s; unattributed ~ {total - inner_sum:.2f}s")


if __name__ == "__main__":
    main()
