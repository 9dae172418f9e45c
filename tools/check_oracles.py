"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
sf dir, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from linkgraph.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"columns spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col].to_numpy(), b[col].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                ok = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
                if not ok:
                    bad = np.where(av.astype(float) != bv.astype(float))[0][:3]
                    problems.append(f"col {col} value mismatch at rows {bad.tolist()}: "
                                    f"{av[bad].tolist()} vs {bv[bad].tolist()}")
            else:
                if not (av == bv).all():
                    bad = np.where(av != bv)[0][:3]
                    problems.append(f"col {col} mismatch at rows {bad.tolist()}: "
                                    f"{av[bad].tolist()} vs {bv[bad].tolist()}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.perf_counter()
        spark_pdf = fn(spark, sf_dir).toPandas()
        t1 = time.perf_counter()
        if name not in oracles:
            print(f"  ~ {name}: rows={len(spark_pdf)} (no oracle, rows-only) [{t1-t0:.1f}s]")
            continue
        duck_pdf = con.execute(oracles[name]).df()
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"  ✗ {name}: " + "; ".join(problems))
        else:
            print(f"  ✓ {name}: rows={len(spark_pdf)} match [{t1-t0:.1f}s]")
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
