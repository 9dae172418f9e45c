"""North-rule packaging evidence: the engine ships as a REAL
``spark-submit --py-files`` job (BASELINE.json north_rule), not just
an importable package. One smoke test zips the package, submits
``linkgraph/cli.py pagerank`` to a fresh JVM via the pyspark-bundled
spark-submit, and checks the scores parquet it writes against the
NumPy oracle — the exact deployment path a cluster user runs
(README "Verify / run")."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark

from linkgraph.graph.build import build_graph
from tests.fixtures import toy_edges_df
from tests.oracles import pagerank_oracle

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    bundled = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return bundled if os.path.exists(bundled) else shutil.which("spark-submit")


def test_spark_submit_pyfiles_pagerank(spark, tmp_path):
    g = build_graph(toy_edges_df(spark))
    edges_path = str(tmp_path / "edges")
    out_path = str(tmp_path / "pr")
    g.write.parquet(edges_path)

    zip_path = str(tmp_path / "linkgraph.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        pkg = os.path.join(ROOT, "linkgraph")
        for dirpath, _, files in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(ROOT, "linkgraph", "cli.py"),
            "pagerank",
            "--edges", edges_path,
            "--output", out_path,
            "--tol", "1e-9",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    meta = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert meta["supersteps"] > 1

    got = {r.id: r.score for r in spark.read.parquet(out_path).collect()}
    want = pagerank_oracle(
        [(r.src, r.dst, r.weight) for r in g.collect()], tol=1e-9
    )
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-6 for k in want)
