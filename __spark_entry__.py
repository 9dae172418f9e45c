"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The link graph used by the graph queries is derived deterministically
from the driver's own parquet tables (orders/customer) so each graph
operator has an exact ANSI-SQL oracle — see
linkgraph/sources/testdata.py for the canonical derivation; the SQL
CTE string there mirrors it verbatim.

Iterative queries are exposed in fixed-superstep form (pagerank_k8,
cc_k12, ...) so the oracle is a finite unrolled SQL pipeline; the
convergence-mode variants (tol=1e-6 fixpoints) are validated against
NumPy oracles in tests/ (see tests/oracles.py), per SURVEY.md §5.2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.sources.testdata import EDGES_CTE, undirected_edges

DAMPING = 0.85


# --------------------------------------------------------------------
# Spark queries
# --------------------------------------------------------------------

def _q_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return undirected_edges(spark, sf_dir)


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.graph.build import degrees

    return degrees(undirected_edges(spark, sf_dir)).select("id", "deg", "wdeg")


def _q_pagerank_k8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.operators.pagerank import pagerank

    edges = undirected_edges(spark, sf_dir)
    scores = pagerank(spark, edges, damping=DAMPING, tol=0.0, max_iter=8)
    return scores.select("id", F.round("score", 7).alias("score"))


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.operators.triangles import triangle_count

    return triangle_count(spark, undirected_edges(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: PageRank to 1e-6 convergence on the sf0.001
    link graph (BASELINE.json primary metric's query)."""
    from linkgraph.operators.pagerank import pagerank

    edges = undirected_edges(spark, "/root/testdata/sf0.001")
    return pagerank(spark, edges, tol=1e-6, max_iter=100)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_edges": _q_graph_edges,
        "degrees": _q_degrees,
        "pagerank_k8": _q_pagerank_k8,
        "triangle_count": _q_triangle_count,
    }


# --------------------------------------------------------------------
# DuckDB oracles
# --------------------------------------------------------------------

def _pagerank_sql(k: int) -> str:
    """Unrolled k-superstep PageRank over the symmetric edge table
    (no dangling vertices by construction)."""
    parts = [
        f"WITH {EDGES_CTE},",
        "  verts AS (SELECT DISTINCT src AS id FROM edges),",
        "  nn AS (SELECT count(*) AS n FROM verts),",
        "  outw AS (SELECT src AS id, sum(weight) AS ow FROM edges GROUP BY src),",
        "  s0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS score FROM verts),",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""  s{i} AS (
    SELECT v.id,
           (1.0 - {DAMPING}) / (SELECT n FROM nn)
           + {DAMPING} * COALESCE(sum(s.score * e.weight / o.ow), 0.0) AS score
    FROM verts v
    LEFT JOIN edges e ON e.dst = v.id
    LEFT JOIN s{i - 1} s ON s.id = e.src
    LEFT JOIN outw o ON o.id = e.src
    GROUP BY v.id
  ),"""
        )
    body = "\n".join(parts).rstrip(",\n") + "\n"
    return body + f"SELECT id, ROUND(score, 7) AS score FROM s{k}"


def oracle_sql() -> dict[str, str]:
    return {
        "graph_edges": f"WITH {EDGES_CTE} SELECT src, dst, weight FROM edges",
        "degrees": f"""WITH {EDGES_CTE}
            SELECT src AS id, count(*) AS deg, CAST(sum(weight) AS DOUBLE) AS wdeg
            FROM edges GROUP BY src""",
        "pagerank_k8": _pagerank_sql(8),
        "triangle_count": f"""WITH {EDGES_CTE},
            canon AS (
              SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
              FROM edges WHERE src <> dst
            )
            SELECT count(*) AS n_triangles
            FROM canon e1
            JOIN canon e2 ON e1.dst = e2.src
            JOIN canon e3 ON e1.src = e3.src AND e2.dst = e3.dst""",
    }
