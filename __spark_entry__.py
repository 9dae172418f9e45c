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


def _q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fixpoint (converges in ~5 rounds at sf0.01; oracle unrolls 8 —
    min-propagation is monotone so extra oracle rounds are no-ops)."""
    from linkgraph.operators.components import connected_components

    return connected_components(spark, undirected_edges(spark, sf_dir), max_iter=50)


def _q_lpa_k4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.operators.lpa import label_propagation
    from linkgraph.plans.superstep import SuperstepRunner

    runner = SuperstepRunner(spark, run_id="lpa_k4", max_iter=4)
    return label_propagation(spark, undirected_edges(spark, sf_dir), runner=runner)


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
        "connected_components": _q_connected_components,
        "lpa_k4": _q_lpa_k4,
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


def _cc_sql(k: int) -> str:
    """Unrolled k-round synchronous min-label propagation (monotone:
    any k >= the true round count yields the fixpoint)."""
    parts = [
        f"WITH {EDGES_CTE},",
        "  verts AS (SELECT DISTINCT src AS id FROM edges),",
        "  c0 AS (SELECT id, id AS component FROM verts),",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""  c{i} AS (
    SELECT v.id,
           least(c.component, coalesce(min(cn.component), c.component)) AS component
    FROM verts v
    JOIN c{i - 1} c ON c.id = v.id
    LEFT JOIN edges e ON e.src = v.id
    LEFT JOIN c{i - 1} cn ON cn.id = e.dst
    GROUP BY v.id, c.component
  ),"""
        )
    body = "\n".join(parts).rstrip(",\n") + "\n"
    return body + f"SELECT id, component FROM c{k}"


def _lpa_sql(k: int) -> str:
    """Unrolled k-round synchronous LPA with the engine's exact
    selection semantics: argmax summed weight, keep current label when
    it attains the max, else lowest label."""
    parts = [
        f"WITH {EDGES_CTE},",
        "  verts AS (SELECT DISTINCT src AS id FROM edges),",
        "  l0 AS (SELECT id, id AS label FROM verts),",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""  l{i} AS (
    SELECT vid AS id, nbr_label AS label FROM (
      SELECT e.src AS vid, ln.label AS nbr_label, cur.label AS cur_label,
             sum(e.weight) AS w
      FROM edges e
      JOIN l{i - 1} ln ON ln.id = e.dst
      JOIN l{i - 1} cur ON cur.id = e.src
      WHERE e.src <> e.dst
      GROUP BY e.src, ln.label, cur.label
      QUALIFY row_number() OVER (
        PARTITION BY e.src
        ORDER BY w DESC, (nbr_label = cur_label) DESC, nbr_label ASC
      ) = 1
    )
  ),"""
        )
    body = "\n".join(parts).rstrip(",\n") + "\n"
    return body + f"SELECT id, label FROM l{k}"


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
        "connected_components": _cc_sql(8),
        "lpa_k4": _lpa_sql(4),
    }
