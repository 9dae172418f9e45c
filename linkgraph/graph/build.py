"""Graph construction: the ingest chain of the reference, Spark-first.

Reference semantics reproduced here (see SURVEY.md §2.A):

* symmetrize  — every non-self-loop edge stored in both directions
  (reference: ``src/graph.cpp:78-81``);
* clean_edges — merge multi-edges, weighted => sum weights
  (reference ``Graph::clean``, ``src/graph.cpp:132-162``);
* url_dictionary / renumber — dense ids for string keys
  (reference ``Graph::renumber``, ``src/graph.cpp:93-130``);
* degrees     — weighted + plain degree per vertex
  (reference ``Graph::weighted_degree``, ``src/graph_binary.h:149-164``);
* write_adjacency — src-bucketed, src-sorted Parquet layout: the
  Spark equivalent of the reference's binary CSR
  (``src/graph.cpp:178-220`` / ``src/graph_binary.h:81-88``). Each
  partition's Arrow batch of a src-sorted edge block *is* a CSR block.

Scale notes: ids are LongType (the reference's int32 is a scale limit
we must not copy — 10^12-doc graphs overflow int32). Every op here is
a single shuffle expressible as groupBy/join so Catalyst handles
pushdown and AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "weight")


def _as_edges(df: DataFrame) -> DataFrame:
    """Normalize to (src:long, dst:long, weight:double); weight defaults 1.0."""
    cols = [F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")]
    if "weight" in df.columns:
        cols.append(F.col("weight").cast("double").alias("weight"))
    else:
        cols.append(F.lit(1.0).alias("weight"))
    return df.select(*cols)


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected representation: both (src,dst) and (dst,src) rows.

    Self-loops are kept once (reference stores them once:
    ``src/graph.cpp:78-81`` skips the reverse insert when src==dst).
    """
    e = _as_edges(edges)
    rev = e.filter(F.col("src") != F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return e.unionByName(rev)


def clean_edges(edges: DataFrame, weighted: bool = True) -> DataFrame:
    """Merge duplicate (src,dst) rows (reference ``Graph::clean``).

    weighted => sum weights; unweighted => collapse to weight 1.0
    (the reference keeps the first weight, which is 1.0 for unweighted
    graphs — identical result, deterministic here).
    """
    e = _as_edges(edges)
    agg = F.sum("weight") if weighted else F.lit(1.0)
    return e.groupBy("src", "dst").agg(agg.alias("weight"))


def canonicalize(edges: DataFrame) -> DataFrame:
    """One row per undirected edge with src <= dst (for triangle counting)."""
    e = _as_edges(edges)
    return (
        e.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.max("weight").alias("weight"))
    )


def vertices(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing as either endpoint."""
    e = _as_edges(edges)
    return (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-vertex (out-)degree and weighted degree over the given table.

    On a symmetrized table this is the undirected degree (reference
    ``nb_neighbors``/``weighted_degree``, ``src/graph_binary.h:149-164``).
    Self-loop weight (reference ``nb_selfloops``) is included as its own
    column so quality functions can subtract/add it without a second scan.
    """
    e = _as_edges(edges)
    return e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"),
        F.sum("weight").alias("wdeg"),
        F.sum(F.when(F.col("src") == F.col("dst"), F.col("weight")).otherwise(0.0)).alias(
            "self_w"
        ),
    )


def url_dictionary(urls: DataFrame, col: str = "url") -> DataFrame:
    """Dense id dictionary for string vertex keys (reference renumber,
    ``src/graph.cpp:93-130``; mapping sink ``:100-116``).

    Deterministic: ids are the 0-based rank of the sorted distinct
    key — reproducible across runs/cluster sizes, unlike
    ``monotonically_increasing_id``. Computed with the distributed
    range-partition + per-partition-offset scheme
    (``plans/ranks.py:dense_ids``) — NO single-partition sort, so the
    dictionary build parallelizes across the cluster at 10^12 urls.
    """
    from linkgraph.plans.ranks import dense_ids

    mapping, _ = dense_ids(urls, col, out_col="id")
    return mapping


def renumber(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Remap both endpoints through an (old -> id) dictionary: two joins.

    ``mapping`` must have columns (old, id). Isolated nodes drop out
    naturally (inner join) — matching the reference's renumber, which
    skips nodes with no links (``src/graph.cpp:103-107``).
    """
    m_src = mapping.select(F.col("old").alias("src"), F.col("id").alias("new_src"))
    m_dst = mapping.select(F.col("old").alias("dst"), F.col("id").alias("new_dst"))
    return (
        edges.join(m_src, "src")
        .join(m_dst, "dst")
        .select(
            F.col("new_src").alias("src"),
            F.col("new_dst").alias("dst"),
            F.col("weight"),
        )
    )


HOST_RE = r"^(?:[a-z][a-z0-9+.-]*://)?([^/?#]+)"


def host_of(col: Column) -> Column:
    """Lower-cased authority (host[:port]) of a url column — scheme
    optional, path/query/fragment stripped. Pure Column expression
    (whole-stage codegen); the regex is RE2-safe so the same pattern
    runs verbatim in DuckDB/Trino oracles."""
    return F.lower(F.regexp_extract(col, HOST_RE, 1))


def host_graph(
    url_edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Web-graph host rollup: page-level (src url, dst url[, weight])
    edges aggregated to the host-level graph — the standard coarsening
    for 10^12-page webgraphs (host graphs are ~3 orders smaller, and
    most link-spam / site-structure analyses run there). Intra-host
    links survive as self-loops. One hash aggregation: at 100 TB this
    is a single shuffle on (src_host, dst_host) with map-side combine
    collapsing the (huge) per-page fan-in before the exchange."""
    w = (
        F.coalesce(F.col("weight"), F.lit(1.0)).cast("double")
        if "weight" in url_edges.columns
        else F.lit(1.0)
    )
    e = url_edges.select(
        host_of(F.col(src_col)).alias("src_host"),
        host_of(F.col(dst_col)).alias("dst_host"),
        w.alias("weight"),
    )
    return e.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links"), F.sum("weight").alias("weight")
    )


def write_adjacency(edges: DataFrame, path: str, num_buckets: int = 32) -> None:
    """Persist CSR-style adjacency blocks: hash-partitioned by src,
    sorted by (src,dst) within each file.

    The reference's binary CSR (``src/graph.cpp:178-220``) becomes
    src-bucketed Parquet: "neighbors of v" is a partition-local range
    scan, and a later join keyed on src reads co-located blocks.
    Degree offsets are recomputed per Arrow batch on read (np.cumsum —
    SURVEY.md §4 X4).
    """
    (
        _as_edges(edges)
        .repartition(num_buckets, "src")
        .sortWithinPartitions("src", "dst")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_adjacency_table(
    edges: DataFrame, table: str, path: str, num_buckets: int = 32
) -> None:
    """K1 bucketed-layout sink with CATALOG-KNOWN bucketing: same
    physical layout as ``write_adjacency`` (src-hashed files, sorted
    within), but registered via ``bucketBy``, so every later read
    exposes HashPartitioning(src) to the planner — src-keyed
    groupBy/joins over the table plan with NO initial exchange (the
    per-operator one-time repartition disappears; plan-audited).

    The session catalog here is in-memory, so the bucketing spec lives
    for the session; at scale the same call against a real metastore /
    Iceberg catalog makes the layout durable. One file per bucket via
    the pre-repartition (avoids the many-small-files-per-bucket trap).
    """
    (
        _as_edges(edges)
        .repartition(num_buckets, "src")
        .write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, "src")
        .sortBy("src", "dst")
        .saveAsTable(table)
    )


def read_adjacency_table(spark, table: str) -> DataFrame:
    """Read the K1 bucketed layout with its bucketing spec attached
    (``spark.table``, not ``read.parquet`` — a plain parquet read of
    the same files loses the partitioning metadata)."""
    return spark.table(table)


def build_graph(raw_edges: DataFrame, weighted: bool = True) -> DataFrame:
    """Full ingest chain: symmetrize -> clean. Returns the canonical
    undirected weighted edge table used by all community queries."""
    return clean_edges(symmetrize(raw_edges), weighted=weighted)
