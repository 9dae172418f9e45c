"""linkgraph — a PySpark-native link-graph analytics engine.

Brand-new engine (NOT a port) with the query capabilities of the
reference `ManulGoyal/dynamic-community-detection-gpu`:

* static queries: PageRank, connected components, label-propagation
  community detection, triangle counting, multi-level (Louvain)
  modularity optimization with pluggable quality functions;
* the reference's specialty: incremental edge-batch updates with
  delta-screening (only re-evaluate the affected frontier);
* training-data-pipeline operators over a documents table:
  deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  similarity search over embeddings, language id, quality scoring,
  token counting, fingerprinting.

Everything is DataFrame-first: logical plans are declared with the
pyspark.sql API so Catalyst/AQE handle pushdown, pruning, join
strategy and skew; Python only appears as Arrow-vectorized pandas
UDFs (HTML extraction, hashing kernels) — never per-row.
"""

__version__ = "0.1.0"
