from linkgraph.operators.pagerank import pagerank  # noqa: F401
