from linkgraph.graph.build import (  # noqa: F401
    canonicalize,
    clean_edges,
    degrees,
    symmetrize,
    url_dictionary,
    vertices,
    write_adjacency,
)
