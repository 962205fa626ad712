from .tables import (  # noqa: F401
    PART_OFFSET,
    UNI_MOD,
    bipartite_edges,
    load,
    uni_edges_directed,
    uni_edges_undirected,
    vertex_priors,
    vertices_of,
)
