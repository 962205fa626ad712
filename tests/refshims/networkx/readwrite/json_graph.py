"""node-link JSON round-trip (helper.py save_graph/load_graph)."""

from .. import Graph


def node_link_data(g: Graph) -> dict:
    return {
        "directed": False,
        "multigraph": False,
        "graph": {},
        "nodes": [{"id": n, **d} for n, d in g._node.items()],
        "links": [{"source": u, "target": v, **g._adj[u][v]} for u, v in g.edges],
    }


def node_link_graph(data: dict) -> Graph:
    g = Graph()
    for nd in data["nodes"]:
        nd = dict(nd)
        g.add_node(nd.pop("id"), **nd)
    for ld in data["links"]:
        ld = dict(ld)
        u, v = ld.pop("source"), ld.pop("target")
        g.add_edge(u, v, **ld)
    return g
