"""networkx shim (networkx is not installed in this sandbox).

Implements the exact slice the reference uses (helper.py, demo_pre.py,
the Detector classes), with networkx's ordering semantics preserved —
the detectors assign matrix indices from dict iteration order, so node
insertion order and edge iteration order ARE semantics:

- ``Graph(dict_of_dict_of_dict)``: first all top-level keys become nodes
  (``from_dict_of_dicts`` does ``add_nodes_from(d)``), then edges are
  added (inner keys become nodes on first sight); both endpoints share
  ONE edge-attribute dict;
- ``G.edges()`` iterates nodes in insertion order, for each node its
  neighbors in adjacency insertion order, yielding each edge once from
  the side of the earlier node (EdgeView ``seen`` logic);
- ``set_node_attributes``/``set_edge_attributes`` skip keys that are not
  in the graph (networkx swallows the KeyError);
- ``get_node_attributes``/``get_edge_attributes`` return dicts in node /
  edges() iteration order, skipping items without the attribute.
"""

from __future__ import annotations


class _NodesView:
    def __init__(self, g: "Graph"):
        self._g = g

    def __iter__(self):
        return iter(self._g._node)

    def __len__(self):
        return len(self._g._node)

    def __contains__(self, n):
        return n in self._g._node

    def __getitem__(self, n):
        return self._g._node[n]

    def get(self, n, default=None):
        return self._g._node.get(n, default)

    def __call__(self, data=False):
        if data:
            return list(self._g._node.items())
        return list(self._g._node)


class _EdgesView:
    def __init__(self, g: "Graph"):
        self._g = g

    def __iter__(self):
        seen = set()
        for n, nbrs in self._g._adj.items():
            for nbr in nbrs:
                if nbr not in seen:
                    yield (n, nbr)
            seen.add(n)

    def __len__(self):
        return sum(1 for _ in self)

    def __call__(self, data=False):
        if data:
            return [(u, v, self._g._adj[u][v]) for u, v in self]
        return list(self)

    def get(self, key, default=None):
        u, v = key
        try:
            return self._g._adj[u][v]
        except KeyError:
            return default

    def __getitem__(self, key):
        u, v = key
        return self._g._adj[u][v]

    def __contains__(self, key):
        u, v = key
        return u in self._g._adj and v in self._g._adj[u]


class Graph:
    def __init__(self, incoming_graph_data=None):
        self._node: dict = {}
        self._adj: dict = {}
        if incoming_graph_data is not None:
            d = incoming_graph_data
            # from_dict_of_dicts: nodes from the keys first, then edges
            for n in d:
                self.add_node(n)
            for u, nbrs in d.items():
                for v, attrs in nbrs.items():
                    self.add_edge(u, v, **(attrs or {}))

    # --------------------------------------------------------- mutation
    def add_node(self, n, **attr):
        if n not in self._node:
            self._node[n] = {}
            self._adj[n] = {}
        self._node[n].update(attr)

    def add_edge(self, u, v, **attr):
        self.add_node(u)
        self.add_node(v)
        datadict = self._adj[u].get(v, {})
        datadict.update(attr)
        self._adj[u][v] = datadict
        self._adj[v][u] = datadict  # shared dict, undirected

    # ---------------------------------------------------------- queries
    def __getitem__(self, n):
        return self._adj[n]

    def __contains__(self, n):
        return n in self._node

    def __iter__(self):
        return iter(self._node)

    def __len__(self):
        return len(self._node)

    @property
    def nodes(self):
        return _NodesView(self)

    @property
    def edges(self):
        return _EdgesView(self)

    def number_of_nodes(self):
        return len(self._node)

    def degree(self, n=None):
        if n is not None:
            return len(self._adj[n])
        return [(k, len(v)) for k, v in self._adj.items()]

    def neighbors(self, n):
        return iter(self._adj[n])


# ------------------------------------------------------- module functions

def set_node_attributes(g: Graph, values: dict, name=None):
    if name is not None:
        for n, v in values.items():
            if n in g._node:
                g._node[n][name] = v
        return
    for n, d in values.items():
        if n in g._node:
            g._node[n].update(d)


def set_edge_attributes(g: Graph, values: dict, name=None):
    if name is not None:
        for (u, v), val in values.items():
            if u in g._adj and v in g._adj[u]:
                g._adj[u][v][name] = val
        return
    for (u, v), d in values.items():
        if u in g._adj and v in g._adj[u]:
            g._adj[u][v].update(d)


def get_node_attributes(g: Graph, name: str) -> dict:
    return {n: d[name] for n, d in g._node.items() if name in d}


def get_edge_attributes(g: Graph, name: str) -> dict:
    out = {}
    for u, v in g.edges:
        d = g._adj[u][v]
        if name in d:
            out[(u, v)] = d[name]
    return out


def to_dict_of_dicts(g: Graph) -> dict:
    return {u: {v: dict(d) for v, d in nbrs.items()} for u, nbrs in g._adj.items()}


# isinstance target used by helper.add_attribute_to_graph
class _ClassesGraphModule:
    Graph = Graph


class _ClassesModule:
    graph = _ClassesGraphModule


classes = _ClassesModule


# readwrite.json_graph lives in a real subpackage so helper.py's
# ``from networkx.readwrite import json_graph`` import works
from . import readwrite  # noqa: E402, F401
