"""Loader for the ACTUAL reference implementations at /root/reference.

The reference is pure Python (numpy + scipy/networkx/sklearn); the
latter three are absent from this sandbox, so minimal numpy-backed shims
(tests/refshims/) are put on sys.path before importing. The detectors
then run verbatim — control flow, tie-breaks and bugs included — which
is what the parity tests compare against (VERDICT r01 item 1).

Also provides the YelpChi-shaped graph builder: the reference's
detectors overload the id namespace (products '0'..'P-1', users
'P'..'P+U-1' as consecutive ints — GANG.py:100-112, ZooBP.py:52), so the
engine's (src, dst, sign) edges are relabeled through the SORTED dense
rank on each side; priors/labels are the engine's deterministic hash
priors keyed by the ORIGINAL ids, so both systems score the same graph.
"""

from __future__ import annotations

import os
import sys

SHIM_DIR = os.path.join(os.path.dirname(__file__), "refshims")
REF_DIR = "/root/reference"


def load_reference():
    """Import and return the reference package modules (shimmed)."""
    for p in (REF_DIR, SHIM_DIR):
        if p not in sys.path:
            sys.path.insert(0, p)
    import UGFraud.Utils.helper as helper  # noqa: F401
    from UGFraud.Detector import GANG, SVD, Fraudar, SpEagle, ZooBP, fBox

    return {
        "helper": helper,
        "GANG": GANG,
        "ZooBP": ZooBP,
        "SpEagle": SpEagle,
        "Fraudar": Fraudar,
        "fBox": fBox,
        "SVD": SVD,
    }


PRIOR_MULT = 2654435761
PRIOR_MOD = 1_000_003


def hash_prior(orig_id: int) -> float:
    return ((orig_id * PRIOR_MULT) % PRIOR_MOD) / float(PRIOR_MOD)


def edge_prior(src: int, dst: int) -> float:
    return ((src * 131 + dst) * PRIOR_MULT) % PRIOR_MOD / float(PRIOR_MOD)


def build_reference_graph(edges: list[tuple[int, int, int]],
                          prods_first: bool = False):
    """edges = [(src_orig, dst_orig, sign)] (deduped bipartite) →
    (graph, maps) where graph is the demo_pre-shaped attributed graph over
    YelpChi-layout string ids and maps hold orig_id ↔ reference-id both
    ways. Users and products enter in sorted-original-id order, so the
    reference's insertion-order index assignment equals the engine's
    sorted dense rank.

    ``prods_first``: insert the product nodes (sorted) BEFORE the users.
    GANG needs this — it builds its belief vector in node INSERTION order
    (``GANG.py:73-76`` iterate the prior dicts) but indexes its adjacency
    matrix by ``int(node_id)`` (``GANG.py:106-112``) and reads results
    back positionally (``GANG.py:150-155``); the two agree only when
    insertion order equals the consecutive-id order. On YelpChi itself
    products enter in first-REVIEW order, so the reference silently binds
    wrong priors to wrong products — a reference bug we align away rather
    than replicate. fBox conversely requires USERS first (its edge
    iteration takes k[0] as the user, ``fBox.py:32-45``), so the default
    stays users-first."""
    load_reference()
    import networkx as nx  # the shim

    users = sorted({e[0] for e in edges})
    prods = sorted({e[1] for e in edges})
    n_p = len(prods)
    u_map = {u: str(n_p + i) for i, u in enumerate(users)}
    p_map = {p: str(i) for i, p in enumerate(prods)}

    by_user: dict[int, list[tuple[int, int]]] = {u: [] for u in users}
    for s, d, sg in edges:
        by_user[s].append((d, sg))

    graph_dict: dict = {}
    if prods_first:
        for p in prods:  # empty adjacency rows: node insertion only
            graph_dict[p_map[p]] = {}
    for u in users:  # sorted user order = node insertion order
        graph_dict[u_map[u]] = {}
        for d, sg in sorted(by_user[u]):  # sorted product order per user
            # demo_pre.py:47-61 edge attrs; 'label' follows its mapping
            # (spam → 0), unused by the score-parity tests
            graph_dict[u_map[u]][p_map[d]] = {
                "rating": int(sg),
                "label": 0 if sg == 2 else 1,
                "date": "2020-01-01",
            }

    g = nx.Graph(graph_dict)

    node_attr = {}
    for u in users:
        spam = 1 if any(sg == 2 for _d, sg in by_user[u]) else 0
        node_attr[u_map[u]] = {
            "prior": hash_prior(u), "types": "user", "label": spam,
        }
    for p in prods:
        node_attr[p_map[p]] = {"prior": hash_prior(p), "types": "prod"}
    nx.set_node_attributes(g, node_attr)

    edge_attr = {}
    for s, d, _sg in edges:
        edge_attr[(u_map[s], p_map[d])] = {
            "prior": edge_prior(s, d), "types": "review",
        }
    nx.set_edge_attributes(g, edge_attr)

    maps = {
        "u_map": u_map,
        "p_map": p_map,
        "u_inv": {v: k for k, v in u_map.items()},
        "p_inv": {v: k for k, v in p_map.items()},
        "n_prods": n_p,
    }
    return g, maps


def engine_edges_sf(sf_dir: str) -> list[tuple[int, int, int]]:
    """The engine's bipartite_edges derivation (tables.py) in DuckDB —
    same rows the Spark queries consume, no Spark session needed."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT l_orderkey AS src, l_partkey + 1000000000 AS dst, "
        f"MIN(CASE WHEN l_quantity >= 25 THEN 1 ELSE 2 END) AS sign "
        f"FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    con.close()
    return [(int(r[0]), int(r[1]), int(r[2])) for r in rows]
