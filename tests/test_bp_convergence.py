"""Convergence-mode parity for the linearized BP kernels (north rule:
per-vertex scores allclose 1e-6 at convergence): run the Spark kernels
with a tolerance to their fixpoint and compare against an independent
numpy implementation of the same recurrences
(GANG ``pu_lbp``, ``GANG.py:115-137``; ZooBP closed-form,
``ZooBP.py:76-154``)."""

from __future__ import annotations

import numpy as np
import pytest

from ugfraud_spark.operators import gang, zoobp
from ugfraud_spark.sources import tables


@pytest.fixture(scope="module")
def bip(spark, sf_small):
    e = tables.bipartite_edges(spark, sf_small)
    rows = e.select("src", "dst", "sign").collect()
    pri = {
        r["id"]: r["prior"]
        for r in tables.vertex_priors(tables.vertices_of(e)).collect()
    }
    return e, rows, pri


def test_gang_convergence_matches_numpy(spark, bip):
    e, rows, pri = bip
    ids = sorted(pri)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    p = np.array([pri[v] - 0.5 for v in ids])
    src = np.array([idx[r["src"]] for r in rows])
    dst = np.array([idx[r["dst"]] for r in rows])

    w2 = 2 * 0.008
    b = p.copy()
    for _ in range(2000):
        m = np.zeros(n)
        np.add.at(m, dst, b[src])
        np.add.at(m, src, b[dst])
        nb = p + w2 * m
        if np.abs(nb - b).sum() < 1e-10:
            b = nb
            break
        b = nb

    pr_df = tables.vertex_priors(tables.vertices_of(e))
    res = gang.gang(e, pr_df, max_iter=2000, tol=1e-10)
    assert res.converged
    got = {r["id"]: r["belief"] for r in res.state.collect()}
    gv = np.array([got[v] for v in ids])
    assert np.allclose(gv, b, atol=1e-6)


def test_zoobp_convergence_matches_numpy(spark, bip):
    e, rows, pri = bip
    ids = sorted(pri)
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    p = np.array([pri[v] - 0.5 for v in ids])
    src = np.array([idx[r["src"]] for r in rows])
    dst = np.array([idx[r["dst"]] for r in rows])
    s = np.array([1.0 if r["sign"] == 1 else -1.0 for r in rows])

    h = 0.01 / 2
    b = p.copy()
    for _ in range(2000):
        m = np.zeros(n)
        np.add.at(m, dst, s * b[src])
        np.add.at(m, src, s * b[dst])
        nb = p + h * m
        if np.abs(nb - b).sum() < 1e-10:
            b = nb
            break
        b = nb

    pr_df = tables.vertex_priors(tables.vertices_of(e))
    res = zoobp.zoobp(e, pr_df, max_iter=2000, tol=1e-10)
    assert res.converged
    got = {r["id"]: r["belief"] for r in res.state.collect()}
    gv = np.array([got[v] for v in ids])
    assert np.allclose(gv, b, atol=1e-6)
