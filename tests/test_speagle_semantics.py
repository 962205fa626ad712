"""SpEagle vs an independent numpy Jacobi BP oracle on a small
YelpChi-shaped fixture (FIXTURES.md F3): per-node posteriors allclose
1e-6 at matched iteration counts and at convergence."""

from __future__ import annotations

import math

import numpy as np
import pytest

from ugfraud_spark.operators.speagle import speagle


def numpy_speagle(edges, upri, ppri, rpri, n_eps=1e-5, eps=0.1, iters=2):
    """Jacobi BP on the tripartite MRF, log space, independent impl."""
    def logp(p):
        p = 1 - n_eps if p == 1 else (n_eps if p == 0 else p)
        return np.log(np.array([1 - p, p]))

    H = lambda e: np.log(np.array([[1 - e, e], [e, 1 - e]]))  # noqa: E731
    h_ur, h_rp = H(n_eps), H(eps)

    msgs = {}  # (kind, u, p) -> 2-vector; kinds: ur, ru, rp, pr
    for u, p in edges:
        for kind in ("ur", "ru", "rp", "pr"):
            msgs[(kind, u, p)] = np.zeros(2)

    def one_msg(h, v):
        t = np.array([
            np.logaddexp(h[0, 0] + v[0], h[0, 1] + v[1]),
            np.logaddexp(h[1, 0] + v[0], h[1, 1] + v[1]),
        ])
        return t - np.logaddexp(t[0], t[1])

    for _ in range(iters):
        bu = {u: logp(upri[u]).copy() for u in upri}
        bp_ = {p: logp(ppri[p]).copy() for p in ppri}
        for u, p in edges:
            bu[u] = bu[u] + msgs[("ru", u, p)]
            bp_[p] = bp_[p] + msgs[("rp", u, p)]
        new = {}
        for u, p in edges:
            br = logp(rpri[(u, p)]) + msgs[("ur", u, p)] + msgs[("pr", u, p)]
            new[("ur", u, p)] = one_msg(h_ur, bu[u] - msgs[("ru", u, p)])
            new[("ru", u, p)] = one_msg(h_ur, br - msgs[("ur", u, p)])
            new[("rp", u, p)] = one_msg(h_rp, br - msgs[("pr", u, p)])
            new[("pr", u, p)] = one_msg(h_rp, bp_[p] - msgs[("rp", u, p)])
        msgs = new

    out_u, out_r = {}, {}
    bu = {u: logp(upri[u]).copy() for u in upri}
    for u, p in edges:
        bu[u] = bu[u] + msgs[("ru", u, p)]
    for u in upri:
        b = bu[u]
        out_u[u] = math.exp(b[1] - np.logaddexp(b[0], b[1]))
    for u, p in edges:
        br = logp(rpri[(u, p)]) + msgs[("ur", u, p)] + msgs[("pr", u, p)]
        out_r[(u, p)] = math.exp(br[1] - np.logaddexp(br[0], br[1]))
    return out_u, out_r


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.RandomState(42)
    P, U = 8, 40
    edges = set()
    for u in range(100, 100 + U):
        for p in rng.choice(P, size=rng.randint(1, 5), replace=False):
            edges.add((u, int(p)))
    edges = sorted(edges)
    upri = {u: float(rng.uniform(0.05, 0.95)) for u in range(100, 100 + U)}
    ppri = {p: float(rng.uniform(0.05, 0.95)) for p in range(P)}
    rpri = {e: float(rng.uniform(0.05, 0.95)) for e in edges}
    return edges, upri, ppri, rpri


@pytest.mark.parametrize("iters", [1, 2, 6])
def test_speagle_matches_numpy_jacobi(spark, fixture, iters):
    edges, upri, ppri, rpri = fixture
    e_df = spark.createDataFrame(edges, "src long, dst long")
    up_df = spark.createDataFrame(list(upri.items()), "id long, prior double")
    pp_df = spark.createDataFrame(list(ppri.items()), "id long, prior double")
    rp_df = spark.createDataFrame(
        [(u, p, v) for (u, p), v in rpri.items()], "src long, dst long, prior double"
    )
    _res, ub, _pb, rb = speagle(e_df, up_df, pp_df, rp_df, max_iter=iters)
    got_u = {r["id"]: r["belief"] for r in ub.collect()}
    got_r = {(r["src"], r["dst"]): r["belief"] for r in rb.collect()}

    want_u, want_r = numpy_speagle(edges, upri, ppri, rpri, iters=iters)
    assert set(got_u) == set(want_u)
    for k in want_u:
        assert abs(got_u[k] - want_u[k]) < 1e-6, (k, got_u[k], want_u[k])
    for k in want_r:
        assert abs(got_r[k] - want_r[k]) < 1e-6, (k, got_r[k], want_r[k])


def test_speagle_converges(spark, fixture):
    edges, upri, ppri, rpri = fixture
    e_df = spark.createDataFrame(edges, "src long, dst long")
    up_df = spark.createDataFrame(list(upri.items()), "id long, prior double")
    pp_df = spark.createDataFrame(list(ppri.items()), "id long, prior double")
    rp_df = spark.createDataFrame(
        [(u, p, v) for (u, p), v in rpri.items()], "src long, dst long, prior double"
    )
    res, ub, _pb, _rb = speagle(
        e_df, up_df, pp_df, rp_df, max_iter=60, tol=1e-9
    )
    assert res.converged
    beliefs = [r["belief"] for r in ub.collect()]
    assert all(0.0 <= b <= 1.0 for b in beliefs)
