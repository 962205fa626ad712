"""Fraudar: fast peel equals the brute-force spec; planted dense block
recovered (reference ``Fraudar.py:75-106`` camouflage generator pattern);
scale-mode bulk peel finds the planted block too."""

from __future__ import annotations

import numpy as np
import pytest

from ugfraud_spark.operators import fraudar


def brute_force_peel(ri, ci, n_rows, n_cols, col_weights):
    """Naive O(V^2) reference spec: recompute deltas by full scan each
    step; min delta, ties → smallest index, rows win on row<=col."""
    alive_e = np.ones(len(ri), dtype=bool)
    alive_r = np.ones(n_rows, dtype=bool)
    alive_c = np.ones(n_cols, dtype=bool)
    w = col_weights[ci]

    # mirror the incremental subtraction arithmetic of the fast path:
    # deltas start as full sums and get decremented, never recomputed
    rd = np.zeros(n_rows)
    np.add.at(rd, ri, w)
    cd = np.zeros(n_cols)
    np.add.at(cd, ci, w)
    cur = float(w.sum())
    best_avg = cur / (n_rows + n_cols)
    deleted = []
    best_k = 0
    while alive_r.any() and alive_c.any():
        rdm = np.where(alive_r, rd, np.inf)
        cdm = np.where(alive_c, cd, np.inf)
        rmin_i = int(np.argmin(rdm))
        cmin_i = int(np.argmin(cdm))
        if rdm[rmin_i] <= cdm[cmin_i]:
            cur -= rdm[rmin_i]
            for k in np.nonzero((ri == rmin_i))[0]:
                cd[ci[k]] -= col_weights[ci[k]]
            alive_r[rmin_i] = False
            deleted.append((0, rmin_i))
        else:
            cur -= cdm[cmin_i]
            for k in np.nonzero((ci == cmin_i))[0]:
                rd[ri[k]] -= col_weights[cmin_i]
            alive_c[cmin_i] = False
            deleted.append((1, cmin_i))
        n_alive = alive_r.sum() + alive_c.sum()
        if n_alive:
            avg = cur / n_alive
            if avg > best_avg:
                best_avg = avg
                best_k = len(deleted)
    rows = set(range(n_rows))
    cols = set(range(n_cols))
    for kind, idx in deleted[:best_k]:
        (rows if kind == 0 else cols).discard(idx)
    return rows, cols, best_avg


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fast_peel_matches_bruteforce(seed):
    rng = np.random.RandomState(seed)
    n_rows, n_cols, n_e = 40, 15, 220
    ri = rng.randint(0, n_rows, n_e).astype(np.int64)
    ci = rng.randint(0, n_cols, n_e).astype(np.int64)
    pairs = sorted(set(zip(ri.tolist(), ci.tolist())))
    ri = np.array([p[0] for p in pairs])
    ci = np.array([p[1] for p in pairs])
    col_sums = np.zeros(n_cols)
    np.add.at(col_sums, ci, 1.0)
    cw = 1.0 / np.log(col_sums + 5)

    fast = fraudar.fast_greedy_decreasing(ri, ci, n_rows, n_cols, cw)
    rows, cols, avg = brute_force_peel(ri, ci, n_rows, n_cols, cw)
    assert fast.rows == rows
    assert fast.cols == cols
    assert abs(fast.score - avg) < 1e-12


def _planted(seed=7, n_rows=300, n_cols=60, m0=25, n0=8, bg=0.02, p=0.9):
    rng = np.random.RandomState(seed)
    mask = rng.rand(n_rows, n_cols) < bg
    mask[:m0, :n0] |= rng.rand(m0, n0) < p
    ri, ci = np.nonzero(mask)
    return ri.astype(np.int64), ci.astype(np.int64)


def test_planted_block_recovered():
    ri, ci = _planted()
    blk = fraudar.log_weighted_ave_degree(ri, ci, 300, 60)
    planted_r, planted_c = set(range(25)), set(range(8))
    jacc_r = len(blk.rows & planted_r) / len(blk.rows | planted_r)
    jacc_c = len(blk.cols & planted_c) / len(blk.cols | planted_c)
    assert jacc_r > 0.8 and jacc_c > 0.8


def test_fraudar_scores_spark(spark):
    ri, ci = _planted()
    edges = spark.createDataFrame(
        [(int(r) + 1000, int(c) + 2_000_000) for r, c in zip(ri, ci)],
        "src long, dst long",
    )
    scores = {r["id"]: r["score"] for r in fraudar.fraudar_scores(edges).collect()}
    planted = [scores[1000 + i] for i in range(25) if 1000 + i in scores]
    others = [scores[1000 + i] for i in range(100, 290) if 1000 + i in scores]
    assert np.mean(planted) > np.mean(others)
    assert all(0 <= v <= 1 for v in scores.values())


def test_bulk_peel_finds_planted(spark):
    ri, ci = _planted()
    edges = spark.createDataFrame(
        [(int(r) + 1000, int(c) + 2_000_000) for r, c in zip(ri, ci)],
        "src long, dst long",
    )
    best = fraudar.bulk_peel(edges, eps=0.2)
    got_rows = {r["id"] for r in best.where("side = 'row'").collect()}
    planted_r = {1000 + i for i in range(25)}
    # the dense prefix found by bulk peel should be dominated by the block
    assert len(got_rows & planted_r) / max(len(got_rows), 1) > 0.5


def test_bulk_peel_zero_rounds_is_noop(spark):
    """max_rounds=0 must run zero peel rounds (the dry-run contract) and
    return the empty sentinel, not execute a full round first."""
    edges = spark.createDataFrame([(1, 10), (2, 10)], "src long, dst long")
    out = fraudar.bulk_peel(edges, max_rounds=0)
    assert out.count() == 0
    assert out.columns == ["id", "side"]


def test_bulk_peel_broadcast_and_shuffle_paths_agree(spark):
    """The bcast_ids auto-switch (broadcast anti-join on the removed set
    vs shuffle semi-join on the keep set) must be a pure physical-plan
    choice: identical (id, side) output either way."""
    ri, ci = _planted()
    edges = spark.createDataFrame(
        [(int(r) + 1000, int(c) + 2_000_000) for r, c in zip(ri, ci)],
        "src long, dst long",
    )
    bcast = {(r["id"], r["side"])
             for r in fraudar.bulk_peel(edges, eps=0.2,
                                        finish_max_edges=0).collect()}
    shuffle = {(r["id"], r["side"])
               for r in fraudar.bulk_peel(edges, eps=0.2, bcast_ids=0,
                                          finish_max_edges=0).collect()}
    assert bcast == shuffle and len(bcast) > 0


def test_bulk_peel_driver_finish_agrees(spark):
    """The driver finisher (numpy tail over the collected alive subgraph)
    must reproduce the pure-Spark round loop: same thresholds, same
    best-prefix vertex set."""
    ri, ci = _planted()
    edges = spark.createDataFrame(
        [(int(r) + 1000, int(c) + 2_000_000) for r, c in zip(ri, ci)],
        "src long, dst long",
    )
    finished = {(r["id"], r["side"])
                for r in fraudar.bulk_peel(edges, eps=0.2).collect()}
    pure = {(r["id"], r["side"])
            for r in fraudar.bulk_peel(edges, eps=0.2,
                                       finish_max_edges=0).collect()}
    assert finished == pure and len(finished) > 0
