"""Semantic tests for attribute ops, stratified split, and BFS (the
oracle-parity test covers cross-engine equality; these pin intrinsic
invariants against in-process Python specs)."""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

from ugfraud_spark.operators import attrs, bfs, evalmetrics, svd
from ugfraud_spark.sources import tables


def test_bfs_matches_python_bfs(spark, sf_small):
    und = tables.uni_edges_undirected(spark, sf_small)
    sym = tables.symmetrize(und)
    adj: dict[int, list[int]] = {}
    for r in sym.collect():
        adj.setdefault(r["src"], []).append(r["dst"])
    seed = min(adj)
    dist = {seed: 0}
    q = deque([seed])
    iters = 6
    while q:
        u = q.popleft()
        if dist[u] >= iters:
            continue
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)

    seeds = spark.createDataFrame([(seed,)], "id long")
    got = {r["id"]: r["dist"] for r in bfs.bfs_hops(sym, seeds, iters=iters).collect()}
    assert got == dist


def test_sssp_weighted_matches_python_bellman_ford(spark, sf_small):
    """Frontier-delta weighted SSSP == full synchronous Bellman–Ford at
    the SAME round count (the oracle's recurrence), and == exact Dijkstra
    distances once run to the fixpoint round."""
    import heapq

    und = tables.uni_edges_undirected(spark, sf_small)
    sym = tables.symmetrize(und)
    edges_w = sym.select(
        "src", "dst",
        (F.lit(1) + (F.col("src") + F.col("dst")) % 5).alias("w"))
    adj: dict[int, list[tuple[int, int]]] = {}
    for r in edges_w.collect():
        adj.setdefault(r["src"], []).append((r["dst"], r["w"]))
    seed = min(adj)

    # full (non-frontier) synchronous Bellman–Ford to the fixpoint,
    # keeping each round's frame — the spec the engine must match per-K
    frames = [{seed: 0}]
    while True:
        prev, nxt = frames[-1], dict(frames[-1])
        for u, d in prev.items():
            for v, w in adj.get(u, []):
                if d + w < nxt.get(v, float("inf")):
                    nxt[v] = d + w
        if nxt == prev:
            break
        frames.append(nxt)
    fix_round = len(frames) - 1

    seeds = spark.createDataFrame([(seed,)], "id long")
    k = min(6, fix_round)
    got_k = {r["id"]: r["dist"]
             for r in bfs.sssp_weighted(edges_w, seeds, iters=k).collect()}
    assert got_k == frames[k]

    got_fix = {r["id"]: r["dist"]
               for r in bfs.sssp_weighted(edges_w, seeds,
                                          iters=fix_round).collect()}
    dist = {seed: 0}
    heap = [(0, seed)]
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            if d + w < dist.get(v, float("inf")):
                dist[v] = d + w
                heapq.heappush(heap, (d + w, v))
    assert got_fix == dist


def test_bfs_frontier_resume_round_index(spark, sf_small, tmp_path):
    """The frontier filter selects dist == absolute round index, so a
    mid-run resume (iterate with start_iteration=k over the durable
    checkpoint) must keep expanding from the right frontier — pinned
    against the single-shot run."""
    from ugfraud_spark.operators.superstep import (
        colocate_edges, iterate, latest_checkpoint,
    )

    sym = tables.symmetrize(tables.uni_edges_undirected(spark, sf_small))
    seed = sym.agg(F.min("src")).collect()[0][0]
    seeds = spark.createDataFrame([(seed,)], "id long")
    want = {r["id"]: r["dist"]
            for r in bfs.bfs_hops(sym, seeds, iters=6).collect()}

    ckdir = str(tmp_path / "bfs_ck")
    bfs.bfs_hops(sym, seeds, iters=3, checkpoint_every=3,
                 checkpoint_dir=ckdir)
    state, step = latest_checkpoint(spark, ckdir)
    assert step == 3 and state is not None

    edges_sym = colocate_edges(sym.select("src", "dst"))

    def step_fn(st, i):
        relaxed = (
            edges_sym.join(
                st.where(F.col("dist") == i)
                .select(F.col("id").alias("src"), "dist"),
                "src",
            )
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        return st.unionAll(relaxed).groupBy("id").agg(
            F.min("dist").alias("dist"))

    res = iterate(state, step_fn, max_iter=6, start_iteration=3,
                  checkpoint_every=3)
    got = {r["id"]: r["dist"] for r in res.state.collect()}
    assert got == want


def test_random_split_halves_each_stratum(spark, sf_small):
    e = tables.bipartite_edges(spark, sf_small)
    gt = evalmetrics.ground_truth_users(e).withColumnRenamed("gt", "label")
    out = svd.random_split(gt)
    agg = out.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_train").cast("int")).alias("n_train"),
    ).collect()
    assert agg
    for r in agg:
        assert r["n_train"] == r["n"] // 2
    # deterministic across invocations
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, svd.random_split(gt).collect()))
    assert a == b


def test_subset_above_degree_spec(spark):
    rows = [(1, 10), (1, 11), (1, 12), (2, 10), (2, 11), (3, 10)]
    e = spark.createDataFrame(rows, "src long, dst long")
    # src deg: 1→3, 2→2, 3→1 ; dst deg: 10→3, 11→2, 12→1
    out = sorted(
        map(tuple, attrs.subset_above_degree(e, 1, 1).select("src", "dst").collect())
    )
    assert out == [(1, 10), (1, 11), (2, 10), (2, 11)]


def test_rank_stats_median_element(spark):
    vals = spark.createDataFrame([(v,) for v in [5, 1, 9, 3, 7]], "x long")
    r = attrs.rank_stats(vals, "x").collect()[0]
    # sorted [1,3,5,7,9], int(5/2)=2 → 5
    assert (r["min_v"], r["med_v"], r["max_v"]) == (1, 5, 9)
    vals2 = spark.createDataFrame([(v,) for v in [4, 2, 8, 6]], "x long")
    r2 = attrs.rank_stats(vals2, "x").collect()[0]
    # sorted [2,4,6,8], int(4/2)=2 → 6 (upper median, like the reference)
    assert r2["med_v"] == 6
