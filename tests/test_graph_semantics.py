"""Semantic correctness vs independent pure-python/numpy oracles
(SURVEY §5.2: PageRank allclose 1e-6, components exact, triangles exact).
Fixed-k SQL parity (test_oracle_parity) proves cross-engine agreement;
these prove the kernels compute the right *mathematical* object."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from ugfraud_spark.operators import components, pagerank, triangles
from ugfraud_spark.sources import tables


@pytest.fixture(scope="module")
def uni(spark, sf_small):
    e = tables.uni_edges_directed(spark, sf_small)
    return [(r["src"], r["dst"]) for r in e.collect()]


@pytest.fixture(scope="module")
def und(spark, sf_small):
    e = tables.uni_edges_undirected(spark, sf_small)
    return [(r["a"], r["b"]) for r in e.collect()]


def test_pagerank_converged_matches_numpy(spark, sf_small, uni):
    res = pagerank.pagerank(
        tables.uni_edges_directed(spark, sf_small), max_iter=100, tol=1e-9
    )
    assert res.converged
    got = {r["id"]: r["value"] for r in res.state.collect()}

    ids = sorted({v for e in uni for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out_deg = defaultdict(int)
    for s, _d in uni:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(200):
        nxt = np.full(n, 0.15 / n)
        contrib = defaultdict(float)
        for s, d in uni:
            contrib[d] += r[idx[s]] / out_deg[s]
        for d, m in contrib.items():
            nxt[idx[d]] += 0.85 * m
        if np.abs(nxt - r).sum() < 1e-12:
            r = nxt
            break
        r = nxt
    want = {v: r[idx[v]] for v in ids}
    assert set(got) == set(want)
    assert all(abs(got[v] - want[v]) < 1e-6 for v in ids)


def test_connected_components_exact_union_find(spark, sf_small, und):
    got = {
        r["id"]: r["component"]
        for r in components.connected_components(
            tables.uni_edges_undirected(spark, sf_small)
        ).collect()
    }
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in und:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in parent}
    # canonical label = min id per component in both
    assert got == want


def test_triangles_exact_bruteforce(spark, sf_small, und):
    got = {
        r["id"]: r["triangles"]
        for r in triangles.triangles_per_vertex(
            tables.uni_edges_undirected(spark, sf_small)
        ).collect()
    }
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    want: dict[int, int] = defaultdict(int)
    eset = {(a, b) for a, b in und}
    for a, b in und:
        for c in adj[b]:
            if c > b and (a, c) in eset:
                want[a] += 1
                want[b] += 1
                want[c] += 1
    assert got == dict(want)


def test_pagerank_checkpoint_resume(spark, sf_small, tmp_path):
    """north_rule resumability: kill after superstep k, resume from the
    durable checkpoint, identical final ranks."""
    from ugfraud_spark.operators.superstep import latest_checkpoint

    e = tables.uni_edges_directed(spark, sf_small)
    full = pagerank.pagerank(e, max_iter=10, checkpoint_every=5)
    want = {r["id"]: r["value"] for r in full.state.collect()}

    ckdir = str(tmp_path / "ck")
    pagerank.pagerank(e, max_iter=5, checkpoint_every=5, checkpoint_dir=ckdir)
    state, step = latest_checkpoint(spark, ckdir)
    assert step == 5 and state is not None

    # resume: rebuild the same step function from the checkpointed state
    from ugfraud_spark.operators.superstep import iterate

    edges = e.select("src", "dst").localCheckpoint(eager=True)
    base = state.select("id", "out_deg").localCheckpoint(eager=True)
    n = base.count()
    teleport = (1.0 - 0.85) / n

    def step_fn(st, _i):
        contribs = (
            edges.join(
                st.where(F.col("out_deg").isNotNull()).select(
                    F.col("id").alias("src"),
                    (F.col("value") / F.col("out_deg")).alias("c"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("c").alias("mass"))
        )
        return base.join(contribs, "id", "left").select(
            "id", "out_deg",
            (F.lit(teleport) + F.lit(0.85) * F.coalesce("mass", F.lit(0.0))).alias("value"),
        )

    res = iterate(state, step_fn, max_iter=10, start_iteration=5, checkpoint_every=5)
    got = {r["id"]: r["value"] for r in res.state.select("id", "value").collect()}
    assert set(got) == set(want)
    assert all(abs(got[k] - want[k]) < 1e-12 for k in want)


def test_iceberg_substrate_fallback(spark, sf_small, tmp_path, monkeypatch):
    """With UGFRAUD_SPARK_ICEBERG=1 but no Iceberg runtime (this
    sandbox), write_state must fall back to parquet gracefully and
    read_state must round-trip the recorded ref."""
    from ugfraud_spark.sources import catalog

    monkeypatch.setenv(catalog.ICEBERG_ENV, "1")
    assert not catalog.iceberg_enabled(spark)  # jars absent here
    df = spark.range(5).select(F.col("id"), (F.col("id") * 2.0).alias("v"))
    ref = catalog.write_state(df, str(tmp_path / "ck"), 3)
    assert not ref.startswith("iceberg:")
    got = {r["id"]: r["v"] for r in catalog.read_state(spark, ref).collect()}
    assert got == {i: 2.0 * i for i in range(5)}


def test_iceberg_substrate_real():
    """Exercised only on a runtime that ships the Iceberg jars."""
    import os

    import pytest

    if os.environ.get("UGFRAUD_SPARK_ICEBERG") != "1":
        pytest.skip("UGFRAUD_SPARK_ICEBERG not set")
    from ugfraud_spark.plans.session import get_spark
    from ugfraud_spark.sources import catalog

    spark = get_spark("iceberg_gate")
    if not catalog.iceberg_enabled(spark):
        pytest.skip("Iceberg runtime/catalog unavailable")
    df = spark.range(5).toDF("id")
    ref = catalog.write_state(df, "/tmp/unused", 1)
    assert ref.startswith("iceberg:")
    assert catalog.read_state(spark, ref).count() == 5


def test_iceberg_state_table_isolation():
    """Two jobs with different checkpoint_dirs must map to DIFFERENT
    Iceberg state tables (the parquet layout's per-directory isolation,
    preserved on the Iceberg substrate); the same dir must be stable."""
    from ugfraud_spark.sources import catalog

    a = catalog.state_table_for("/jobs/a/ck")
    b = catalog.state_table_for("/jobs/b/ck")
    assert a != b
    assert a == catalog.state_table_for("/jobs/a/ck")
    assert a.startswith(catalog.STATE_NAMESPACE + ".superstep_state_")


def test_clustering_coefficient_known_graph(spark):
    """4-clique: every vertex cc = 1.0; appended path vertex of degree 2
    with no closing edge: cc = 0.0; leaf (degree 1): cc = 0.0 with
    triangles zero-filled."""
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = clique + [(3, 4), (4, 5)]  # path hanging off vertex 3
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["id"]: r for r in
           triangles.clustering_coefficient(df).collect()}
    for v in range(3):
        assert out[v]["degree"] == 3 and out[v]["triangles"] == 3
        assert out[v]["clustering"] == 1.0
    assert out[3]["degree"] == 4 and out[3]["triangles"] == 3
    assert out[3]["clustering"] == 0.5  # 2*3 / (4*3)
    assert out[4]["degree"] == 2 and out[4]["triangles"] == 0
    assert out[4]["clustering"] == 0.0
    assert out[5]["degree"] == 1 and out[5]["triangles"] == 0
    assert out[5]["clustering"] == 0.0


def test_effective_diameter_interpolation(spark):
    """WebGraph convention: smallest t with NF(t) >= 0.9 * NF(t_max),
    linearly interpolated between the straddling curve points."""
    from ugfraud_spark.operators import hyperball as hb

    def d(curve):
        nf = spark.createDataFrame(curve, "t int, nf_est double")
        return hb.effective_diameter(nf).collect()[0]["eff_diam"]

    # target 90 hit exactly at t=2: 1 + (90-40)/(90-40) = 2.0
    assert d([(0, 10.0), (1, 40.0), (2, 90.0), (3, 100.0)]) == 2.0
    # target 90 crossed inside (2,3]: 2 + (90-80)/(100-80) = 2.5
    assert d([(0, 10.0), (1, 40.0), (2, 80.0), (3, 100.0)]) == 2.5
    # ball already saturated at t=0 (e.g. isolated vertices): 0.0
    assert d([(0, 100.0), (1, 100.0)]) == 0.0


def test_host_graph_known_collapse(spark):
    """7 page vertices over 3 hosts (host = id % 3): the quotient graph
    counts collapsed page links exactly and host_stats reads the
    intra-host fraction off the self-loop mass."""
    from ugfraud_spark.operators import quotient

    edges = [(0, 1), (0, 3), (3, 0), (1, 4), (2, 5), (6, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    hg = quotient.host_graph(df, n_hosts=3)
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in hg.collect()}
    assert got == {(0, 1): 1, (0, 0): 3, (1, 1): 1, (2, 2): 1}
    stats = {r["host"]: r for r in quotient.host_stats(hg).collect()}
    assert stats[0]["out_links"] == 4 and stats[0]["intra_links"] == 3
    assert stats[0]["intra_frac"] == 0.75
    assert stats[1]["intra_frac"] == 1.0 and stats[2]["intra_frac"] == 1.0


def _ktruss_python(edges: set[tuple[int, int]], k: int) -> set:
    """Brute-force peel until fixpoint: drop edges supported by fewer
    than k-2 triangles among the remaining edges."""
    cur = set(edges)
    while True:
        sup = defaultdict(int)
        adj = defaultdict(set)
        for a, b in cur:
            adj[a].add(b)
            adj[b].add(a)
        for a, b in cur:
            for c in adj[a] & adj[b]:
                sup[(a, b)] += 1
        nxt = {e for e in cur if sup[e] >= k - 2}
        if nxt == cur:
            return cur
        cur = nxt


def test_ktruss_known_graph_and_cascade(spark):
    """K4 ∪ triangle(3,4,5) ∪ triangle(4,5,6): at k=4 the outer
    triangle edges have support 1 and peel in round 1, which drops
    (4,5)'s support to 0 so it peels in round 2 — a genuine cascade.
    Only the K4's six edges survive."""
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    edges = k4 + [(3, 4), (3, 5), (4, 5), (4, 6), (5, 6)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {(r["a"], r["b"]) for r in
           triangles.ktruss_edges(df, k=4).collect()}
    assert got == set(k4)
    assert got == _ktruss_python(set(edges), 4)


def test_ktruss_random_matches_python_model(spark):
    rng = np.random.RandomState(11)
    edges = {(int(a), int(b)) for a, b in
             rng.randint(0, 25, size=(160, 2)) if a < b}
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    for k in (3, 4, 5):
        got = {(r["a"], r["b"]) for r in
               triangles.ktruss_edges(df, k=k, max_rounds=12).collect()}
        assert got == _ktruss_python(edges, k), f"k={k}"


def test_degree_assortativity_known_and_numpy(spark):
    """Star graph: exactly -1 (hubs only connect to leaves). Random
    graph: matches np.corrcoef over the same symmetrized degree
    pairs."""
    star = spark.createDataFrame([(0, i) for i in range(1, 6)],
                                 "a long, b long")
    r = triangles.degree_assortativity(star).collect()[0]
    assert r["n_ends"] == 10 and r["assortativity"] == -1.0

    rng = np.random.RandomState(9)
    edges = {(int(a), int(b)) for a, b in
             rng.randint(0, 30, size=(120, 2)) if a < b}
    df = spark.createDataFrame(sorted(edges), "a long, b long")
    got = triangles.degree_assortativity(df).collect()[0]
    deg = defaultdict(int)
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    expect = float(np.corrcoef(xs, ys)[0, 1])
    assert got["n_ends"] == 2 * len(edges)
    assert got["assortativity"] == round(expect, 6)


def _hb_bucket_rho(vid: int) -> tuple[int, int]:
    import hashlib

    h = hashlib.md5(str(vid).encode()).hexdigest()
    bucket = int(h[0], 16)
    bits = bin(int(h[1:13], 16))[2:] if int(h[1:13], 16) else ""
    rho = 49 if not bits else (48 - len(bits)) + 1
    return bucket, rho


def test_hyperball_registers_match_exact_balls(spark, und):
    """Register vector after t rounds == max rho per bucket over the
    EXACT radius-t ball (BFS recomputation) for every vertex — the
    identity HyperBall is built on, checked wholesale at sf0.001."""
    from ugfraud_spark.operators import hyperball as hb

    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    t = 3
    df = spark.createDataFrame(und, "a long, b long")
    got = {r["id"]: [r[f"c{j}"] for j in range(16)]
           for r in hb.hyperball(df, t=t).collect()}
    assert set(got) == set(adj)
    for v in adj:
        ball = {v}
        frontier = {v}
        for _ in range(t):
            frontier = {w for u in frontier for w in adj[u]} - ball
            ball |= frontier
        regs = [0] * 16
        for w in ball:
            bkt, rho = _hb_bucket_rho(w)
            regs[bkt] = max(regs[bkt], rho)
        assert got[v] == regs, v


def test_hyperball_estimate_tracks_true_ball_size(spark, und):
    """Median relative error of the m=16 HLL estimate vs the exact ball
    size stays within ~2 std errors (1.04/sqrt(16) ≈ 26%)."""
    from ugfraud_spark.operators import hyperball as hb

    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    df = spark.createDataFrame(und, "a long, b long")
    est = {r["id"]: r["ball_est"] for r in
           hb.ball_estimates(hb.hyperball(df, t=3)).collect()}
    errs = []
    for v in adj:
        ball = {v}
        frontier = {v}
        for _ in range(3):
            frontier = {w for u in frontier for w in adj[u]} - ball
            ball |= frontier
        errs.append(abs(est[v] - len(ball)) / len(ball))
    errs.sort()
    assert errs[len(errs) // 2] < 0.52, errs[len(errs) // 2]


def test_reciprocity_known_graph(spark):
    """(0,1),(1,0),(1,2),(2,3),(3,2): 4 of 5 edges reciprocated."""
    from ugfraud_spark.operators import degrees

    e = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)], "src long, dst long")
    row = degrees.reciprocity(e).collect()[0]
    assert (row["n_edges"], row["n_recip"]) == (5, 4)
    assert row["reciprocity"] == 0.8


def test_powerlaw_alpha_matches_closed_form(spark):
    """In-degree multiset {2, 4, 8} at dmin=2: alpha = 1 + 3/Σln(d/1.5)
    with each term rounded to 6 dp (the engine's decimal-sum rule)."""
    import math

    from ugfraud_spark.operators import degrees

    edges = []
    src = 100
    for dst, d in [(0, 2), (1, 4), (2, 8)]:
        for _ in range(d):
            edges.append((src, dst))
            src += 1
    e = spark.createDataFrame(edges, "src long, dst long")
    row = degrees.powerlaw_alpha(e, dmin=2).collect()[0]
    s = sum(round(math.log(d / 1.5), 6) for d in (2, 4, 8))
    assert row["n_tail"] == 3
    assert abs(row["alpha"] - round(1 + 3 / s, 6)) < 1e-9


def test_harmonic_centrality_matches_python_pipeline(spark):
    """Full-pipeline python model on a random graph: exact BFS balls →
    md5 registers → HLL estimate per round → rounded delta/divide/sum,
    matched exactly per vertex."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from ugfraud_spark.operators import hyperball as hb

    def r6(x):  # Spark/DuckDB round HALF_UP; python round() is half-even
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    rng = np.random.RandomState(17)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.randint(0, 40, size=(150, 2)) if a < b})
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["harmonic"] for r in
           hb.harmonic_centrality(df, t=3).collect()}

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def est(ball):
        regs = [0] * 16
        for w in ball:
            bkt, rho = _hb_bucket_rho(w)
            regs[bkt] = max(regs[bkt], rho)
        z = sum(2.0 ** -r for r in regs)
        v = sum(1 for r in regs if r == 0)
        raw = 0.673 * 256 / z
        e = 16 * math.log(16 / v) if raw <= 40 and v > 0 else raw
        return r6(e)

    for v in adj:
        ball, frontier = {v}, {v}
        ests = [est(ball)]
        for _ in range(3):
            frontier = {w for u in frontier for w in adj[u]} - ball
            ball |= frontier
            ests.append(est(ball))
        # engine discipline: exact-decimal deltas scaled by lcm/r,
        # one double division — no rounding site anywhere
        harm6 = sum((Decimal(repr(ests[r])) - Decimal(repr(ests[r - 1])))
                    * (6 // r) for r in (1, 2, 3))
        want = float(harm6) / 6.0
        assert abs(got[v] - want) < 1e-9, v


def test_cocitation_known_graph_and_cap(spark):
    """0→{1,2,3}, 4→{2,3}, 5→{3}: pair (2,3) co-cited twice, (1,2) and
    (1,3) once. With max_out=2 the degree-3 source is excluded before
    the wedge join and only 4's pair survives."""
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (4, 2), (4, 3), (5, 3)],
        "src long, dst long")
    got = {(r["a"], r["b"]): r["n_common"]
           for r in triangles.cocitation(e).collect()}
    assert got == {(1, 2): 1, (1, 3): 1, (2, 3): 2}
    capped = {(r["a"], r["b"]): r["n_common"]
              for r in triangles.cocitation(e, max_out=2).collect()}
    assert capped == {(2, 3): 1}


def test_pagerank_weighted_matches_numpy(spark):
    """Fixed-iteration weighted PageRank vs a numpy replication of the
    same recurrence (dangling mass dropped, weight-proportional
    distribution); includes a dangling vertex and asymmetric weights."""
    edges = [(0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 3, 1.0)]
    # vertex 3 dangles
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    res = pagerank.pagerank_weighted(df, max_iter=7)
    got = {r["id"]: r["value"] for r in res.state.collect()}

    ids = [0, 1, 2, 3]
    out_w = defaultdict(float)
    for s, _d, w in edges:
        out_w[s] += w
    r = {v: 1 / 4 for v in ids}
    for _ in range(7):
        nxt = {v: 0.15 / 4 for v in ids}
        for s, d, w in edges:
            nxt[d] += 0.85 * (r[s] / out_w[s]) * w
        r = nxt
    assert set(got) == set(ids)
    assert all(abs(got[v] - r[v]) < 1e-9 for v in ids)


def test_bowtie_known_digraph(spark):
    """Cycle {0,1,2} is the pivot SCC; 5 feeds it (IN); 6,7 hang off it
    (OUT); the disconnected pair {8,9} is OTHER."""
    from ugfraud_spark.operators import bowtie as bt

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (5, 0), (2, 6), (6, 7), (8, 9)],
        "src long, dst long")
    got = {r["id"]: r["region"] for r in bt.bowtie(e, iters=5).collect()}
    assert got == {0: "SCC", 1: "SCC", 2: "SCC", 5: "IN",
                   6: "OUT", 7: "OUT", 8: "OTHER", 9: "OTHER"}


def test_spam_mass_known_digraph_and_python_model(spark):
    """TrustRank on a graph with a 'spam farm' (3→4→3 mutual boost,
    fed by nothing trusted) and an endorsed core (everyone links 0):
    the farm carries high spam mass and trips the relative-mass
    verdict; the trusted hub does not. Values equal a python replay of
    both rank chains with k=1 seed (vertex 0, the in-degree max)."""
    from collections import defaultdict

    from ugfraud_spark.operators import trustrank

    edges = [(1, 0), (2, 0), (5, 0), (0, 1), (1, 2),
             (3, 4), (4, 3), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")

    got = {r["id"]: r for r in
           trustrank.spam_mass(df, k=1, max_iter=5).collect()}

    ids = sorted({v for e in edges for v in e})
    out = defaultdict(int)
    for s, _d in edges:
        out[s] += 1
    # seed by construction: 0 has in-degree 3, the unique max
    pr = {v: 1 / len(ids) for v in ids}
    tr = {v: (1.0 if v == 0 else 0.0) for v in ids}
    for _ in range(5):
        npr = {v: 0.15 / len(ids) for v in ids}
        ntr = {v: (0.15 if v == 0 else 0.0) for v in ids}
        for s, d in edges:
            npr[d] += 0.85 * pr[s] / out[s]
            ntr[d] += 0.85 * tr[s] / out[s]
        pr, tr = npr, ntr
    for v in ids:
        prd, trd = round(pr[v], 6), round(tr[v], 6)
        assert abs(got[v]["pagerank"] - prd) < 1e-12, v
        assert abs(got[v]["trustrank"] - trd) < 1e-12, v
        assert abs(got[v]["spam_mass"] - round(prd - trd, 6)) < 1e-12, v
        assert got[v]["spammy"] == (2 * (prd - trd) > prd), v
    # the farm {3,4} never sees trust; the hub 0 is saturated with it
    assert got[3]["spammy"] and got[4]["spammy"]
    assert not got[0]["spammy"]
    assert got[0]["trustrank"] > 0.3


def test_trusted_seeds_topk_tiebreak(spark):
    from ugfraud_spark.operators import trustrank

    e = spark.createDataFrame(
        [(1, 0), (2, 0), (0, 5), (1, 5), (2, 9), (3, 9)],
        "src long, dst long")
    # in-degree: 0→2, 5→2, 9→2 — k=2 keeps the two smallest ids
    got = sorted(r["id"] for r in trustrank.trusted_seeds(e, k=2).collect())
    assert got == [0, 5]


def test_salsa_python_model_and_mass_conservation(spark):
    """SALSA on a digraph with a hub-ish node and a spam-farm 2-cycle:
    values equal a python replay of both stochastic chains, each
    side's scores sum to exactly 1 (no normalization step exists to
    hide a mass leak), and zero-degree sides are exactly 0.0."""
    from collections import defaultdict

    from ugfraud_spark.operators import salsa as sa

    edges = [(1, 0), (2, 0), (5, 0), (0, 1), (1, 2),
             (3, 4), (4, 3), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r for r in sa.salsa(df, iters=5).collect()}

    ind, outd = defaultdict(int), defaultdict(int)
    for s, d in edges:
        outd[s] += 1
        ind[d] += 1
    a = {v: 1 / len(ind) for v in ind}
    h = {v: 1 / len(outd) for v in outd}
    for _ in range(5):
        hm, na = defaultdict(float), defaultdict(float)
        for s, d in edges:
            hm[s] += a[d] / ind[d]
        for s, d in edges:
            na[d] += hm[s] / outd[s]
        am, nh = defaultdict(float), defaultdict(float)
        for s, d in edges:
            am[d] += h[s] / outd[s]
        for s, d in edges:
            nh[s] += am[d] / ind[d]
        a, h = dict(na), dict(nh)

    ids = sorted({v for e in edges for v in e})
    for v in ids:
        assert abs(got[v]["authority"] - a.get(v, 0.0)) < 1e-9, v
        assert abs(got[v]["hub"] - h.get(v, 0.0)) < 1e-9, v
    assert abs(sum(r["authority"] for r in got.values()) - 1.0) < 1e-9
    assert abs(sum(r["hub"] for r in got.values()) - 1.0) < 1e-9
    # 5 never appears as a dst — pure hub, authority exactly 0
    assert got[5]["authority"] == 0.0 and got[5]["hub"] > 0.0


def test_salsa_stationary_indegree_proportional(spark):
    """Lempel–Moran closed form: on a CONNECTED authority support
    component the stationary authority weight is proportional to
    in-degree. A star + chord graph converges there within ~20 iters."""
    from ugfraud_spark.operators import salsa as sa

    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 2), (1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["authority"]
           for r in sa.salsa(df, iters=40).collect()}
    ind = {0: 4, 2: 2, 3: 1}
    tot = sum(ind.values())
    for v, d in ind.items():
        assert abs(got[v] - d / tot) < 1e-6, (v, got[v], d / tot)


def test_katz_python_model(spark):
    """Katz on the known digraph equals a python replay of the
    truncated series x_{t+1} = beta + alpha * sum of in-neighbor x_t."""
    from collections import defaultdict

    from ugfraud_spark.operators import pagerank as pr

    edges = [(1, 0), (2, 0), (5, 0), (0, 1), (1, 2),
             (3, 4), (4, 3), (5, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["value"]
           for r in pr.katz(df, max_iter=5).state.collect()}

    ids = sorted({v for e in edges for v in e})
    x = {v: 1.0 for v in ids}
    for _ in range(5):
        nx = defaultdict(float)
        for s, d in edges:
            nx[d] += x[s]
        x = {v: 1.0 + 0.1 * nx[v] for v in ids}
    for v in ids:
        assert abs(got[v] - x[v]) < 1e-12, v
    # in-degree-0 vertex 5 stays at the beta floor exactly
    assert got[5] == 1.0


def test_resource_allocation_python_model(spark):
    """RA index on a known digraph: a directory-ish source (out-degree
    3) endorses its co-cited pairs at 1/3 per wedge while a focused
    source (out-degree 2) endorses at 1/2; scores equal the python
    replay and the >=128 cap guard trips."""
    import pytest as _pytest
    from collections import defaultdict
    from itertools import combinations

    edges = [(10, 0), (10, 1), (10, 2),   # directory: od 3
             (11, 0), (11, 1),            # focused: od 2
             (12, 1), (12, 2), (12, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["a"], r["b"]): r["ra_score"] for r in
           triangles.resource_allocation(df).collect()}

    outs = defaultdict(list)
    od = defaultdict(int)
    for s, d in edges:
        outs[s].append(d)
        od[s] += 1
    want = defaultdict(float)
    for s, ds in outs.items():
        for a, b in combinations(sorted(ds), 2):
            want[(a, b)] += round(1.0 / od[s], 6)
    assert got == {k: round(v, 6) for k, v in want.items()}
    # (0,1) is co-cited by both sources: 1/3 + 1/2
    assert abs(got[(0, 1)] - (1 / 3 + 1 / 2)) < 2e-6
    with _pytest.raises(ValueError, match="128"):
        triangles.resource_allocation(df, max_out=128)


def test_betweenness_matches_textbook_brandes(spark):
    """On a small digraph where the pivot set covers EVERY source and
    the depth exceeds the diameter, the estimator must equal exact
    directed betweenness — checked against a textbook Brandes (BFS +
    dependency accumulation) implemented independently here."""
    from collections import defaultdict, deque

    from ugfraud_spark.operators import betweenness as bw

    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (4, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["bc"] for r in bw.betweenness(df).collect()}

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    ids = sorted({v for e in edges for v in e})
    bc = defaultdict(float)
    for s in ids:  # every vertex is a source here, so pivots == all
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = defaultdict(float)
        for u in reversed(order):
            for w in adj[u]:
                if dist.get(w) == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if u != s:
                bc[u] += delta[u]
    for v in ids:
        assert abs(got[v] - round(bc[v], 6)) < 1e-9, (v, got[v], bc[v])
    # 3 is the bridge every 0/1/2-sourced path to 4 crosses
    assert got[3] == max(got.values())


def test_betweenness_depth_truncation(spark):
    """Depth 1 sees only single-hop paths — no intermediate vertices
    exist, so every dependency is 0."""
    from ugfraud_spark.operators import betweenness as bw

    edges = [(0, 1), (1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["bc"] for r in bw.betweenness(df, depth=1).collect()}
    assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}


def test_bibliographic_coupling_known_graph_and_cap(spark):
    """Dual of co-citation: 1 and 2 both cite {8, 9} -> n_shared 2;
    the in-degree cap drops a super-popular target BEFORE pairing."""
    edges = [(1, 8), (1, 9), (2, 8), (2, 9), (3, 9),
             (1, 7), (2, 7), (3, 7), (4, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["a"], r["b"]): r["n_shared"] for r in
           triangles.bibliographic_coupling(df).collect()}
    assert got == {(1, 2): 3, (1, 3): 2, (2, 3): 2,
                   (1, 4): 1, (2, 4): 1, (3, 4): 1}
    # cap 3 drops target 7 (in-degree 4) before the self-join
    capped = {(r["a"], r["b"]): r["n_shared"] for r in
              triangles.bibliographic_coupling(df, max_in=3).collect()}
    assert capped == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_closeness_lin_matches_python_pipeline(spark):
    """Full-pipeline python model (same as the harmonic test): exact
    BFS balls -> md5 registers -> HLL estimate per round -> exact
    decimal delta*r sum, single IEEE divisions for closeness and
    Lin's index (the sd == 0 degenerate branch is asserted from the
    model side whenever the HLL estimates make it fire)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from ugfraud_spark.operators import hyperball as hb

    def r6(x):
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    rng = np.random.RandomState(23)
    edges = sorted({(int(a), int(b)) for a, b in
                    rng.randint(0, 40, size=(150, 2)) if a < b})
    edges.append((98, 99))  # far 2-vertex component
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r for r in hb.closeness_lin(df, t=3).collect()}

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)

    def est(ball):
        regs = [0] * 16
        for w in ball:
            bkt, rho = _hb_bucket_rho(w)
            regs[bkt] = max(regs[bkt], rho)
        z = sum(2.0 ** -r for r in regs)
        v = sum(1 for r in regs if r == 0)
        raw = 0.673 * 256 / z
        e = 16 * math.log(16 / v) if raw <= 40 and v > 0 else raw
        return r6(e)

    for v in adj:
        ball, frontier = {v}, {v}
        ests = [est(ball)]
        for _ in range(3):
            frontier = {w for u in frontier for w in adj[u]} - ball
            ball |= frontier
            ests.append(est(ball))
        sd_dec = sum((Decimal(repr(ests[r])) - Decimal(repr(ests[r - 1])))
                     * r for r in (1, 2, 3))
        rc_dec = Decimal(repr(ests[3])) - 1
        sd, rc = float(sd_dec), float(rc_dec)
        assert abs(got[v]["sum_dist"] - sd) < 1e-12, v
        assert abs(got[v]["reachable"] - rc) < 1e-12, v
        if sd == 0.0:
            assert got[v]["closeness"] == 0.0 and got[v]["lin"] == 1.0
        else:
            assert got[v]["closeness"] == 1.0 / sd, v
            assert got[v]["lin"] == rc * rc / sd, v
    # the 2-vertex component {98, 99}: each reaches exactly the other
    # at distance 1 (up to HLL estimate error, exact at this size)
    assert got[98]["reachable"] == got[99]["reachable"]


def test_random_walks_structure_and_replay(spark):
    """Every consecutive (step t, t+1) pair must be a real edge; the
    full corpus equals an independent python replay of the walk rule
    (ranked adjacency + counter hash); dead ends truncate."""
    from ugfraud_spark.operators import walks as wk

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4)]  # 4 dead-ends
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = wk.random_walks(df, n_walks=3, length=5).collect()
    got = {}
    for r in rows:
        got.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]

    adj = {}
    for s, d in sorted(edges):
        adj.setdefault(s, []).append(d)
    want = {}
    for start in adj:
        for w in range(3):
            wid = start * 3 + w
            cur, path = start, {0: start}
            for t in range(1, 6):
                if cur not in adj:
                    break
                nbrs = sorted(adj[cur])
                h = (cur * wk.WALK_A + wid * wk.WALK_B
                     + t * wk.WALK_C + 1) % wk.WALK_P
                pick = ((h * wk.WALK_A + wk.WALK_B) % wk.WALK_P) % len(nbrs)
                cur = nbrs[pick]
                path[t] = cur
            want[wid] = path
    assert got == want
    eset = set(edges)
    for path in got.values():
        for t in range(1, max(path) + 1):
            if t in path:
                assert (path[t - 1], path[t]) in eset


def test_random_walks_choices_spread(spark):
    """Semantic (non-parity) claim: on a 32-out-neighbor star, the
    first-step picks across 64 walks are well spread — many distinct
    neighbors, no neighbor grossly over-chosen. Guards against the
    shared-formula-oracle blind spot (PLANS §32/§40): parity alone
    would pass even if every walk made the same choice."""
    from collections import Counter

    from ugfraud_spark.operators import walks as wk

    edges = [(0, i) for i in range(1, 33)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = wk.random_walks(df, n_walks=64, length=1).collect()
    first = Counter(r["vertex"] for r in rows if r["step"] == 1)
    assert sum(first.values()) == 64
    assert len(first) >= 20          # covers most of the 32 neighbors
    assert max(first.values()) <= 6  # no single neighbor dominates


def test_eigenvector_centrality_python_and_numpy(spark):
    """Power iteration replayed in python on the known digraph; on a
    strongly connected graph with enough iterations the result aligns
    with numpy's principal eigenvector of A^T (Perron-Frobenius)."""
    from ugfraud_spark.operators import hits as h

    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (1, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["eigen"]
           for r in h.eigenvector_centrality(df, iters=5).collect()}

    x = {v: 1.0 for v in (0, 1, 2)}
    for _ in range(5):
        m = {v: 0.0 for v in (0, 1, 2)}
        for s, d in edges:
            m[d] += x[s]
        nrm = sum(val * val for val in m.values()) ** 0.5
        x = {v: m[v] / nrm for v in m}
    for v in x:
        assert abs(got[v] - x[v]) < 1e-12, v

    big = {r["id"]: r["eigen"]
           for r in h.eigenvector_centrality(df, iters=60).collect()}
    A = np.zeros((3, 3))
    for s, d in edges:
        A[d, s] += 1.0
    w, V = np.linalg.eig(A)
    p = np.abs(V[:, np.argmax(w.real)].real)
    p /= np.linalg.norm(p)
    for v in (0, 1, 2):
        assert abs(big[v] - p[v]) < 1e-6, v


def test_lpa_modularity_known_partitions(spark):
    """Two 4-cliques joined by one bridge: LPA finds the two cliques
    and Q equals the hand-computed integer formula; a clique-free
    star's trivial single community scores Q = 0 exactly."""
    from ugfraud_spark.operators import labelprop as lp

    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a + 10, b + 10) for a, b in c1]
    edges = c1 + c2 + [(3, 10)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = lp.lpa_modularity(df, iters=4).collect()[0]

    labels = {r["id"]: r["label"] for r in lp.lpa(df, iters=4).collect()}
    assert len({labels[v] for v in range(4)}) == 1
    assert len({labels[v + 10] for v in range(4)}) == 1
    assert labels[0] != labels[10]

    m = len(edges)
    com = {}
    for v, l in labels.items():
        com.setdefault(l, set()).add(v)
    eset = [(a, b) for a, b in edges]
    num = 0
    for members in com.values():
        ec = sum(1 for a, b in eset if a in members and b in members)
        dcv = sum(sum(1 for e in eset if v in e) for v in members)
        num += 4 * m * ec - dcv * dcv
    assert got["modularity"] == num / (4 * m * m)
    assert got["n_communities"] == len(com)
    assert got["m_edges"] == m

    tri = spark.createDataFrame([(0, 1), (1, 2), (0, 2)],
                                "a long, b long")
    q0 = lp.lpa_modularity(tri, iters=4).collect()[0]
    # one community: e_c = m, d_c = 2m -> 4m*m - 4m^2 = 0 exactly
    assert q0["modularity"] == 0.0 and q0["n_communities"] == 1
    # known synchronous-LPA artifact, pinned: a star (bipartite)
    # oscillates hub<->leaves, landing Q = -1/2 at even iters
    star = spark.createDataFrame([(0, i) for i in range(1, 6)],
                                 "a long, b long")
    qs = lp.lpa_modularity(star, iters=4).collect()[0]
    assert qs["modularity"] == -0.5 and qs["n_communities"] == 2


def test_pagerank_dangling_mass_conserved_and_python_model(spark):
    """Google-matrix PageRank on a digraph with two dangling sinks:
    total rank stays exactly 1 (up to float), matching a python replay;
    the plain kernel on the same graph leaks the dangling mass."""
    from ugfraud_spark.operators import pagerank as pr

    edges = [(0, 1), (0, 2), (1, 3), (2, 4)]  # 3 and 4 are dangling
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["value"]
           for r in pr.pagerank_dangling(df, max_iter=5).state.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-12

    leaky = {r["id"]: r["value"]
             for r in pr.pagerank(df, max_iter=5).state.collect()}
    assert sum(leaky.values()) < 1.0 - 1e-6

    ids = [0, 1, 2, 3, 4]
    out = {0: 2, 1: 1, 2: 1}
    n = len(ids)
    x = {v: 1 / n for v in ids}
    for _ in range(5):
        dm = sum(x[v] for v in ids if v not in out)
        m = {v: 0.0 for v in ids}
        for s, d2 in edges:
            m[d2] += x[s] / out[s]
        x = {v: 0.15 / n + 0.85 * (m[v] + dm / n) for v in ids}
    for v in ids:
        assert abs(got[v] - x[v]) < 1e-12, v


def test_lpa_conductance_known_partitions(spark):
    """Two 4-cliques + one bridge: each community has cut 1 and volume
    13 (12 intra degree-ends + 1 bridge end) -> phi = 1/13 exactly; a
    lone triangle is the whole graph -> phi = 0.0 by definition."""
    from ugfraud_spark.operators import labelprop as lp

    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a + 10, b + 10) for a, b in c1]
    df = spark.createDataFrame(c1 + c2 + [(3, 10)], "a long, b long")
    got = {r["label"]: r for r in lp.lpa_conductance(df, iters=4).collect()}
    assert len(got) == 2
    for r in got.values():
        assert r["cut_edges"] == 1 and r["volume"] == 13
        assert r["conductance"] == 1 / 13

    tri = spark.createDataFrame([(0, 1), (1, 2), (0, 2)],
                                "a long, b long")
    whole = lp.lpa_conductance(tri, iters=4).collect()
    assert len(whole) == 1
    assert whole[0]["cut_edges"] == 0 and whole[0]["conductance"] == 0.0


def test_adamic_adar_and_jaccard_known_graph(spark):
    """10→{0,1}, 11→{0,1}, 12→{0,1,2}, 13→{0}: AA(0,1) sums two
    1/ln2 wedges and one 1/ln3 (the od-1 source 13 contributes no
    wedge and no weight); Jaccard counts 13 in the union for pairs
    touching 0. With max_out=2 the od-3 source drops from BOTH the
    wedge and the in-degree counts."""
    e = spark.createDataFrame(
        [(10, 0), (10, 1), (11, 0), (11, 1),
         (12, 0), (12, 1), (12, 2), (13, 0)],
        "src long, dst long")
    w2, w3 = round(1 / math.log(2), 6), round(1 / math.log(3), 6)
    aa = {(r["a"], r["b"]): r["aa_score"]
          for r in triangles.adamic_adar(e).collect()}
    assert aa == {(0, 1): round(2 * w2 + w3, 6),
                  (0, 2): w3, (1, 2): w3}
    jac = {(r["a"], r["b"]): (r["n_common"], r["jaccard"])
           for r in triangles.jaccard_inlinks(e).collect()}
    # in(0) = {10,11,12,13}, in(1) = {10,11,12}, in(2) = {12}
    assert jac == {(0, 1): (3, 3 / 4), (0, 2): (1, 1 / 4),
                   (1, 2): (1, 1 / 3)}
    capped = {(r["a"], r["b"]): (r["n_common"], r["jaccard"])
              for r in triangles.jaccard_inlinks(e, max_out=2).collect()}
    # source 12 gone everywhere: in(0) = {10,11,13}, in(1) = {10,11}
    assert capped == {(0, 1): (2, 2 / 3)}


def test_node2vec_walks_structure_and_replay(spark):
    """Full corpus equals an independent python replay of the
    second-order rule (ranked adjacency, CASE weight, cumulative-slot
    integer draw); every consecutive pair is a real edge; dead ends
    truncate; non-integer weights are rejected."""
    from ugfraud_spark.operators import walks as wk

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4), (1, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = wk.node2vec_walks(df, n_walks=3, length=5).collect()
    got = {}
    for r in rows:
        got.setdefault(r["walk_id"], {})[r["step"]] = r["vertex"]

    adj, eset = {}, set(edges)
    for s, d in sorted(edges):
        adj.setdefault(s, []).append(d)

    def scramble(h):
        return (((h % wk.WALK_P) * wk.WALK_A + wk.WALK_B) % wk.WALK_P)

    w_ret, w_adj, w_out = 1, 4, 16
    want = {}
    for start in adj:
        for w in range(3):
            wid = start * 3 + w
            prev, cur, path = None, start, {0: start}
            for t in range(1, 6):
                if cur not in adj:
                    break
                nbrs = sorted(adj[cur])
                h = scramble(cur * wk.WALK_A + wid * wk.WALK_B
                             + t * wk.WALK_C + 1)
                if t == 1:
                    nxt = nbrs[h % len(nbrs)]
                else:
                    wts = [w_ret if x == prev
                           else (w_adj if (prev, x) in eset else w_out)
                           for x in nbrs]
                    r, cum = h % sum(wts), 0
                    for x, wt in zip(nbrs, wts):
                        cum += wt
                        if r < cum:
                            nxt = x
                            break
                prev, cur = cur, nxt
                path[t] = cur
            want[wid] = path
    assert got == want
    for path in got.values():
        for t in range(1, max(path) + 1):
            if t in path:
                assert (path[t - 1], path[t]) in eset
    with pytest.raises(ValueError, match="integer"):
        wk.node2vec_walks(df, w_adj=4.0)


def test_node2vec_bias_frequencies(spark):
    """Semantic (non-parity) claim — the §32 guard: pick frequencies
    are proportional to the bias weights. For walks that step 0→1,
    the step-2 candidates from 1 with prev=0 are 0 (return, w=1),
    2 (adjacent to 0, w=4), 3 (far, w=16): pick fractions must sit
    near 1/21, 4/21, 16/21 — which parity alone could not distinguish
    from a degenerate draw."""
    from collections import Counter

    from ugfraud_spark.operators import walks as wk

    edges = [(0, 1), (0, 2), (1, 0), (1, 2), (1, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = wk.node2vec_walks(df, n_walks=840, length=2).collect()
    via1 = {r["walk_id"] for r in rows
            if r["step"] == 1 and r["vertex"] == 1}
    n = len(via1)
    assert 300 <= n <= 540  # step-1 uniform pick over {1, 2}
    second = Counter(r["vertex"] for r in rows
                     if r["step"] == 2 and r["walk_id"] in via1)
    assert sum(second.values()) == n
    assert 0.01 <= second[0] / n <= 0.10   # weight 1/21  ~ 0.048
    assert 0.10 <= second[2] / n <= 0.30   # weight 4/21  ~ 0.190
    assert 0.65 <= second[3] / n <= 0.85   # weight 16/21 ~ 0.762


def test_negative_samples_semantics(spark):
    """Semantic claims (the oracle shares the formula): no emitted
    pair is a true edge or a self-pair, every dst is a real vertex,
    at most k per source ranked 1..k contiguously, deterministic
    across re-runs, and on a sparse graph most sources fill all k."""
    from ugfraud_spark.operators import walks as wk

    edges = [(s, (s * 7 + o) % 50) for s in range(40) for o in (1, 2, 3)
             if s != (s * 7 + o) % 50]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = wk.negative_samples(df, k=3).collect()
    eset = set(edges)
    verts = {v for e in edges for v in e}
    per_src = defaultdict(list)
    for r in rows:
        assert (r["src"], r["dst"]) not in eset
        assert r["dst"] != r["src"]
        assert r["dst"] in verts
        per_src[r["src"]].append(r["neg_rank"])
    assert set(per_src) <= {s for s, _ in edges}
    for s, ranks in per_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    filled = sum(1 for v in per_src.values() if len(v) == 3)
    assert filled >= 0.9 * len(per_src)
    again = wk.negative_samples(df, k=3).collect()
    assert {tuple(r) for r in rows} == {tuple(r) for r in again}


def test_ppr_sweep_cut_finds_planted_cluster(spark):
    """Two 5-cliques joined by one bridge edge, scores favoring clique
    A: the sweep's minimum-conductance prefix is exactly clique A, and
    every (vol, cut, phi) row matches a python replay of the
    definition on the known graph."""
    from itertools import combinations

    from ugfraud_spark.operators.sweep import ppr_sweep_cut

    a_nodes, b_nodes = range(5), range(5, 10)
    und = (list(combinations(a_nodes, 2)) + list(combinations(b_nodes, 2))
           + [(0, 5)])
    edges = spark.createDataFrame(und, "a long, b long")
    # synthetic diffusion scores: clique A high, bridge endpoint of B
    # middling, rest of B low — a PPR-from-A shape
    sc = [(i, 0.9 - 0.1 * i) for i in a_nodes] + \
         [(i, 0.05 - 0.001 * i) for i in b_nodes]
    scores = spark.createDataFrame(sc, "id long, ppr double")
    rows = sorted(ppr_sweep_cut(edges, scores).collect(),
                  key=lambda r: r["k"])

    deg = defaultdict(int)
    for x, y in und:
        deg[x] += 1
        deg[y] += 1
    vol_all = sum(deg.values())
    order = [i for i, _ in sorted(sc, key=lambda t: (-t[1] / deg[t[0]],
                                                     t[0]))]
    assert [r["id"] for r in rows] == order
    prefix = set()
    for r in rows:
        prefix.add(r["id"])
        vol = sum(deg[v] for v in prefix)
        internal = sum(1 for x, y in und if x in prefix and y in prefix)
        cut = vol - 2 * internal
        assert (r["vol"], r["cut"]) == (vol, cut)
        denom = min(vol, vol_all - vol)
        if denom > 0:
            assert r["phi"] == cut / denom
        else:
            assert r["phi"] is None
    best = min((r for r in rows if r["phi"] is not None),
               key=lambda r: (r["phi"], r["k"]))
    assert {r["id"] for r in rows if r["k"] <= best["k"]} == set(a_nodes)
    assert best["phi"] == 1 / min(21, vol_all - 21)  # cut=1, vol(A)=21


def test_simrank2_matches_definition(spark):
    """Python replay of the exact truncated-SimRank definition on a
    hand graph: s1 from the delta start, s2 from the s1 state with
    unit diagonal, both over co-citation pairs; plus the structural
    claims (pages cited by the same sources score high; the hub cap
    removes a degenerate source)."""
    from itertools import product

    from ugfraud_spark.operators.simrank import simrank2

    # w1,w2 each cite {1,2}; w3 cites {2,3}; vertex 9 cites everything
    # (hub, dropped when max_out=3)
    edges = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 2), (12, 3),
             (9, 1), (9, 2), (9, 3), (9, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {(r["a"], r["b"]): r
           for r in simrank2(df, c=0.8, max_out=3).collect()}

    kept = [(s, d) for s, d in edges if s != 9]
    inn = defaultdict(set)
    for s, d in kept:
        inn[d].add(s)
    cand = {(a, b) for a in inn for b in inn
            if a < b and inn[a] & inn[b]}
    s1 = {(a, b): (0.8 * len(inn[a] & inn[b]))
          / (len(inn[a]) * len(inn[b]))
          for a, b in cand}

    def s1_micro(u, v):
        if u == v:
            return 1_000_000
        key = (min(u, v), max(u, v))
        return math.floor(s1[key] * 1e6) if key in s1 else 0

    assert set(out) == cand
    for (a, b), r in out.items():
        acc = sum(s1_micro(u, v) for u, v in product(inn[a], inn[b]))
        s2 = (0.8 * acc) / (len(inn[a]) * len(inn[b])) / 1e6
        assert r["n_common"] == len(inn[a] & inn[b])
        assert r["s1"] == s1[(a, b)]
        assert r["s2"] == s2, (a, b)
    # pages 1 and 2 share BOTH citers -> maximal s1 among pairs
    assert out[(1, 2)]["s1"] == max(r["s1"] for r in out.values())
    # the hub would have made (1, 4) a candidate pair; the cap drops it
    assert (1, 4) not in out


def test_hitting_time_chain_branch_dangling(spark):
    """Hand graph, exact integer replay: chain distances 1,2,3 to the
    seed; a dangling page pins at the horizon; a branching page
    averages its out-neighbors (micro-floor arithmetic)."""
    from ugfraud_spark.operators.trustrank import hitting_time

    # 3→2→1→0(seed); 5→0 and 5→4; 4 dangling
    edges = [(3, 2), (2, 1), (1, 0), (5, 0), (5, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "id long")
    out = {r["id"]: r for r in hitting_time(e, seeds, t=4).collect()}

    assert out[0]["h_micro"] == 0
    assert out[1]["hops"] == 1.0
    assert out[2]["hops"] == 2.0
    assert out[3]["hops"] == 3.0
    assert out[4]["hops"] == 4.0            # dangling → horizon
    # 5 averages h(0)=0 and h(4)=4: 1 + floor(4e6/2)/1e6 = 3.0
    assert out[5]["hops"] == 3.0
    assert set(out) == {0, 1, 2, 3, 4, 5}

    # python replay of the exact micro recursion on the same graph
    cap = 4_000_000
    outn = {3: [2], 2: [1], 1: [0], 5: [0, 4]}
    h = {v: (0 if v == 0 else cap) for v in range(6)}
    for _ in range(4):
        h = {v: 0 if v == 0 else
             (cap if v not in outn else
              min(cap, 1_000_000 + int(sum(h[u] for u in outn[v])
                                       * 1.0 // len(outn[v]))))
             for v in range(6)}
    assert {v: r["h_micro"] for v, r in out.items()} == h


def test_mis_hand_replay_and_properties(spark, sf_small):
    """MIS semantics are NOT inherited from the shared-formula oracle
    (house lesson: parity proves the decomposition, not the claim), so
    assert independence + maximality directly, plus a hand replay where
    the greedy order is forced."""
    from pyspark.sql import functions as F

    from ugfraud_spark.operators.mis import maximal_independent_set
    from ugfraud_spark.sources import tables

    # star: center 0 vs leaves 1..4 — either 0 alone or all leaves win,
    # decided purely by hashed priority; replay the priority here
    A, B, C, P = 1_103_515_245, 747_796_405, 2_891_336_453, 2_147_483_647

    def pri(v, seed=1):
        return ((v * A + C + seed) % P * A + B) % P

    star = spark.createDataFrame([(0, i) for i in range(1, 5)], "a long, b long")
    got = {r["vertex"]: r["mis_round"]
           for r in maximal_independent_set(star).collect()}
    if pri(0) < min(pri(i) for i in range(1, 5)):
        assert got == {0: 1}
    else:
        assert set(got) == {i for i in range(1, 5)} and 0 not in got

    # path 1-2-3: priority-ordered greedy, two rounds max; independence
    path = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    got = set(r["vertex"]
              for r in maximal_independent_set(path).collect())
    assert got in ({1, 3}, {2})
    assert (got == {2}) == (pri(2) < min(pri(1), pri(3))
                            or (pri(2) == min(pri(1), pri(3))))

    # real graph: independent + maximal
    und = tables.uni_edges_undirected(spark, sf_small)
    mis = {r["vertex"]
           for r in maximal_independent_set(und).collect()}
    edges = [(r["a"], r["b"]) for r in und.collect()]
    nbr: dict = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    assert all(not (a in mis and b in mis) for a, b in edges)
    assert all(v in mis or (nbr[v] & mis) for v in nbr)


def test_graph_summary_hand_replay(spark):
    """K4 plus a pendant: every field computed by hand."""
    from ugfraud_spark.operators.triangles import graph_summary

    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    und = spark.createDataFrame(edges, "a long, b long")
    r = graph_summary(und).collect()[0]
    # degrees: 1,2,3 -> 3; 4 -> 4; 5 -> 1
    assert r["n_vertices"] == 5
    assert r["n_edges"] == 7
    assert r["n_wedges"] == 3 * 3 + 6 + 0  # 3*C(3,2) + C(4,2) + C(1,2)
    assert r["n_triangles"] == 4  # K4
    assert r["transitivity"] == 3.0 * 4 / 15
    assert r["avg_degree"] == 2.0 * 7 / 5


def test_greedy_coloring_proper_and_complete(spark, sf_small):
    """Coloring semantics asserted directly (the oracle shares the
    formula): proper (no monochromatic edge), complete (every vertex
    colored), and color 1 is exactly the MIS-round-1 winner set."""
    from ugfraud_spark.operators.mis import greedy_coloring
    from ugfraud_spark.sources import tables

    # path with forced priority order pins the round-per-layer shape
    und = tables.uni_edges_undirected(spark, sf_small)
    colors = {r["vertex"]: r["color"]
              for r in greedy_coloring(und).collect()}
    edges = [(r["a"], r["b"]) for r in und.collect()]
    verts = {a for a, b in edges} | {b for a, b in edges}
    assert set(colors) == verts
    assert all(colors[a] != colors[b] for a, b in edges)

    # round-1 class = vertices beating ALL neighbors (local minima)
    A, B, C, P = 1_103_515_245, 747_796_405, 2_891_336_453, 2_147_483_647

    def pri(v):
        return (((v * A + C + 1) % P) * A + B) % P

    nbr: dict = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    minima = {v for v in verts
              if all((pri(v), v) < (pri(u), u) for u in nbr[v])}
    assert {v for v, c in colors.items() if c == 1} == minima


def test_neighbor_sample_semantics(spark):
    """Fan-out bounds, true-neighbor containment, shared hop-2
    sampling, and the salted two-phase == naive-window equivalence on
    a hub-skewed graph."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from ugfraud_spark.operators.walks import (
        WALK_A, WALK_B, WALK_C, WALK_P, neighbor_sample)

    # hub 0 -> 1..40 (degree >> f1, spans every salt bucket),
    # plus a 2-hop tail 1 -> {50, 51}, 2 -> {60}
    edges = [(0, i) for i in range(1, 41)] + [(1, 50), (1, 51), (2, 60)]
    e = spark.createDataFrame(edges, "src long, dst long")
    out = neighbor_sample(e, f1=3, f2=2, seed=7).collect()

    outn = defaultdict(set)
    for s, d in edges:
        outn[s].add(d)

    def pri(s, d, hop, seed=7):
        return ((s * WALK_A + d * WALK_B + seed + hop * WALK_C)
                % WALK_P * WALK_A + WALK_B) % WALK_P

    def naive(s, f, hop):
        return set(sorted(outn[s], key=lambda d: (pri(s, d, hop), d))[:f])

    hop1 = defaultdict(set)
    hop2 = defaultdict(set)
    for r in out:
        assert r["dst"] in outn[r["src"]]  # only true edges sampled
        (hop1 if r["hop"] == 1 else hop2)[(r["root"], r["src"])].add(r["dst"])

    # hop 1: exact top-f1 of the FULL adjacency (two-phase == naive),
    # min(outdeg, f1) rows per root
    for s in outn:
        assert hop1[(s, s)] == naive(s, 3, hop=1)
    assert len(hop1[(0, 0)]) == 3 and len(hop1[(2, 2)]) == 1

    # hop 2: exactly the shared per-vertex hop-2 sample of each sampled
    # hop-1 neighbor that has out-edges
    for (root, s), nbrs in hop1.items():
        for v1 in nbrs:
            want = naive(v1, 2, hop=2) if v1 in outn else set()
            assert hop2.get((root, v1), set()) == want

    # deterministic: a second run is row-identical
    again = neighbor_sample(e, f1=3, f2=2, seed=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_rich_club_hand_replay(spark):
    """phi from a hand-built graph: a 3-clique of hubs plus pendant
    leaves pushing hub degrees up."""
    from ugfraud_spark.operators.degrees import rich_club

    # hubs 0,1,2 form a triangle; each hub also has 2 pendant leaves
    edges = [(0, 1), (0, 2), (1, 2),
             (0, 10), (0, 11), (1, 12), (1, 13), (2, 14), (2, 15)]
    und = spark.createDataFrame(edges, "a long, b long")
    out = {r["k"]: r for r in rich_club(und, ks=(1, 2, 3)).collect()}
    # deg(hubs)=4, deg(leaves)=1
    # k=1: N=3 hubs (deg>1), E = 3 (triangle; leaf edges have min deg 1)
    assert (out[1]["n_k"], out[1]["e_k"]) == (3, 3)
    assert out[1]["phi"] == 1.0
    # k=3: hubs have deg 4 > 3 -> same club
    assert (out[3]["n_k"], out[3]["e_k"], out[3]["phi"]) == (3, 3, 1.0)
    # k=2 same
    assert out[2]["phi"] == 1.0
    # grid value above every degree: no club -> row omitted
    out2 = {r["k"] for r in rich_club(und, ks=(1, 4)).collect()}
    assert out2 == {1}


def test_degree_deciles_tie_sharing(spark):
    """All vertices of one degree share floor(10*below/n); buckets
    are monotone in degree."""
    from ugfraud_spark.operators.degrees import degree_deciles

    # star: center degree 9, nine leaves degree 1 -> n=10
    und = spark.createDataFrame([(0, i) for i in range(1, 10)],
                                "a long, b long")
    out = {r["id"]: (r["deg"], r["decile"])
           for r in degree_deciles(und).collect()}
    for leaf in range(1, 10):
        assert out[leaf] == (1, 0)       # below=0 -> bucket 0
    assert out[0] == (9, 9)              # below=9, floor(90/10)=9


def test_knn_curve_hand_replay(spark):
    """Star graph: leaves (deg 1) have avg neighbor degree n-1; the
    center's neighbors are all leaves (avg 1)."""
    from ugfraud_spark.operators.degrees import knn_curve

    und = spark.createDataFrame([(0, i) for i in range(1, 6)],
                                "a long, b long")
    out = {r["deg"]: r for r in knn_curve(und).collect()}
    assert out[1]["n_vertices"] == 5
    assert out[1]["avg_nbr_deg"] == 5.0   # every leaf touches the hub
    assert out[5]["n_vertices"] == 1
    assert out[5]["avg_nbr_deg"] == 1.0   # the hub touches only leaves

    # triangle + pendant: vertex degrees 2,2,3,1
    und2 = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long")
    out2 = {r["deg"]: r for r in knn_curve(und2).collect()}
    # deg-2 class = {1,2}: neighbors 2,3 and 1,3 -> (2+3+2+3)/4
    assert out2[2]["avg_nbr_deg"] == 10 / 4
    # deg-3 class = {3}: neighbors 1,2,4 -> (2+2+1)/3
    assert out2[3]["avg_nbr_deg"] == 5 / 3
    # deg-1 class = {4}: neighbor 3 -> 3
    assert out2[1]["avg_nbr_deg"] == 3.0


def test_butterflies_hand_replay(spark):
    """K(2,2) = 1 butterfly to each user; K(2,3) = C(3,2) = 3; a
    product above the cap contributes nothing."""
    from pyspark.sql import functions as F

    from ugfraud_spark.operators.triangles import butterflies

    def bip(rows):
        return spark.createDataFrame(
            [(u, p, 1.0, 1) for u, p in rows],
            "src long, dst long, weight double, sign int")

    # users 1,2 share products 100,101 -> one butterfly each
    k22 = bip([(1, 100), (1, 101), (2, 100), (2, 101)])
    out = {r["user"]: r["n_butterflies"] for r in butterflies(k22).collect()}
    assert out == {1: 1, 2: 1}

    # users 1,2 share products 100,101,102 -> C(3,2) = 3 each
    k23 = bip([(u, p) for u in (1, 2) for p in (100, 101, 102)])
    out = {r["user"]: r["n_butterflies"] for r in butterflies(k23).collect()}
    assert out == {1: 3, 2: 3}

    # three users share two products: 3 pairs x 1 butterfly; each user
    # is in 2 pairs -> 2 butterflies per user
    k32 = bip([(u, p) for u in (1, 2, 3) for p in (100, 101)])
    out = {r["user"]: r["n_butterflies"] for r in butterflies(k32).collect()}
    assert out == {1: 2, 2: 2, 3: 2}

    # cap: a mega-product shared by everyone is dropped pre-join
    capped = bip([(1, 100), (1, 101), (2, 100), (2, 101),
                  (1, 999), (2, 999), (3, 999)])
    out = {r["user"]: r["n_butterflies"]
           for r in butterflies(capped, max_deg=2).collect()}
    assert out == {1: 1, 2: 1}


def test_topic_ppr_matches_per_topic_personalized(spark):
    """The batched K-column kernel must hit personalized_pagerank's
    fixed point per topic EXACTLY (same join/agg plan per step, so the
    double arithmetic sequence is identical up to shuffle summation
    order — compare at 1e-12): batching is a physical optimization,
    not a semantic variant."""
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0), (5, 3)],
        "src long, dst long")
    topics = spark.createDataFrame(
        [(0, 0), (3, 1), (4, 1)], "id long, topic int")
    batched = {r["id"]: (r["v0"], r["v1"]) for r in
               pagerank.topic_ppr(e, topics, n_topics=2,
                                  max_iter=6).state.collect()}
    for t, seed_ids in ((0, [0]), (1, [3, 4])):
        seeds = spark.createDataFrame([(i,) for i in seed_ids], "id long")
        solo = {r["id"]: r["value"] for r in
                pagerank.personalized_pagerank(
                    e, seeds, max_iter=6).state.collect()}
        assert set(solo) == set(batched)
        for v in solo:
            assert abs(solo[v] - batched[v][t]) < 1e-12, (t, v)


def test_topic_ppr_empty_topic_raises(spark):
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    topics = spark.createDataFrame([(0, 0)], "id long, topic int")
    with pytest.raises(ValueError, match="topics \\[1\\] have no seed"):
        pagerank.topic_ppr(e, topics, n_topics=2, max_iter=2)


def test_cheirank_is_pagerank_of_transpose(spark):
    """CheiRank on a known asymmetric digraph: a pure 'emitter' hub
    (many out-links, no in-links) must top CheiRank while scoring the
    teleport floor on PageRank."""
    # 0 links to everyone; 1..4 chain weakly
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4)],
        "src long, dst long")
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    pr = {r["id"]: r["value"] for r in
          pagerank.pagerank(e, max_iter=8).state.collect()}
    chei = {r["id"]: r["value"] for r in
            pagerank.pagerank(rev, max_iter=8).state.collect()}
    assert max(chei, key=chei.get) == 0          # emitter tops CheiRank
    assert pr[0] == min(pr.values())             # ...and floors PageRank


def test_teleport_pagerank_reduces_to_pagerank_and_ppr(spark):
    """teleport_pagerank is characterized by its two degenerate cases:
    uniform weights reproduce plain PageRank, and an indicator weight
    vector reproduces personalized_pagerank on the same seed set (the
    generalization is exactly the τ column)."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (4, 0), (3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long")
    verts = sorted({u for ed in edges for u in ed})

    pr = {r["id"]: r["value"]
          for r in pagerank.pagerank(e, max_iter=8).state.collect()}
    w_uni = spark.createDataFrame([(v, 1.0) for v in verts],
                                  "id long, w double")
    tp = {r["id"]: r["value"]
          for r in pagerank.teleport_pagerank(e, w_uni, max_iter=8)
          .state.collect()}
    assert set(tp) == set(pr)
    assert all(abs(pr[k] - tp[k]) < 1e-12 for k in pr)

    seeds = spark.createDataFrame([(2,), (4,)], "id long")
    ppr = {r["id"]: r["value"]
           for r in pagerank.personalized_pagerank(e, seeds, max_iter=8)
           .state.collect()}
    # any equal positive weight on the seed set normalizes to the same τ
    w_ind = spark.createDataFrame([(2, 7.0), (4, 7.0)], "id long, w double")
    tpi = {r["id"]: r["value"]
           for r in pagerank.teleport_pagerank(e, w_ind, max_iter=8)
           .state.collect()}
    assert set(tpi) == set(ppr)
    assert all(abs(ppr[k] - tpi[k]) < 1e-12 for k in ppr)


def test_teleport_pagerank_guards_and_bias(spark):
    """Weights outside the vertex set are dropped (and all-outside
    raises); biased teleport moves rank toward the weighted vertex."""
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                              "src long, dst long")
    with pytest.raises(ValueError):
        pagerank.teleport_pagerank(
            e, spark.createDataFrame([(99, 1.0)], "id long, w double"),
            max_iter=2)
    # weight on 2 plus an ignored out-of-graph id; the 3-cycle needs
    # ~25 iterations for the concentrated start r_0 = τ to stop
    # oscillating around the fixed point r(2) = 0.15/(1-0.85³) ≈ 0.389
    w = spark.createDataFrame([(2, 3.0), (99, 5.0)], "id long, w double")
    biased = {r["id"]: r["value"]
              for r in pagerank.teleport_pagerank(e, w, max_iter=25)
              .state.collect()}
    uniform = {r["id"]: r["value"]
               for r in pagerank.pagerank(e, max_iter=8).state.collect()}
    assert biased[2] > uniform[2]


def test_pagerank_from_uniform_init_equals_cold_start(spark):
    """pagerank_from seeded with the uniform vector IS plain pagerank
    (same recurrence, same iteration count) — exact to the bit."""
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (4, 0), (3, 4)],
        "src long, dst long")
    cold = {r["id"]: r["value"]
            for r in pagerank.pagerank(e, max_iter=4).state.collect()}
    init = spark.createDataFrame([(v, 1.0 / 5) for v in range(5)],
                                 "id long, value double")
    warm = {r["id"]: r["value"]
            for r in pagerank.pagerank_from(e, init, max_iter=4)
            .state.collect()}
    assert warm == cold


def test_pagerank_warm_start_converges_faster_and_seeds_new_pages(spark):
    """The recrawl pattern: k warm supersteps from yesterday's converged
    vector land closer to today's fixed point than k cold supersteps;
    vertices absent from init start at 1/N_new; init rows for vanished
    pages are dropped."""
    # 60-vertex ring + chords; today's delta: one new chord and one new
    # page (60) — small relative to the graph, the recrawl regime
    old_edges = [(i, (i + 1) % 60) for i in range(60)] + [
        (i, (i * 7 + 3) % 60) for i in range(0, 60, 5)
        if i != (i * 7 + 3) % 60]
    new_edges = old_edges + [(7, 23), (60, 0), (0, 60)]
    e_old = spark.createDataFrame(old_edges, "src long, dst long")
    e_new = spark.createDataFrame(new_edges, "src long, dst long")

    old_rank = pagerank.pagerank(e_old, max_iter=40).state
    # stale row for a vanished page must not leak into the output
    stale = old_rank.unionAll(
        spark.createDataFrame([(999, 0.5)], "id long, value double"))
    fixed = {r["id"]: r["value"]
             for r in pagerank.pagerank(e_new, max_iter=60).state.collect()}

    k = 3
    warm = {r["id"]: r["value"]
            for r in pagerank.pagerank_from(e_new, stale, max_iter=k)
            .state.collect()}
    cold = {r["id"]: r["value"]
            for r in pagerank.pagerank(e_new, max_iter=k).state.collect()}
    assert set(warm) == set(fixed) and 999 not in warm
    d_warm = sum(abs(warm[v] - fixed[v]) for v in fixed)
    d_cold = sum(abs(cold[v] - fixed[v]) for v in fixed)
    assert d_warm < d_cold / 2

    # zero warm supersteps exposes the init itself: new page 60 at 1/N_new
    seeded = {r["id"]: r["value"]
              for r in pagerank.pagerank_from(e_new, stale, max_iter=0)
              .state.collect()}
    assert abs(seeded[60] - 1.0 / 61) < 1e-15


def test_inlink_concentration_hand_case(spark):
    """Single-source host (hhi = top_share = 1) vs diversified host;
    intra-host self-links excluded from every ratio."""
    from ugfraud_spark.operators import quotient

    rows = [
        # farm -> target: one source host supplies everything
        (7, 1, 40),
        (1, 1, 99),          # self-links: must not count
        # diversified: three sources with 2/1/1 links
        (5, 2, 2), (6, 2, 1), (7, 2, 1),
    ]
    he = spark.createDataFrame(
        rows, "src_host long, dst_host long, n_links long")
    got = {r["host"]: r for r in quotient.inlink_concentration(he).collect()}
    assert set(got) == {1, 2}
    assert got[1]["in_links"] == 40 and got[1]["n_src_hosts"] == 1
    assert got[1]["top_share"] == 1.0 and got[1]["hhi"] == 1.0
    assert got[2]["in_links"] == 4 and got[2]["n_src_hosts"] == 3
    assert got[2]["top_share"] == 0.5
    assert abs(got[2]["hhi"] - round((4 + 1 + 1) / 16, 6)) < 1e-12


def test_oddball_egonet_vs_numpy(spark):
    """OddBall on a star + clique + path composite, cross-checked
    against an independent numpy OLS with the identical 6dp-rounding
    schedule: the clique core and the star hub must carry the largest
    EDPL deviations in the expected direction."""
    import numpy as np

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    star = [(10, v) for v in range(11, 17)]          # hub 10, 6 leaves
    path = [(20, 21), (21, 22), (22, 23)]
    bridge = [(3, 10), (16, 20)]                      # keep it connected
    edges = clique + star + path + bridge
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["id"]: r for r in
           triangles.oddball_egonet(df).collect()}

    deg, tri = {}, {}
    verts = sorted({v for e in edges for v in e})
    for v in verts:
        nb = {b for a, b in edges if a == v} | {a for a, b in edges if b == v}
        deg[v] = len(nb)
        tri[v] = sum(1 for a, b in edges if a in nb and b in nb)
    x = np.round(np.log([deg[v] + 1 for v in verts]), 6)
    y = np.round(np.log([deg[v] + tri[v] for v in verts]), 6)
    n = float(len(verts))
    sx, sy = x.sum(), y.sum()
    sxy = np.round(x * y, 6).sum()
    sxx = np.round(x * x, 6).sum()
    b = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    a = round((sy - b * sx) / n, 6)
    for i, v in enumerate(verts):
        assert out[v]["n_ego"] == deg[v] + 1
        assert out[v]["e_ego"] == deg[v] + tri[v]
        assert out[v]["score"] == pytest.approx(
            round(abs(y[i] - (a + b * x[i])), 6), abs=2e-6)
    # clique members sit ABOVE the line (dense egonet), star leaves on
    # the sparse side; both anomaly families must out-score the path
    # interior, whose egonet is exactly tree-like
    assert out[0]["score"] > out[21]["score"]
    assert out[10]["score"] > out[21]["score"]


def test_coreness_vs_bruteforce_with_cap(spark):
    """Coreness on nested cliques + a path, against an independent
    brute-force peel: K10's core number 9 is CAPPED to k_max=8 (the
    documented contract), K4's is exact (3), path vertices are 1."""
    from ugfraud_spark.operators import hits as H

    k10 = [(a, b) for a in range(10) for b in range(a + 1, 10)]
    k4 = [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
    path = [(30, 31), (31, 32)]
    edges = k10 + k4 + path
    und = spark.createDataFrame(edges, "a long, b long")
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")) \
             .unionAll(und.select(F.col("b").alias("src"),
                                  F.col("a").alias("dst")))
    out = {r["id"]: r["coreness"] for r in H.coreness(sym).collect()}

    import collections
    alive = {v for e in edges for v in e}
    es = set(edges)
    true_core = {v: 1 for v in alive}
    k = 1
    while alive:
        k += 1
        while True:
            deg = collections.Counter()
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            rem = {v for v in alive if deg[v] < k}
            if not rem:
                break
            alive -= rem
            es = {(a, b) for a, b in es if a in alive and b in alive}
        if not alive:
            break
        for v in alive:
            true_core[v] = k
    assert out == {v: min(c, H.CORENESS_K_MAX)
                   for v, c in true_core.items()}
    assert out[0] == 8 and out[20] == 3 and out[31] == 1


def test_bloom_admission_one_sided_error(spark):
    """Bloom admission on a synthetic doc range: the filter may claim
    unseen urls are seen (false positives — present by construction at
    the pinned m) but NEVER the converse; flags are internally
    consistent and the run is deterministic."""
    from ugfraud_spark.operators import crawl

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text"),
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.lit(1).alias("n_chars"))
    rows = crawl.bloom_admission_demo(docs).collect()
    assert rows
    for r in rows:
        # one-sidedness: exact-seen urls always pass the Bloom probe
        if r["exact_seen"] == 1:
            assert r["bloom_seen"] == 1
        assert r["false_pos"] == (
            1 if (r["bloom_seen"] == 1 and r["exact_seen"] == 0) else 0)
    n_fp = sum(r["false_pos"] for r in rows)
    n_new = sum(1 for r in rows if r["exact_seen"] == 0)
    assert 0 < n_fp < n_new  # both error branches carry mass
    again = crawl.bloom_admission_demo(docs).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_hrw_minimal_disruption_and_balance(spark):
    """Rendezvous hashing: removing the last node moves EXACTLY that
    node's hosts (no collateral reassignment), movers land only on
    surviving nodes, and the load spread is hash-uniform (no node
    holds more than 2x the fair share at 200 hosts / 5 nodes)."""
    import collections

    from ugfraud_spark.operators import crawl

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    rows = crawl.hrw_sharding_demo(docs).collect()
    assert len(rows) == 200
    for r in rows:
        assert (r["moved"] == 1) == (r["node"] == crawl.HRW_NODES - 1)
        if r["moved"] == 1:
            assert 0 <= r["node_after"] < crawl.HRW_NODES - 1
        else:
            assert r["node_after"] == r["node"]
    load = collections.Counter(r["node"] for r in rows)
    assert set(load) == set(range(crawl.HRW_NODES))
    assert max(load.values()) <= 2 * (200 // crawl.HRW_NODES)


def _tarjan(edges):
    import collections
    adj = collections.defaultdict(list)
    verts = set()
    for a, b in edges:
        adj[a].append(b)
        verts.add(a)
        verts.add(b)
    index, low, onstk, stk, out = {}, {}, {}, [], {}
    ctr = [0]
    for s in verts:
        if s in index:
            continue
        work = [(s, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = ctr[0]
                ctr[0] += 1
                stk.append(v)
                onstk[v] = True
            advanced = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if onstk.get(w):
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stk.pop()
                    onstk[w] = False
                    comp.append(w)
                    if w == v:
                        break
                rep = min(comp)
                for w in comp:
                    out[w] = rep
            work.pop()
            if work:
                u, _ = work[-1]
                low[u] = min(low[u], low[v])
    return out


def test_scc_labels_match_tarjan_at_sf0001(spark, sf_small):
    """The certified SCC labels on the sf0.001 link graph equal
    brute-force Tarjan exactly, with ZERO uncertified residue — the
    one-giant-SCC + acyclic-periphery regime the op targets. (The
    giant component contains the min id, so pivot-rep == min-rep.)"""
    from ugfraud_spark.operators import bowtie as bt
    from ugfraud_spark.sources import tables

    e = tables.uni_edges_directed(spark, sf_small)
    got = {r["id"]: (r["scc_id"], r["certified"])
           for r in bt.scc_labels(e).collect()}
    truth = _tarjan([(r["src"], r["dst"]) for r in e.collect()])
    assert all(c == 1 for _, c in got.values())
    assert {v: s for v, (s, _) in got.items()} == truth


def test_scc_labels_flags_offpivot_cycle(spark):
    """An off-pivot cycle that the trim cannot peel comes back as
    UNCERTIFIED residue — never silently mislabeled — while the pivot
    cycle and the DAG tail certify exactly."""
    from ugfraud_spark.operators import bowtie as bt

    edges = [(0, 1), (1, 2), (2, 0),      # pivot SCC {0,1,2}
             (2, 3), (3, 4),              # DAG tail: singletons
             (10, 11), (11, 10)]          # off-pivot 2-cycle
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r for r in bt.scc_labels(e).collect()}
    for v in (0, 1, 2):
        assert got[v]["scc_id"] == 0 and got[v]["certified"] == 1
    for v in (3, 4):
        assert got[v]["scc_id"] == v and got[v]["certified"] == 1
    for v in (10, 11):
        assert got[v]["certified"] == 0


def test_label_spreading_vs_numpy(spark):
    """Clamped-harmonic spread on two bridged cliques, one seeded
    class-0 (vertex 0) and one class-1 (vertex 13): the replication of
    the exact iteration in numpy matches to the 6dp round, and each
    clique's unlabeled members lean toward their seed's class."""
    import collections

    from ugfraud_spark.operators import labelprop as LP

    ca = [(a, b) for a in (0, 1, 2, 3) for b in (0, 1, 2, 3) if a < b]
    cb = [(a, b) for a in (13, 14, 15, 16) for b in (13, 14, 15, 16)
          if a < b]
    edges = ca + cb + [(3, 14)]
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["id"]: r for r in LP.label_spreading(df).collect()}

    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    verts = sorted(adj)

    def clamp(v, x):
        return float(v % 2) if v % 13 == 0 else x

    f = {v: clamp(v, 0.5) for v in verts}
    for _ in range(LP.LS_ITERS):
        nf = {v: clamp(v, sum(f[u] for u in adj[v]) / len(adj[v]))
              for v in verts}
        f = nf
    for v in verts:
        assert out[v]["score"] == pytest.approx(round(f[v], 6), abs=2e-6)
        assert out[v]["is_seed"] == (1 if v % 13 == 0 else 0)
    assert all(out[v]["score"] < 0.5 for v in (1, 2))       # clique A
    assert all(out[v]["score"] > 0.5 for v in (15, 16))     # clique B


def test_birank_vs_numpy(spark):
    """BiRank on a hand bipartite graph equals the dense numpy
    iteration of the paper's recurrence with the same hash priors and
    final 6dp round."""
    import numpy as np

    from ugfraud_spark.operators import birank as br
    from ugfraud_spark.sources.tables import PRIOR_MOD, PRIOR_MULT

    edges = [(1, 101), (1, 102), (2, 101), (3, 102), (3, 103), (4, 103)]
    bip = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, weight double")
    got = {r["id"]: r["birank"] for r in br.birank(bip).collect()}

    users = sorted({s for s, _ in edges})
    prods = sorted({d for _, d in edges})
    W = np.zeros((len(users), len(prods)))
    for s, d in edges:
        W[users.index(s), prods.index(d)] = 1.0
    du, dp = W.sum(1), W.sum(0)
    S = W / np.sqrt(np.outer(du, dp))

    def prior(ids):
        return np.array([((i * PRIOR_MULT) % PRIOR_MOD) / PRIOR_MOD
                         for i in ids])

    u0, p0 = prior(users), prior(prods)
    u, a = u0.copy(), br.BIRANK_ALPHA
    for _ in range(br.BIRANK_ITERS):
        p = a * (S.T @ u) + (1 - a) * p0
        u = a * (S @ p) + (1 - a) * u0
    for i, v in enumerate(users):
        assert got[v] == pytest.approx(round(u[i], 6), abs=2e-6)
    for j, q in enumerate(prods):
        assert got[q] == pytest.approx(round(p[j], 6), abs=2e-6)


def test_degree_entropy_known_distributions(spark):
    """Entropy closed forms: a regular in-degree distribution scores
    0; a clean 50/50 split of two in-degrees scores ln 2 under the
    6dp term rounding."""
    import math

    from ugfraud_spark.operators import degrees as D

    # 4 targets each of in-degree 2: sources are fresh odd ids so they
    # add no in-degree of their own
    reg = [(100 + i, t) for t in (1, 2, 3, 4) for i in (0, 10)]
    e = spark.createDataFrame(reg, "src long, dst long")
    r = D.degree_entropy(e).collect()[0]
    assert (r["n_vertices"], r["n_degrees"]) == (4, 1)
    assert r["entropy"] == 0.0

    # two targets of degree 1, two of degree 3 -> H = ln 2
    mix = [(200, 1), (201, 2)] + \
          [(210 + i, 3) for i in range(3)] + [(220 + i, 4) for i in range(3)]
    e2 = spark.createDataFrame(mix, "src long, dst long")
    r2 = D.degree_entropy(e2).collect()[0]
    assert (r2["n_vertices"], r2["n_degrees"]) == (4, 2)
    assert r2["entropy"] == pytest.approx(
        2 * round(0.5 * math.log(2), 6), abs=2e-6)


def test_wl_refinement_collapses_symmetric_vertices(spark):
    """1-WL invariants on a star + path + twin triangles: leaves of
    the star are interchangeable (one class of 5), the path pairs up
    by mirror symmetry, and the two disjoint triangles fuse into a
    single class of 6 (the classic 1-WL blind spot, asserted as
    such)."""
    from ugfraud_spark.operators import labelprop as LP

    star = [(0, v) for v in range(1, 6)]
    path = [(10, 11), (11, 12), (12, 13), (13, 14)]
    tri2 = [(20, 21), (21, 22), (20, 22), (30, 31), (31, 32), (30, 32)]
    df = spark.createDataFrame(star + path + tri2, "a long, b long")
    out = {r["id"]: r for r in LP.wl_refinement(df).collect()}

    leaf_colors = {out[v]["wl_color"] for v in range(1, 6)}
    assert len(leaf_colors) == 1 and out[1]["class_size"] == 5
    assert out[0]["wl_color"] not in leaf_colors
    assert out[10]["wl_color"] == out[14]["wl_color"]
    assert out[11]["wl_color"] == out[13]["wl_color"]
    assert len({out[v]["wl_color"] for v in (10, 11, 12)}) == 3
    tri_colors = {out[v]["wl_color"] for v in (20, 21, 22, 30, 31, 32)}
    assert len(tri_colors) == 1 and out[20]["class_size"] == 6


def test_graphlet_orbits3_vs_bruteforce(spark):
    """Orbit closed forms vs direct enumeration on a clique+path+star
    composite: o0..o3 counted by brute force over all vertex triples
    must match the degree/neighbor-degree/triangle derivation."""
    import itertools

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    star = [(10, v) for v in (11, 12, 13)]
    path = [(3, 10), (13, 20), (20, 21)]
    edges = clique + star + path
    df = spark.createDataFrame(edges, "a long, b long")
    out = {r["id"]: r for r in
           triangles.graphlet_orbits3(df).collect()}

    es = {tuple(sorted(e)) for e in edges}
    verts = sorted({v for e in edges for v in e})
    adj = {v: {b for a, b in es if a == v} | {a for a, b in es if b == v}
           for v in verts}
    o = {v: [0, 0, 0, 0] for v in verts}
    for v in verts:
        o[v][0] = len(adj[v])
    for x, y, z in itertools.combinations(verts, 3):
        e_xy = (min(x, y), max(x, y)) in es
        e_xz = (min(x, z), max(x, z)) in es
        e_yz = (min(y, z), max(y, z)) in es
        k = e_xy + e_xz + e_yz
        if k == 3:
            for v in (x, y, z):
                o[v][3] += 1
        elif k == 2:
            # the center is the vertex on both edges
            if e_xy and e_xz:
                c = x
            elif e_xy and e_yz:
                c = y
            else:
                c = z
            for v in (x, y, z):
                if v == c:
                    o[v][2] += 1
                elif (min(v, c), max(v, c)) in es:
                    o[v][1] += 1
    for v in verts:
        got = (out[v]["o0"], out[v]["o1"], out[v]["o2"], out[v]["o3"])
        assert got == tuple(o[v]), (v, got, o[v])


def test_greedy_matching_equals_sequential_greedy(spark):
    """The parallel handshake equals the sequential greedy scan in
    (h, a, b) priority order (the dominant-edge lemma), the result is
    a valid matching, and it is maximal: every unmatched edge touches
    a matched endpoint."""
    from ugfraud_spark.operators import mis as M

    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
             (2, 7), (8, 9)]
    und = spark.createDataFrame(edges, "a long, b long")
    got = {(r["a"], r["b"]) for r in M.greedy_matching(und).collect()}

    def h(a, b):
        v = a * 131 + b
        return ((v * M.MIS_A + M.MIS_C + 1) % M.MIS_P
                * M.MIS_A + M.MIS_B) % M.MIS_P

    free = {v for e in edges for v in e}
    want = set()
    for a, b in sorted(edges, key=lambda e: (h(*e), e[0], e[1])):
        if a in free and b in free:
            want.add((a, b))
            free -= {a, b}
    assert got == want
    used = [v for e in got for v in e]
    assert len(used) == len(set(used))          # valid matching
    for a, b in edges:                           # maximality
        assert a not in free or b not in free


def test_scan_roles_hand_graph(spark):
    """Two cliques bridged by one vertex: clique members are cores of
    two distinct clusters, the bridge is a HUB (ε-attached to both),
    and an isolated pendant pair stays outliers (ε-similarity to a
    non-core confers nothing)."""
    from ugfraud_spark.operators import scan as S

    ka = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    kb = [(a, b) for a in (11, 12, 13, 14) for b in (11, 12, 13, 14)
          if a < b]
    bridge = [(1, 20), (11, 20)]
    pendant = [(30, 31)]
    df = spark.createDataFrame(ka + kb + bridge + pendant,
                               "a long, b long")
    out = {r["id"]: r for r in
           S.scan_classify(df, eps=0.5, mu=3).collect()}
    for v in (1, 2, 3, 4):
        assert out[v]["role"] == "core" and out[v]["cluster"] == 1
    for v in (11, 12, 13, 14):
        assert out[v]["role"] == "core" and out[v]["cluster"] == 11
    assert out[20]["role"] == "hub" and out[20]["cluster"] == -1
    for v in (30, 31):
        assert out[v]["role"] == "outlier" and out[v]["cluster"] == -1


def test_trussness_vs_bruteforce(spark):
    """Capped truss sweep vs brute-force peel on K5 + a triangle with
    a pendant: K5 edges are 5-truss (capped contract exercised at
    k_max=4 -> 4), the lone triangle's edges are 3, the pendant 2."""
    import collections

    from ugfraud_spark.operators import triangles as T

    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tri = [(10, 11), (11, 12), (10, 12)]
    pend = [(12, 20)]
    edges = k5 + tri + pend
    df = spark.createDataFrame(edges, "a long, b long")
    got = {(r["a"], r["b"]): r["trussness"]
           for r in T.trussness(df, k_max=4).collect()}

    es = {tuple(sorted(e)) for e in edges}
    truth = {e: 2 for e in es}
    cur, k = set(es), 2
    while cur and k < 4:
        k += 1
        while True:
            adj = collections.defaultdict(set)
            for a, b in cur:
                adj[a].add(b)
                adj[b].add(a)
            drop = {e for e in cur
                    if len(adj[e[0]] & adj[e[1]]) < k - 2}
            if not drop:
                break
            cur -= drop
        for e in cur:
            truth[e] = k
    assert got == truth
    assert all(got[e] == 4 for e in k5)  # true 5-truss, capped to 4
    assert all(got[tuple(sorted(e))] == 3 for e in tri)
    assert got[(12, 20)] == 2
