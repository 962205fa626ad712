"""HyperBall-style neighborhood function over the undirected link graph.

Estimates every vertex's ball size |B(v, t)| (vertices within t hops,
self included) with a per-vertex HyperLogLog register vector — the
Boldi–Rosa–Vigna WWW'11 algorithm behind the published Common-Crawl
web-graph distance/diameter numbers, and the standard way to get
centrality-flavoured statistics out of a 10^12-edge graph where exact
per-vertex BFS is impossible.

Spark shape: m = 16 registers are carried as 16 integer COLUMNS (the
same layout the SpEagle kernel uses for its 8 message columns) so each
superstep is ONE groupBy(id) with 16 ``max`` aggregates — max is
associative, so the shuffle gets full map-side combine; the neighbor
fold is an edge⋈state hash join on the pre-partitioned edge key. At a
larger m (say 64 for ±13% error) the same plan holds with the
registers packed into a binary column and a zip-max; 16 keeps the
whole loop in whole-stage codegen here.

Cross-engine determinism (the DuckDB oracle mirrors every step): the
register hash is md5-hex STRING math — bucket = value of the first
nibble, rho = 1 + number of leading zero BITS of the next 48, computed
with ``TRIM(LEADING '0' ...)`` plus a per-nibble CASE — no
engine-specific integer hashing anywhere. The estimator is the
standard HLL one: alpha_16·m²/Σ2^-r with the small-range
linear-counting branch, every float step written in the same order on
both engines (the 2^-r terms are exact dyadic doubles).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import symmetrize

HB_M = 16          # registers (p = 4); relative std err ~ 1.04/sqrt(m)
HB_ALPHA = 0.673   # HLL bias constant for m = 16
_REGS = [f"c{j}" for j in range(HB_M)]


def hll_bucket_rho(df: DataFrame, id_col: str = "id",
                   carry: tuple[str, ...] = ("id",)) -> DataFrame:
    """(carry..., bucket, rho) from the md5 hex of ``id_col`` rendered
    as its DECIMAL string (both engines render bigint→string
    identically); rho's leading-zero-bit count is pure ANSI string
    math so the oracle can share it verbatim. Shared by the HyperBall
    register init and the streaming windowed-distinct sketch."""
    h = F.md5(F.col(id_col).cast("string"))
    with_h = df.select(*carry, h.alias("h")).select(
        *carry,
        F.conv(F.substring("h", 1, 1), 16, 10).cast("int").alias("bucket"),
        F.expr("trim(LEADING '0' FROM substring(h, 2, 12))").alias("t"),
    )
    first = F.substring("t", 1, 1)
    lz4 = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(F.length("t") == 0, F.lit(49)).otherwise(
        (F.lit(12) - F.length("t")) * 4 + lz4 + 1
    )
    return with_h.select(*carry, "bucket", rho.alias("rho"))


def _register_init(verts: DataFrame) -> DataFrame:
    """(id, c0..c15): each vertex's own-hash one-hot register vector."""
    hb = hll_bucket_rho(verts, "id", carry=("id",))
    return hb.select(
        "id",
        *[
            F.when(F.col("bucket") == j, F.col("rho"))
            .otherwise(F.lit(0)).alias(f"c{j}")
            for j in range(HB_M)
        ],
    )


def hyperball_states(edges_ab: DataFrame, t: int = 3):
    """Yields ``(r, state)`` for r = 0..t, where ``state`` is the
    (id, c0..c15) register frame after r rounds — the shared loop body
    behind ``hyperball`` (final state) and ``nf_curve`` (every round).

    Each round: registers flow across every edge (both directions),
    fold with the vertex's own registers via groupBy-max — one shuffle
    per round, map-side combined; the edge side is colocated on its
    join key once and checkpointed, the state is checkpointed per round
    for lineage truncation (fd-limit discipline like every other
    superstep kernel here)."""
    verts = (
        edges_ab.select(F.col("a").alias("id"))
        .unionAll(edges_ab.select(F.col("b").alias("id")))
        .distinct()
    )
    state = (
        _register_init(verts).repartition("id").localCheckpoint(eager=True)
    )
    yield 0, state
    sym = (
        symmetrize(edges_ab.select("a", "b"))
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    for r in range(1, t + 1):
        msgs = sym.join(
            state.withColumnRenamed("id", "src").hint("shuffle_hash"), "src"
        ).select(F.col("dst").alias("id"), *_REGS)
        state = (
            msgs.unionAll(state)
            .groupBy("id")
            .agg(*[F.max(c).alias(c) for c in _REGS])
            .localCheckpoint(eager=True)
        )
        yield r, state


def hyperball(edges_ab: DataFrame, t: int = 3) -> DataFrame:
    """(id, c0..c15): HLL registers of every vertex's radius-``t`` ball
    over the undirected graph ``edges_ab(a, b)``."""
    state = None
    for _, state in hyperball_states(edges_ab, t):
        pass
    return state


def hll_estimate_expr():
    """The HLL estimate Column read off c0..c15 register columns —
    alpha_16·m²/Z with the linear-counting small-range branch, rounded
    to 6 dp (term order fixed so both engines sum identical doubles)."""
    z = None
    v = None
    for c in _REGS:
        pz = F.pow(F.lit(2.0), -F.col(c))
        pv = F.when(F.col(c) == 0, 1).otherwise(0)
        z = pz if z is None else z + pz
        v = pv if v is None else v + pv
    raw = F.lit(HB_ALPHA) * F.lit(float(HB_M * HB_M)) / z
    est = F.when(
        (raw <= F.lit(2.5 * HB_M)) & (v > 0),
        F.lit(float(HB_M)) * F.log(F.lit(float(HB_M)) / v.cast("double")),
    ).otherwise(raw)
    return F.round(est, 6)


def ball_estimates(registers: DataFrame) -> DataFrame:
    """(id, ball_est): the HLL estimate read off a register frame."""
    return registers.select("id", hll_estimate_expr().alias("ball_est"))


def nf_curve(edges_ab: DataFrame, t: int = 3) -> DataFrame:
    """(t, nf_est): the neighborhood function NF(r) = Σ_v |B(v, r)| for
    r = 0..t — the curve the Common-Crawl web-graph distance statistics
    are read off (Boldi–Rosa–Vigna). Each point is one scalar aggregate
    over that round's checkpointed register frame.

    Cross-engine determinism: per-vertex estimates are already rounded
    to 6 dp, so they are summed EXACTLY as DECIMAL(28,6) (decimal
    addition is associative — no float summation-order sensitivity),
    then read back as a rounded double."""
    parts = []
    for r, state in hyperball_states(edges_ab, t):
        nf = (
            ball_estimates(state)
            .agg(
                F.round(
                    F.sum(F.col("ball_est").cast("decimal(28,6)"))
                    .cast("double"),
                    6,
                ).alias("nf_est")
            )
            .select(F.lit(r).cast("int").alias("t"), "nf_est")
        )
        parts.append(nf)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def harmonic_centrality(edges_ab: DataFrame, t: int = 3) -> DataFrame:
    """(id, harmonic): HyperBall's headline application (Boldi–Vigna):
    harmonic centrality Σ_{u≠v} 1/d(u,v) estimated from the ball-size
    deltas, harm(v) ≈ Σ_{r=1..t} (|B(v,r)| − |B(v,r−1)|)/r — the
    centrality the Common-Crawl host rankings publish, computable where
    exact all-pairs distances are impossible.

    Each round's estimate frame is already hash-partitioned on id (it
    ends in a groupBy), so the t+1-way id join re-uses the layout.

    Float discipline — this one is a trap: the ball estimates are
    already exact 6-dp decimals, so EVERY naively-rounded intermediate
    ((Δ/r) rounded, or the rounded term sum) lands EXACTLY on .5e-6
    rounding ties, where Spark's BigDecimal HALF_UP and DuckDB's
    double rounding disagree (measured: 114/9931 vertices flipped at
    sf0.01). So no rounding happens at all: deltas are EXACT decimal
    subtractions, each is scaled by the integer lcm(1..t)/r (exact),
    summed in decimal (exact), and ONE double division by lcm at the
    end — deterministic IEEE on identical inputs, zero tie sites."""
    ests = [
        ball_estimates(state).withColumnRenamed("ball_est", f"e{r}")
        for r, state in hyperball_states(edges_ab, t)
    ]
    df = ests[0]
    for e in ests[1:]:
        df = df.join(e, "id")
    lcm = math.lcm(*range(1, t + 1))
    harm = None
    for r in range(1, t + 1):
        delta = (
            F.col(f"e{r}").cast("decimal(28,6)")
            - F.col(f"e{r-1}").cast("decimal(28,6)")
        )
        term = delta * F.lit(lcm // r)
        harm = term if harm is None else harm + term
    return df.select(
        "id",
        (harm.cast("double") / F.lit(float(lcm))).alias("harmonic"),
    )


def closeness_lin(edges_ab: DataFrame, t: int = 3) -> DataFrame:
    """(id, sum_dist, reachable, closeness, lin): the OTHER HyperBall
    centralities (Boldi–Vigna §3): total distance T(v) ≈
    Σ_{r=1..t} r·(|B(v,r)|−|B(v,r−1)|), the reachable count
    |B(v,t)|−1, classic closeness 1/T(v), and Lin's index
    reachable²/T(v) — the variant that doesn't degenerate on graphs
    with many small components (isolated vertices get Lin = 1 by
    definition, closeness = 0).

    Float discipline (same trap as ``harmonic_centrality``): ball
    estimates are exact 6-dp decimals, so sum_dist is built from exact
    decimal subtractions scaled by the INTEGER radius and summed
    exactly — no rounding site at all. closeness and lin are then
    single IEEE divisions of deterministic doubles (numerator and
    denominator are partitioning-independent exact decimals), so the
    raw quotient is itself deterministic and is NOT re-rounded —
    ROUND here could land on a .5e-6 tie (the inputs are exact
    decimals by construction)."""
    ests = [
        ball_estimates(state).withColumnRenamed("ball_est", f"e{r}")
        for r, state in hyperball_states(edges_ab, t)
    ]
    df = ests[0]
    for e in ests[1:]:
        df = df.join(e, "id")
    sum_dist = None
    for r in range(1, t + 1):
        delta = (
            F.col(f"e{r}").cast("decimal(28,6)")
            - F.col(f"e{r-1}").cast("decimal(28,6)")
        )
        term = delta * F.lit(r)
        sum_dist = term if sum_dist is None else sum_dist + term
    reach = F.col(f"e{t}").cast("decimal(28,6)") - F.lit(1)
    sd = sum_dist.cast("double")
    rc = reach.cast("double")
    return df.select(
        "id",
        sd.alias("sum_dist"),
        rc.alias("reachable"),
        F.when(sd == F.lit(0.0), F.lit(0.0))
        .otherwise(F.lit(1.0) / sd).alias("closeness"),
        F.when(sd == F.lit(0.0), F.lit(1.0))
        .otherwise(rc * rc / sd).alias("lin"),
    )


def effective_diameter(nf: DataFrame, alpha: float = 0.9) -> DataFrame:
    """(eff_diam): the α-effective diameter read off an ``nf_curve``
    frame — the smallest t with NF(t) ≥ α·NF(t_max), linearly
    interpolated between the straddling curve points (WebGraph's
    ``NeighbourhoodFunction.effectiveDiameter`` convention). 4-row
    input → TakeOrdered(1); nothing here scales with the graph."""
    tmax = nf.orderBy(F.desc("t")).limit(1).select(
        (F.col("nf_est") * F.lit(alpha)).alias("target")
    )
    prev = nf.select(
        (F.col("t") + 1).alias("t"), F.col("nf_est").alias("prev")
    )
    cand = (
        nf.join(prev, "t", "left")
        .crossJoin(F.broadcast(tmax))
        .where(F.col("nf_est") >= F.col("target"))
        .orderBy("t")
        .limit(1)
    )
    d = F.when(F.col("t") == 0, F.lit(0.0)).otherwise(
        (F.col("t") - 1)
        + (F.col("target") - F.col("prev"))
        / (F.col("nf_est") - F.col("prev"))
    )
    return cand.select(F.round(d, 6).alias("eff_diam"))
