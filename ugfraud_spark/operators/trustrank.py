"""TrustRank and spam mass over the directed web graph.

Gyöngyi/Garcia-Molina/Pedersen, *Combating Web Spam with TrustRank*
(VLDB'04): propagate trust from a small vetted seed set with the
biased-teleport PageRank, then read each page's **spam mass** — the
part of its PageRank that did NOT arrive through trusted paths —
as the spam signal. This composes two kernels the engine already has
(``pagerank.pagerank`` and ``pagerank.personalized_pagerank``); the
only new pieces are the deterministic seed rule and the exact-decimal
mass arithmetic.

Seed rule: the top-``k`` vertices by in-degree (ties broken by id
ASC) stand in for the paper's manually-vetted high-authority sites —
deterministic, cheap (one map-side-combined groupBy + a TakeOrdered),
and replayable verbatim by the oracle.

Float discipline (the PLANS §40 lesson): ``pagerank`` and
``trustrank`` are rounded to 6 dp like every other rank output; the
spam mass is then the DIFFERENCE of those two exact 6-dp decimals —
exact in DECIMAL(18,6), no quotient, no re-rounding site. The
relative-mass verdict (``spammy``: more than half the page's rank is
untrusted, the paper's thresholding step) is the exact integer
comparison 2·(pr−tr) > pr on the same decimals rather than a rounded
ratio — a ratio of 6-dp decimals CAN land exactly on a .5e-6 rounding
tie (e.g. 1/128), where Spark HALF_UP and DuckDB double rounding
disagree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import pagerank as pr_ops

TRUST_SEEDS = 64


def trusted_seeds(edges: DataFrame, k: int = TRUST_SEEDS) -> DataFrame:
    """(id): the top-k vertices by in-degree, id-ASC tie-break — the
    deterministic stand-in for TrustRank's vetted seed list."""
    return (
        edges.groupBy(F.col("dst").alias("id"))
        .agg(F.count(F.lit(1)).alias("ind"))
        .orderBy(F.desc("ind"), F.asc("id"))
        .limit(k)
        .select("id")
    )


def spam_mass(
    edges: DataFrame,
    *,
    k: int = TRUST_SEEDS,
    damping: float = 0.85,
    max_iter: int = 5,
) -> DataFrame:
    """(id, pagerank, trustrank, spam_mass, spammy): PageRank,
    seed-biased TrustRank, their exact-decimal difference, and the
    relative-mass verdict (untrusted share > 1/2)."""
    e = edges.select("src", "dst")
    pr = pr_ops.pagerank(e, damping=damping, max_iter=max_iter).state
    tr = pr_ops.personalized_pagerank(
        e, trusted_seeds(e, k), damping=damping, max_iter=max_iter
    ).state
    prd = F.round(F.col("pr.value"), 6).cast("decimal(18,6)")
    trd = F.round(F.col("tr.value"), 6).cast("decimal(18,6)")
    sm = prd - trd
    return (
        pr.alias("pr")
        .join(tr.alias("tr"), "id")
        .select(
            "id",
            prd.cast("double").alias("pagerank"),
            trd.cast("double").alias("trustrank"),
            sm.cast("double").alias("spam_mass"),
            (F.lit(2).cast("decimal(18,6)") * sm > prd).alias("spammy"),
        )
    )


HIT_T = 4  # truncation horizon (steps)


def hitting_time(edges_dir: DataFrame, seeds: DataFrame,
                 t: int = HIT_T) -> DataFrame:
    """Truncated hitting time to a trusted seed set (Sarkar & Moore,
    UAI'07): h(v) = expected steps of a uniform out-link walk from v
    until it first reaches ``seeds``, truncated at ``t`` — the
    distance-to-trust dual of spam mass (a page many random clicks
    away from every vetted site is suspect even if its rank is high).

    Recursion: h(s∈S) = 0; h(v) = min(t, 1 + mean_{v→u} h(u));
    dangling pages (no out-links) pin at t. Each superstep is one
    edge⋈state join + one map-side-combined groupBy on src — the same
    gather shape as every rank kernel, ``t`` rounds, state-only
    shuffles.

    Determinism (the simrank lesson): the state is integer
    MICRO-STEPS (h·10⁶, BIGINT). The per-step mean is
    FLOOR(Σ/od) — floor of one IEEE division of exact integers, which
    is engine-independent (decimal ROUND is not) — and the output
    ``hops`` is one raw double division, zero rounding sites.
    Σ h_micro ≤ od·t·10⁶ stays far below 2^53 for any real od; at
    10¹²-page scale lift the sum to DECIMAL(38,0).

    Returns (id, h_micro, hops)."""
    cap = t * 1_000_000
    e = edges_dir.select("src", "dst").distinct().localCheckpoint(eager=True)
    from ..sources.tables import vertices_of

    v = vertices_of(e).localCheckpoint(eager=True)
    od = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("od"))
    base = (
        v.join(seeds.select("id").withColumn("_s", F.lit(1)), "id", "left")
        .join(od, "id", "left")
        .select("id", F.col("_s").isNotNull().alias("is_seed"), "od")
        .localCheckpoint(eager=True)
    )
    h = base.select(
        "id",
        F.when(F.col("is_seed"), F.lit(0).cast("long"))
        .otherwise(F.lit(cap).cast("long")).alias("hm"),
    )
    for _ in range(t):
        gathered = (
            e.join(h.select(F.col("id").alias("dst"), "hm"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("hm").alias("s"))
        )
        h = (
            base.join(gathered, "id", "left")
            .select(
                "id",
                F.when(F.col("is_seed"), F.lit(0).cast("long"))
                .when(F.col("s").isNull(), F.lit(cap).cast("long"))
                .otherwise(
                    F.least(
                        F.lit(cap).cast("long"),
                        F.lit(1_000_000)
                        + F.floor(F.col("s").cast("double") / F.col("od")),
                    )
                )
                .alias("hm"),
            )
            .localCheckpoint(eager=True)
        )
    return h.select(
        "id", F.col("hm").alias("h_micro"),
        (F.col("hm").cast("double") / F.lit(1000000.0)).alias("hops"),
    )
