"""Truncated SimRank (Jeh & Widom, KDD 2002) over the directed web
graph — "two pages are similar if they are pointed to by similar
pages": s(a,b) = C/(|I(a)||I(b)|) · Σ_{u∈I(a), v∈I(b)} s(u,v),
s(v,v) = 1, evaluated for T = 2 iterations.

Exactness of the truncation: with s₀ = δ, the first iterate s₁(a,b)
is non-zero exactly on pairs sharing an in-neighbor — the co-citation
pairs — so restricting the materialized pair state to co-citation
pairs loses NOTHING at T=1 and the T=2 score over that domain is the
exact s₂ for every reported pair (pairs outside the domain can have
non-zero s₂; the candidate restriction is the output scope, not an
approximation of reported values).

Scale shape (the quadratic guards all happen BEFORE any self-join):
sources with out-degree > ``MAX_OUT`` are dropped up front — SimRank
on the hub-filtered subgraph, the same directory-page trade as
``triangles.cocitation`` (a hub citing d pages fans out d² wedge
pairs; at web scale the d ≥ 10⁵ homepage hubs would dominate every
stage). The s₂ gather is expressed as an OUT-expansion of the s₁
state (state pair (u,v) × out-edges of u × out-edges of v, each side
≤ MAX_OUT by construction), grouped on the destination pair — one
shuffle on the pair key, never a per-pair in-neighborhood product.

Float discipline (house rule, tightened): the state carried between
the two iterations is FLOOR-quantized to integer micro-units
(s·10⁶) — floor of a double is engine-independent given identical
IEEE inputs, unlike ROUND, whose decimal tie rule differs across
engines exactly when the input is a sum of exact 6-dp decimals (the
harmonic-centrality lesson; the first cut of this operator hit it).
The gather then sums exact BIGINTs (associative → partitioning-
independent) and both scores are emitted as RAW doubles from one
identical deterministic expression — zero rounding sites anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SIMRANK_C = 0.8
SIMRANK_MAX_OUT = 64


def simrank2(edges_dir: DataFrame, c: float = SIMRANK_C,
             max_out: int = SIMRANK_MAX_OUT) -> DataFrame:
    """edges_dir(src, dst) → (a, b, n_common, s1, s2) with a < b for
    every co-citation pair of the hub-filtered graph: common
    in-neighbor count, the exact 1-iteration SimRank score, and the
    2-iteration score over the micro-quantized s1 state."""
    ok_src = (
        edges_dir.groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .where(F.col("od") <= max_out)
        .select("src")
    )
    e = (
        edges_dir.join(ok_src, "src", "left_semi")
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    ind = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("n")
    )
    l, r = e.alias("l"), e.alias("r")
    pairs = (
        l.join(r, (F.col("l.src") == F.col("r.src"))
               & (F.col("l.dst") < F.col("r.dst")))
        .select(F.col("l.dst").alias("a"), F.col("r.dst").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = (
        pairs
        .join(ind.select(F.col("id").alias("a"), F.col("n").alias("na")),
              "a")
        .join(ind.select(F.col("id").alias("b"), F.col("n").alias("nb")),
              "b")
        .select(
            "a", "b", "n_common", "na", "nb",
            (
                (F.lit(c) * F.col("n_common").cast("double"))
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("s1"),
        )
        .withColumn("s1_micro",
                    F.floor(F.col("s1") * F.lit(1000000.0)))
        .localCheckpoint(eager=True)
    )
    # s₁' state: both orders of every pair plus the diagonal s(v,v)=1
    # (diagonal restricted to vertices with out-edges — others cannot
    # expand)
    state = (
        s1.select(F.col("a").alias("u"), F.col("b").alias("v"), "s1_micro")
        .unionAll(s1.select(F.col("b").alias("u"), F.col("a").alias("v"),
                            "s1_micro"))
        .unionAll(e.select(F.col("src").alias("u")).distinct()
                  .select("u", F.col("u").alias("v"),
                          F.lit(1000000).cast("long").alias("s1_micro")))
    )
    gather = (
        state
        .join(e.select(F.col("src").alias("u"), F.col("dst").alias("ga")),
              "u")
        .join(e.select(F.col("src").alias("v"), F.col("dst").alias("gb")),
              "v")
        .where(F.col("ga") < F.col("gb"))
        .groupBy(F.col("ga").alias("a"), F.col("gb").alias("b"))
        .agg(F.sum("s1_micro").alias("acc"))
    )
    return (
        s1.join(gather, ["a", "b"], "left")
        .select(
            "a", "b", "n_common", "s1",
            (
                (F.lit(c) * F.coalesce(F.col("acc"), F.lit(0))
                 .cast("double"))
                / (F.col("na") * F.col("nb")).cast("double")
                / F.lit(1000000.0)
            ).alias("s2"),
        )
    )
