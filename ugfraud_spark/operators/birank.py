"""BiRank over the user-product bipartite review graph.

He-Gao-Kan-Liu-Sugiyama, *BiRank: Towards Ranking on Bipartite
Graphs* (TKDE 2017): the symmetrically-normalized smoothing iteration

    p ← α·Sᵀu + (1−α)·p⁰,   u ← α·S p + (1−α)·u⁰,
    S_ij = w_ij / sqrt(d_i · d_j)

— the bipartite analog of personalized PageRank, and the ranking the
paper motivates with exactly this engine's domain (review/rating
graphs, where HITS's unnormalized mutual reinforcement lets hub mass
explode and plain PageRank ignores the two-sidedness). Priors are the
house hash priors (sources.tables.vertex_priors — the stand-in for
the reference's priors.pkl, UGFraud/Utils/helper.py).

Scale shape: the normalized edge weight 1/sqrt(d_src·d_dst) is
computed ONCE (two degree aggregates + two vertex-keyed joins) and
cached colocated; each half-step is then one edge⋈state join + one
map-side-combined sum — the identical shuffle class as the PageRank
superstep, alternating sides. Float discipline: raw double arithmetic
through the loop, ROUND 6 once at the end (the pagerank contract);
the oracle unrolls the same recurrence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import vertex_priors
from .superstep import colocate_edges

BIRANK_ALPHA = 0.85
BIRANK_ITERS = 5


def birank(bip: DataFrame, alpha: float = BIRANK_ALPHA,
           iters: int = BIRANK_ITERS) -> DataFrame:
    """bip(src, dst, weight) → (id, birank): both sides' final scores
    (users = src namespace, products = dst namespace), 6dp-rounded."""
    e = bip.select("src", "dst", F.col("weight").cast("double").alias("w"))
    du = e.groupBy("src").agg(F.sum("w").alias("du"))
    dp = e.groupBy("dst").agg(F.sum("w").alias("dp"))
    en = colocate_edges(
        e.join(du, "src").join(dp, "dst")
        .select("src", "dst",
                (F.col("w") / F.sqrt(F.col("du") * F.col("dp")))
                .alias("s"))
    )
    u = vertex_priors(e.select(F.col("src").alias("id")).distinct()) \
        .select("id", F.col("prior").alias("x"))
    p0 = vertex_priors(e.select(F.col("dst").alias("id")).distinct()) \
        .select("id", F.col("prior").alias("x0"))
    u0 = u.select("id", F.col("x").alias("x0"))
    a = float(alpha)
    for _ in range(iters):
        p = (
            en.join(u.select(F.col("id").alias("src"), "x"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("s") * F.col("x")).alias("m"))
            .join(p0, "id")
            .select("id", (F.lit(a) * F.col("m")
                           + F.lit(1.0 - a) * F.col("x0")).alias("x"))
        )
        u = (
            en.join(p.select(F.col("id").alias("dst"), "x"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("s") * F.col("x")).alias("m"))
            .join(u0, "id")
            .select("id", (F.lit(a) * F.col("m")
                           + F.lit(1.0 - a) * F.col("x0")).alias("x"))
            .localCheckpoint(eager=True)
        )
        p = p.localCheckpoint(eager=True)
        last_p = p
    return (
        u.select("id", F.round("x", 6).alias("birank"))
        .unionAll(last_p.select("id", F.round("x", 6).alias("birank")))
    )
