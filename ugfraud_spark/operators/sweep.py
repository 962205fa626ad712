"""PPR sweep cut — Andersen/Chung/Lang local clustering.

Given a seed-personalized PageRank vector, order vertices by the
degree-normalized score ppr/deg, and for every prefix of that order
compute the conductance φ(k) = cut(k) / min(vol(k), 2m − vol(k)). The
prefix with minimal φ is the local cluster around the seeds — the
classic spectral sweep that turns a diffusion vector into a community
(reference analog: the neighborhoods UGFraud's detectors score are
exactly such diffusion-ranked vertex sets).

Scale shape: the sweep frontier is CAPPED at ``SWEEP_CAP`` vertices,
selected with orderBy+limit (TakeOrdered — per-partition heaps, never
a global sort of the vertex set). Everything downstream operates on
that bounded frame: the rank window and the two prefix sums run over
≤ cap rows (single tiny partition, the documented bounded exception to
the no-global-window rule), and the edge set joins against the
broadcast ≤ cap-row rank table twice to count internal edges — one
scan of the edges, no self-join. Degrees and total volume are one
map-side-combined aggregation each.

Determinism: the ordering key is the 6-dp-rounded ppr (the value the
cross-engine gate already certifies) divided by the exact integer
degree, ties broken by vertex id — a total order, so the cap cut and
ranks are engine-independent. vol/cut are exact BIGINTs; φ is ONE
double division of exact integers (no rounding site).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SWEEP_CAP = 256


def ppr_sweep_cut(edges_ab: DataFrame, scores: DataFrame,
                  cap: int = SWEEP_CAP) -> DataFrame:
    """edges_ab(a, b) canonical undirected, scores(id, ppr) →
    (k, id, ppr, vol, cut, phi): the conductance sweep curve over the
    top-``cap`` vertices by ppr/degree (rank k, prefix volume, prefix
    cut, prefix conductance; phi is NULL for a whole-graph prefix)."""
    ends = edges_ab.select(F.col("a").alias("id")).unionAll(
        edges_ab.select(F.col("b").alias("id"))
    )
    deg = ends.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    vol_all = deg.agg(F.sum("deg").alias("vol_all"))

    key = F.col("ppr") / F.col("deg")
    cand = (
        scores.join(deg, "id")
        .select("id", "ppr", "deg", key.alias("key"))
        .orderBy(F.desc("key"), F.asc("id"))
        .limit(cap)
    )
    w = Window.orderBy(F.desc("key"), F.asc("id"))  # <= cap rows
    ranked = (
        cand.withColumn("k", F.row_number().over(w))
        .localCheckpoint(eager=True)
    )
    internal = (
        edges_ab.join(
            F.broadcast(ranked.select(F.col("id").alias("a"),
                                      F.col("k").alias("ka"))), "a")
        .join(
            F.broadcast(ranked.select(F.col("id").alias("b"),
                                      F.col("k").alias("kb"))), "b")
        .select(F.greatest("ka", "kb").alias("kmax"))
        .groupBy("kmax")
        .agg(F.count(F.lit(1)).alias("ic"))
    )
    wk = Window.orderBy("k")  # <= cap rows
    curve = (
        ranked.join(internal, ranked["k"] == internal["kmax"], "left")
        .select("k", "id", "ppr", "deg",
                F.coalesce("ic", F.lit(0)).alias("ic"))
        .withColumn("vol", F.sum("deg").over(wk))
        .withColumn("cut", F.col("vol") - 2 * F.sum("ic").over(wk))
        .crossJoin(F.broadcast(vol_all))
    )
    denom = F.least(F.col("vol"), F.col("vol_all") - F.col("vol"))
    return curve.select(
        "k", "id", "ppr",
        F.col("vol").cast("long").alias("vol"),
        F.col("cut").cast("long").alias("cut"),
        F.when(denom > 0,
               F.col("cut").cast("double") / denom.cast("double"))
        .alias("phi"),
    )
