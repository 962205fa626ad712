"""Distributed Lloyd k-means over the embeddings table.

The trainer the IVF index (``ann.ivf_topk``) assumes: ``ivf_topk``
fits its coarse quantizer on a driver-side SAMPLE (fine for a model,
documented there); this operator is the full-corpus Lloyd iteration a
100 TB embedding store needs when sample-training isn't acceptable —
every pass over the vectors is distributed, and only the k·dim
centroid aggregates (the MODEL) ever reach the driver, like any
broadcast dimension table.

Determinism / cross-engine exactness (each piece mirrored by the
DuckDB oracle):

- init: the embeddings of the k smallest vec_ids — replayable SQL.
- assignment: argmin over k centroids of the squared L2 distance,
  computed as a SEQUENTIAL index-order fold (Spark ``zip_with`` +
  ``aggregate`` from 0.0; DuckDB ``list_transform`` + ``list_reduce``
  — the fold seeds differ, 0.0+e₁ vs e₁, which is float-identical).
  Ties break to the smallest cluster id.
- update: the mean is computed from per-(cluster, dim) sums of the
  coordinates quantized to 1e-6 as SCALED INT64 —
  ``CAST(ROUND(x·10⁶, 0) AS BIGINT)`` — summed exactly (associative,
  so partitioning/order independent), then ONE double division by
  n·10⁶. The quantization is tie-free: a float32 coordinate is a
  dyadic rational, and x·10⁶ landing exactly on .5 would need a 5⁶
  factor in the denominator, which no dyadic has. Scaled ints rather
  than DECIMAL deliberately: DECIMAL→DOUBLE casts are not guaranteed
  correctly-rounded identically across engines, while int64→double is
  exact below 2⁵³ and the final division is a single IEEE op.
- output: (vec_id, cluster) — integers only, no float in the gate.

Scale shape per iteration: one broadcast crossJoin (k rows) + one
map-side-combined groupBy for the argmin, one posexplode + one
map-side-combined groupBy for the sums. Nothing shuffles the corpus
on a skewed key; centroid state is O(k·dim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_CLUSTERS = 8
KM_ITERS = 3


def kmeans_assign(emb: DataFrame, k: int = K_CLUSTERS,
                  iters: int = KM_ITERS) -> DataFrame:
    """emb(vec_id, embedding array<float>) → (vec_id, cluster):
    full-corpus Lloyd assignment after ``iters`` exact iterations."""
    spark = emb.sparkSession
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)  # scanned 2·iters times

    cents = [
        (i, [float(x) for x in r["v"]])
        for i, r in enumerate(e.orderBy("vec_id").limit(k).collect())
    ]

    assigned = None
    for it in range(iters):
        cent_df = spark.createDataFrame(
            cents, "cluster int, cent array<double>")
        assigned = (
            e.crossJoin(F.broadcast(cent_df))
            .select(
                "vec_id", "v",
                F.struct(
                    F.aggregate(
                        F.zip_with("v", "cent",
                                   lambda x, c: (x - c) * (x - c)),
                        F.lit(0.0), lambda a, x: a + x,
                    ).alias("d"),
                    F.col("cluster"),
                ).alias("dc"),
            )
            .groupBy("vec_id")
            .agg(F.min("dc")["cluster"].alias("cluster"),
                 F.first("v").alias("v"))
        )
        if it == iters - 1:
            break  # the final assignment needs no further update pass
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.round(F.col("x") * F.lit(1000000.0), 0)
                      .cast("bigint")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # k·dim rows — the model, not the data
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in sums:
            by_c.setdefault(r["cluster"], {})[r["dim"]] = (
                r["s"] / (r["n"] * 1000000.0))
        # a cluster that lost every vector keeps its previous centroid
        cents = [
            (c, [by_c[c][d] for d in sorted(by_c[c])]) if c in by_c
            else (c, prev)
            for c, prev in cents
        ]
    return assigned.select("vec_id", "cluster")


# SemDeDup (Abbas et al., *SemDeDup: Data-efficient learning at
# web-scale through semantic deduplication*, 2023): k-means the
# embedding space, then prune within-cluster semantic duplicates —
# pairs above a cosine threshold — keeping, per the paper's released
# policy, the example with the LOWEST similarity to its cluster
# centroid (maximizing retained diversity). Clusters above
# SEMDEDUP_MAX_CLUSTER skip pruning (kept=1) and are logged: the
# paper's own contract is that k is sized so n/k bounds the
# within-cluster quadratic, and a blown cluster should be re-clustered,
# not silently O(n²)-joined.
SEMDEDUP_TAU = 0.35
SEMDEDUP_MAX_CLUSTER = 4096


def semdedup(emb: DataFrame, k: int = K_CLUSTERS, iters: int = KM_ITERS,
             tau: float = SEMDEDUP_TAU,
             max_cluster: int = SEMDEDUP_MAX_CLUSTER) -> DataFrame:
    """emb(vec_id, embedding) → (vec_id, cluster, cent_sim, kept):
    kept=0 iff some same-cluster neighbor with cosine >= tau has a
    strictly smaller (cent_sim, vec_id) key — i.e. a more-diverse
    representative of the same semantic point exists, so this row is
    the duplicate. Deterministic by construction: cent_sim is rounded
    to 6 dp before every comparison, ties break on vec_id, and the
    dominance rule needs no iterative connected components (the
    minimal element of every cosine-linked group is always kept).

    Scale shape: Lloyd assignment (see kmeans_assign) + one
    O(k·dim)-row centroid aggregate broadcast back + ONE self-join
    shuffled on the cluster key, quadratic only within a cluster —
    which SemDeDup's k-selection contract bounds; the max_cluster
    guard makes the bound explicit and auditable instead of silent."""
    import logging

    spark = emb.sparkSession
    e = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    a = kmeans_assign(emb, k=k, iters=iters).join(e, "vec_id")

    sums = (
        a.select("cluster", F.posexplode("v").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(
            F.sum(F.round(F.col("x") * F.lit(1000000.0), 0)
                  .cast("bigint")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    cent = sums.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "s", "n"))),
            lambda t: t["s"].cast("double")
            / (t["n"].cast("double") * F.lit(1000000.0)),
        ).alias("cent")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0), lambda acc, z: acc + z,
        )

    cs = (
        a.join(F.broadcast(cent), "cluster")
        .select(
            "vec_id", "cluster", "v",
            F.round(
                dot(F.col("v"), F.col("cent"))
                / (F.sqrt(dot(F.col("v"), F.col("v")))
                   * F.sqrt(dot(F.col("cent"), F.col("cent")))), 6
            ).alias("cent_sim"),
        )
    )
    sizes = cs.groupBy("cluster").agg(F.count(F.lit(1)).alias("csize"))
    over = [r["cluster"] for r in
            sizes.where(F.col("csize") > max_cluster).collect()]
    if over:
        logging.getLogger(__name__).warning(
            "semdedup: clusters %s exceed max_cluster=%d — pruning "
            "skipped there (kept=1); re-cluster with larger k", over,
            max_cluster)
    prunable = cs.join(
        sizes.where(F.col("csize") <= max_cluster).select("cluster"),
        "cluster", "left_semi")
    x, y = prunable.alias("x"), prunable.alias("y")
    dropped = (
        x.join(
            y,
            (F.col("x.cluster") == F.col("y.cluster"))
            & (F.col("y.vec_id") != F.col("x.vec_id"))
            & (F.round(
                dot(F.col("x.v"), F.col("y.v"))
                / (F.sqrt(dot(F.col("x.v"), F.col("x.v")))
                   * F.sqrt(dot(F.col("y.v"), F.col("y.v")))), 6)
               >= F.lit(float(tau)))
            & ((F.col("y.cent_sim") < F.col("x.cent_sim"))
               | ((F.col("y.cent_sim") == F.col("x.cent_sim"))
                  & (F.col("y.vec_id") < F.col("x.vec_id")))),
        )
        .select(F.col("x.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        cs.join(dropped.withColumn("is_drop", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id", "cluster", "cent_sim",
            F.when(F.col("is_drop").isNotNull(), F.lit(0))
            .otherwise(F.lit(1)).cast("long").alias("kept"),
        )
    )
