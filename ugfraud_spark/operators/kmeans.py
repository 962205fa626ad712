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
