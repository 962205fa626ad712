"""Similarity search over the embedding column.

- ``cosine_topk``: brute-force exact top-k per query vector (broadcast
  the small query side, JVM-side dot via zip_with + ordered fold —
  deterministic summation order, no UDF).
- ``lsh_topk``: the scale path — random-hyperplane (sign) LSH buckets;
  hyperplanes are deterministic ±1 vectors derived from a multiplicative
  hash of (plane, dim), so both engines and both runs bucket
  identically. Candidates = same-bucket pairs only; at 10^12 rows the
  bucket key is the shuffle key and bucket size the skew unit (cap +
  multi-probe documented).

Ranking is on round(cos, 6) with neighbor-id tiebreak so a 1-ulp
summation difference can't reorder the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8
_G_MULT = 2654435761
_G_MOD = 1_000_003


def plane_sign(p: int, d: int) -> int:
    return 1 if ((p * 131 + d * 31) * _G_MULT) % _G_MOD % 2 == 0 else -1


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(emb: DataFrame, query_ids: list[int], k: int = 3) -> DataFrame:
    """emb(vec_id, embedding) → (query_id, neighbor_id, cos, rank) for
    the exact top-k (self excluded)."""
    q = emb.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = emb.crossJoin(F.broadcast(q)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("qe"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def lsh_buckets(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket): sign-LSH bucket string."""
    dim = len(emb.select("embedding").first()["embedding"])
    bits = []
    for p in range(n_planes):
        g = F.array(*[F.lit(float(plane_sign(p, d))) for d in range(dim)])
        s = _dot(F.col("embedding"), g)
        bits.append(F.when(s > 0, F.lit("1")).otherwise(F.lit("0")))
    return emb.select("vec_id", F.concat(*bits).alias("bucket"))


def lsh_neardup_pairs(emb: DataFrame, threshold: float = 0.9,
                      n_planes: int = N_PLANES) -> DataFrame:
    """(vec_a, vec_b, cos): embedding-cosine near-dup pairs restricted to
    same-LSH-bucket candidates."""
    b = lsh_buckets(emb, n_planes)
    e = emb.join(b, "vec_id")
    l = e.select(F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("ea"), "bucket")
    r = e.select(F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("eb"), "bucket")
    pairs = l.join(r, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a", "vec_b",
            F.round(cosine(F.col("ea"), F.col("eb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
