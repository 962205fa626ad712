"""Numeric column expressions shared by the BP kernels.

All JVM-side (whole-stage codegen) — no Python in the superstep hot
path. Mirrors the reference's log-space policy (``SpEagle.py:63``,
``safe_log`` at ``SpEagle.py:325-328``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lse2(a: Column, b: Column) -> Column:
    """logsumexp of two log-space columns (reference A7,
    ``SpEagle.py:210-215``): max + log(exp(a-max) + exp(b-max))."""
    mx = F.greatest(a, b)
    return mx + F.log(F.exp(a - mx) + F.exp(b - mx))


def clamp_prior(p: Column, eps: float = 1e-5) -> Column:
    """Clamp a probability to (eps, 1-eps) exactly like ``SpEagle.py:58-62``
    (only the exact 0 / 1 endpoints are moved)."""
    return (
        F.when(p == 1.0, F.lit(1.0 - eps))
        .when(p == 0.0, F.lit(eps))
        .otherwise(p)
    )


def minmax_scale(df, value: str, out: str = "scaled", lo_clamp: float = 1e-7,
                 hi_clamp: float = 1e-7):
    """Min-max scaling to (0,1) — the documented *intent* of the
    reference's ``scale_value`` (``Utils/helper.py:66-86``). The
    reference's for/else indentation bug at ``helper.py:83-84`` (mid-range
    values written only for the last key) is intentionally NOT replicated
    (SURVEY §7 risk register)."""
    from pyspark.sql import Window

    stats = df.agg(
        F.min(value).alias("_mn"), F.max(value).alias("_mx")
    )
    j = df.crossJoin(F.broadcast(stats))
    raw = (F.col(value) - F.col("_mn")) / (F.col("_mx") - F.col("_mn"))
    scaled = (
        F.when(raw == 0.0, F.lit(lo_clamp))
        .when(raw == 1.0, F.lit(1.0 - hi_clamp))
        .otherwise(raw)
    )
    return j.withColumn(out, scaled).drop("_mn", "_mx")
