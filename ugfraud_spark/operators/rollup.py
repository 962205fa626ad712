"""Hypertable-style time rollup — continuous aggregate + partial
re-aggregation (the third temporal operator next to asof.py/ranges.py).

``hierarchical_rollup``: per-key aggregates (count, sum, avg) at a
ladder of time granularities, where ONLY the finest grain scans the
raw rows; every coarser grain re-aggregates the finer grain's
partials (sum-of-counts, sum-of-sums; avg derived as sum/count at
read-out, never averaged-of-averages). That is the hypertable /
continuous-aggregate contract at 100 TB: the raw table is read once,
the hourly partial is a few-orders-smaller frame, and daily/monthly
rollups are cheap re-shuffles of partials — plus the correctness
property worth gating, that partial merges reproduce exactly what a
direct GROUP BY over raw computes (the oracle does the latter).

Grains are ``date_trunc`` units ordered finest→coarsest; each coarser
bucket start must be a truncation of the finer one (hour→day→month…),
which ``date_trunc`` guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hierarchical_rollup(
    df: DataFrame,
    ts: str,
    by: list[str],
    value: str,
    grains: tuple[str, ...] = ("hour", "day"),
) -> DataFrame:
    """→ (grain, bucket, *by, n, sum_value, avg_value), one row per
    (grain, bucket, key); floats rounded to 6 for cross-engine gating."""
    partial = (
        df.groupBy(*by, F.date_trunc(grains[0], F.col(ts)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value).alias("sv"))
    )
    if len(grains) > 1:
        # one materialization, len(grains) consumers
        partial = partial.localCheckpoint(eager=True)

    frames = [partial.withColumn("grain", F.lit(grains[0]))]
    finer = partial
    for g in grains[1:]:
        finer = (
            finer.groupBy(*by, F.date_trunc(g, F.col("bucket")).alias("bucket"))
            .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
        )
        frames.append(finer.withColumn("grain", F.lit(g)))

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    # avg derives from the ROUNDED sum: the raw sums differ across
    # engines in their last ulps (summation order), and dividing them
    # can land on opposite sides of a 6dp round boundary — dividing the
    # already-rounded (hence gate-identical) sum cannot
    return out.select(
        "grain", "bucket", *by, "n",
        F.round("sv", 6).alias("sum_value"),
        F.round(F.round("sv", 6) / F.col("n"), 6).alias("avg_value"),
    )
