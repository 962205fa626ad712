"""Range (interval⋈point) join — the second temporal operator Spark
lacks a first-class plan for (see operators/asof.py for the first).

``interval_point_join``: pairs every point row with every interval row
of the same key whose half-open window ``[start, end)`` contains the
point's timestamp.

Spark-first plan — bucketed equi-join, NOT an inequality join: Spark
plans ``p.ts >= i.start AND p.ts < i.end`` (even with an equi-key) as
the key-join followed by a per-key filter, which at a hot key degrades
to that key's full cross product; with no key it is a
BroadcastNestedLoopJoin — both O(|P|·|I|) per group. Instead each
interval explodes into the coarse time buckets it overlaps
(``sequence(floor(start/w), floor(end/w))`` — ≤ ceil(len/w)+1 rows,
i.e. ~2 for intervals sized like the bucket), points map to their one
bucket, and the join runs on ``(key…, bucket)`` — an equi-shuffle
whose fan-in per task is bounded by bucket occupancy, not key
cardinality. The exact containment predicate filters after the join;
no dedup is needed because a point's single bucket meets each
overlapping interval's bucket list exactly once.

Pick ``bucket_s`` near the typical interval length: too small explodes
intervals into many rows, too large piles unrelated rows into one
bucket. Both ends of the tradeoff are data-volume-linear — there is no
quadratic regime as long as (key, bucket) occupancy stays bounded,
which is the same skew contract every groupBy in the engine carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    by: list[str],
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket_s: int = 300,
) -> DataFrame:
    """Inner join: rows = points ⋈ intervals on equal ``by`` keys with
    ``start <= ts < end`` (half-open). Output carries every column of
    both inputs except the interval's key columns (deduped)."""
    p = points.withColumn(
        "_bkt", F.floor(F.unix_timestamp(F.col(ts)) / bucket_s)
    )
    i = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / bucket_s),
                # end is exclusive, but a point in end's bucket can
                # still precede it — include the bucket, filter exact
                F.floor(F.unix_timestamp(F.col(end)) / bucket_s),
            )
        ),
    )
    joined = p.join(i, [*by, "_bkt"]).where(
        (F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end))
    )
    return joined.drop("_bkt")
