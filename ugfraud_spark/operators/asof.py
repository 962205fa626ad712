"""As-of join — the temporal operator Spark's join zoo lacks.

``asof_join(left, right, ...)``: each left row gains the most recent
right row with ``right.ts <= left.ts`` inside its key group (the
classic "event → latest prior state" join: trade→quote, purchase→last
click, log line→last deploy).

Spark-first plan — the union + running-``last`` trick, NOT a range
join: tag the sides, union them, and take the running last non-null
right payload over a ``(key) ORDER BY (ts, side)`` window bounded to
the current row. That is ONE shuffle on the join key plus a
partition-local sort — the same cost as the groupBy both tables need
anyway — where the naive ``l.ts >= r.ts`` range join explodes to
O(|L|·|R|) pairs per key before its per-key argmax. At 100 TB the key
is the shuffle unit and a hot key degrades to that key's own sort, not
a cross product; there is no global window (partitionBy is always the
join key).

Tie rule: a right row at exactly ``left.ts`` IS visible (sides sort
right-before-left at equal ts), matching DuckDB's ``ASOF JOIN ...
ON l.ts >= r.ts`` — the oracle for the gate query
(registry.q_events_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus ``prefix``-renamed
    ``right_cols`` from the latest ``right`` row at or before its
    ``ts`` within the same ``by`` group (nulls when no such row).

    ``left`` keeps all its columns; ``right`` contributes only
    ``right_cols``. Column names in ``right_cols`` may overlap with
    ``left``'s — the prefix disambiguates.
    """
    lcols = left.columns
    out_cols = [f"{prefix}{c}" for c in right_cols]

    l = left.withColumn("_side", F.lit(1))
    for c, oc in zip(right_cols, out_cols):
        l = l.withColumn(oc, F.lit(None).cast(right.schema[c].dataType))

    r = right.select(
        *by, ts, *[F.col(c).alias(oc) for c, oc in zip(right_cols, out_cols)]
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in (*by, ts):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = l.unionByName(r)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "_side",
        *[F.last(oc, ignorenulls=True).over(w).alias(oc) for oc in out_cols],
    )
    return filled.where(F.col("_side") == 1).drop("_side")
