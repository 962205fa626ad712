"""Session co-occurrence ("co-visitation") item similarity.

The classic web-scale recommender primitive (Amazon's item-to-item CF,
covisitation matrices in YouTube's early pipeline): two items are
similar when they appear in the same user sessions more often than
chance. The reference's closest structure is its user–product
bipartite graph projections (UGFraud builds user→product edge lists,
Utils/helper.py); this operator is the session-scoped, time-aware
version over the event stream.

Pipeline: per-user sessionization (gaps-and-islands, the same
half-open >= gap rule as streaming/events.sessionize) → distinct
(session, item) incidence → per-session self-join for unordered item
pairs → cosine c_ab / √(n_a·n_b) over session counts.

Scale shape and the quadratic trap: the pair self-join is quadratic in
SESSION size, and real click logs have crawler/bot sessions touching
thousands of items — one such session emits millions of pairs and skews
the (item_a, item_b) shuffle. The ``max_items`` cap drops oversized
sessions BEFORE the join (the standard production defense; same move
as dedup._drop_oversized for LSH buckets), which also bounds the
per-user window state. Item session-counts are computed AFTER the cap
so the similarity universe is consistent. All joins are key-partitioned
on (user_id, sid); the item-count frame is item-cardinality sized and
broadcast.

Float discipline: counts stay BIGINT; cosine is one exact product, one
IEEE-exact √, one division, then ROUND(·, 6) — no accumulation site,
so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..streaming.events import PROPS_SCHEMA

MAX_SESSION_ITEMS = 50


def session_items(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, sid, item): distinct items per user-session. A new
    session starts when the previous event of the same user is >= gap
    away (half-open, matching F.session_window); sid numbers a user's
    sessions 1..n in time order. The window partitions by user —
    bounded by one user's history, never global."""
    it = events.select(
        "user_id", "ts", "event_id",
        F.from_json("props", PROPS_SCHEMA).getField("k").alias("item"),
    ).where(F.col("item").isNotNull())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    new_s = F.when(
        F.lag(us).over(w).isNull()
        | (us - F.lag(us).over(w) >= F.lit(gap_us)), 1
    ).otherwise(0)
    sid = F.sum(new_s).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        it.select("user_id", sid.alias("sid"), "item")
        .distinct()
    )


def item_cooccurrence(events: DataFrame, gap_minutes: int = 30,
                      max_items: int = MAX_SESSION_ITEMS,
                      min_count: int = 2) -> DataFrame:
    """(item_a, item_b, n_ab, n_a, n_b, cosine) for unordered item
    pairs co-occurring in >= ``min_count`` capped sessions."""
    # multi-consumer frames (house rule): d feeds the cap and the
    # semi-join, dd feeds the counts and both sides of the self-join —
    # pin each once instead of recomputing the session window 4×.
    d = session_items(events, gap_minutes=gap_minutes).localCheckpoint(
        eager=True)
    keep = (
        d.groupBy("user_id", "sid")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .where(F.col("n_items") <= max_items)
        .select("user_id", "sid")
    )
    dd = d.join(keep, ["user_id", "sid"], "left_semi").localCheckpoint(
        eager=True)
    ni = dd.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        dd.alias("a")
        .join(dd.alias("b"), ["user_id", "sid"])
        .where(F.col("a.item") < F.col("b.item"))
        .groupBy(F.col("a.item").alias("item_a"),
                 F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    na = ni.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))
    nb = ni.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))
    cos = (F.col("n_ab").cast("double")
           / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")))
    return (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .select("item_a", "item_b", "n_ab", "n_a", "n_b",
                F.round(cos, 6).alias("cosine"))
    )
