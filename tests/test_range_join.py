"""Range (interval⋈point) join semantics and plan shape
(operators/ranges.py). The cross-engine gate vs DuckDB's inequality
join runs in test_oracle_parity via the shadow registry."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ugfraud_spark.operators.ranges import interval_point_join


def _t(m: int, s: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, m, s)


def _run(spark, points, intervals, bucket_s=60):
    p = spark.createDataFrame(points, "k long, pid long, ts timestamp")
    i = spark.createDataFrame(
        intervals, "k long, iid long, start timestamp, end timestamp")
    out = interval_point_join(p, i, by=["k"], bucket_s=bucket_s)
    return {(r["pid"], r["iid"]) for r in out.collect()}


def test_range_half_open_boundaries(spark):
    got = _run(
        spark,
        [(1, 10, _t(5)),          # == start: IN
         (1, 11, _t(7, 30)),      # interior: IN
         (1, 12, _t(10)),         # == end: OUT (half-open)
         (1, 13, _t(4, 59))],     # before start: OUT
        [(1, 100, _t(5), _t(10))],
    )
    assert got == {(10, 100), (11, 100)}


def test_range_interval_spanning_buckets_no_dups(spark):
    """An interval covering several coarse buckets meets a point's one
    bucket exactly once — no post-join dedup needed."""
    got = _run(
        spark,
        [(1, 10, _t(2)), (1, 11, _t(25))],
        [(1, 100, _t(1), _t(30))],   # spans ~29 one-minute buckets
        bucket_s=60,
    )
    assert got == {(10, 100), (11, 100)}


def test_range_keys_do_not_leak(spark):
    got = _run(
        spark,
        [(1, 10, _t(5)), (2, 20, _t(5))],
        [(1, 100, _t(0), _t(10))],
    )
    assert got == {(10, 100)}


def test_range_plan_is_equi_join(spark):
    """The bucketed plan must be a hash equi-join on (key, bucket) —
    never the BroadcastNestedLoop/Cartesian Spark picks for a raw
    inequality join."""
    p = spark.range(1000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("pid"),
        F.timestamp_seconds(F.col("id") * 13).alias("ts"))
    i = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("iid"),
        F.timestamp_seconds(F.col("id") * 120).alias("start"),
        F.timestamp_seconds(F.col("id") * 120 + 300).alias("end"))
    out = interval_point_join(p, i, by=["k"], bucket_s=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan
