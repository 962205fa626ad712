"""as-of join semantics and plan shape (operators/asof.py).

The cross-engine gate (vs DuckDB's native ASOF LEFT JOIN) runs in
test_oracle_parity via the shadow registry; these tests pin the edge
cases the gate data happens not to exercise, and the one-shuffle plan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ugfraud_spark.operators.asof import asof_join


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _run(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        left_rows, "k long, ts timestamp, lv string")
    right = spark.createDataFrame(
        right_rows, "k long, ts timestamp, rv string")
    out = asof_join(left, right, by=["k"], ts="ts", right_cols=["rv"])
    return {(r["k"], r["ts"], r["lv"]): r["asof_rv"] for r in out.collect()}


def test_asof_basic_no_match_and_tie(spark):
    got = _run(
        spark,
        # left: before any right row / exactly AT a right ts / after
        [(1, _t(0), "a"), (1, _t(5), "b"), (1, _t(9), "c")],
        [(1, _t(5), "r5"), (1, _t(7), "r7")],
    )
    assert got[(1, _t(0), "a")] is None          # no prior right row
    assert got[(1, _t(5), "b")] == "r5"          # equal ts IS visible
    assert got[(1, _t(9), "c")] == "r7"          # latest prior wins


def test_asof_keys_do_not_leak(spark):
    got = _run(
        spark,
        [(1, _t(3), "a"), (2, _t(3), "b")],
        [(1, _t(1), "k1"), (3, _t(1), "k3")],
    )
    assert got[(1, _t(3), "a")] == "k1"
    assert got[(2, _t(3), "b")] is None          # key 3's row never leaks


def test_asof_left_columns_survive_overlap(spark):
    """right_cols may share names with left columns — the prefix
    disambiguates and every left column survives untouched."""
    left = spark.createDataFrame(
        [(1, _t(4), 10.0)], "k long, ts timestamp, value double")
    right = spark.createDataFrame(
        [(1, _t(2), 99.0)], "k long, ts timestamp, value double")
    out = asof_join(left, right, by=["k"], ts="ts", right_cols=["value"])
    row = out.collect()[0]
    assert row["value"] == 10.0 and row["asof_value"] == 99.0
    assert set(out.columns) == {"k", "ts", "value", "asof_value"}


def test_asof_single_shuffle_plan(spark):
    """The union + running-last plan must shuffle ONCE, on the join key
    (the window's partitionBy) — no range-join explosion, no second
    exchange. Both sides' scans feed one Exchange hashpartitioning(k)."""
    left = spark.range(100).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 10).alias("ts"),
        F.lit("l").alias("lv"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"),
        F.timestamp_seconds(F.col("id") * 7).alias("ts"),
        F.lit("r").alias("rv"),
    )
    out = asof_join(left, right, by=["k"], ts="ts", right_cols=["rv"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
