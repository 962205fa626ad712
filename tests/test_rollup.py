"""Hierarchical time-rollup semantics (operators/rollup.py). The
cross-engine gate vs direct-from-raw DuckDB GROUP BYs runs in
test_oracle_parity via the shadow registry (events_rollup)."""

from __future__ import annotations

import datetime as dt

from ugfraud_spark.operators.rollup import hierarchical_rollup


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, ts timestamp, value double")


def test_rollup_avg_from_partials_not_avg_of_avgs(spark):
    """Two hours with very different row counts: the day-grain avg must
    be the row-weighted sum/count (15.0 here), not the avg of the two
    hourly avgs (which would be 28.5) — the classic partial-merge bug
    the operator exists to avoid."""
    rows = (
        # hour 0: 9 rows of value 2.0  → hourly avg 2.0
        [("a", dt.datetime(2024, 1, 1, 0, 0, i), 2.0) for i in range(9)]
        # hour 1: 1 row of value 132.0 → hourly avg 132.0
        + [("a", dt.datetime(2024, 1, 1, 1, 0, 0), 132.0)]
    )
    out = hierarchical_rollup(_rows(spark, rows), ts="ts", by=["k"],
                              value="value", grains=("hour", "day"))
    day = {r["bucket"]: r for r in out.collect() if r["grain"] == "day"}
    r = day[dt.datetime(2024, 1, 1)]
    assert r["n"] == 10 and r["sum_value"] == 150.0
    assert r["avg_value"] == 15.0


def test_rollup_three_levels_chain_partials(spark):
    """hour→day→month: the month grain aggregates the DAY partials and
    still equals the direct aggregate of raw."""
    rows = [
        ("a", dt.datetime(2024, 1, d, h, 30), float(d * 10 + h))
        for d in (1, 2, 15) for h in (0, 23)
    ]
    out = hierarchical_rollup(_rows(spark, rows), ts="ts", by=["k"],
                              value="value", grains=("hour", "day", "month"))
    got = {(r["grain"], r["bucket"]): (r["n"], r["sum_value"])
           for r in out.collect()}
    assert got[("month", dt.datetime(2024, 1, 1))] == (
        6, sum(d * 10 + h for d in (1, 2, 15) for h in (0, 23)))
    assert got[("day", dt.datetime(2024, 1, 15))] == (2, 150 + 173)
    assert got[("hour", dt.datetime(2024, 1, 2, 23))] == (1, 43.0)


def test_rollup_keys_stay_separate(spark):
    rows = [("a", dt.datetime(2024, 1, 1, 0, 0, 1), 1.0),
            ("b", dt.datetime(2024, 1, 1, 0, 0, 2), 5.0)]
    out = hierarchical_rollup(_rows(spark, rows), ts="ts", by=["k"],
                              value="value", grains=("hour", "day"))
    day = {(r["k"]): r for r in out.collect() if r["grain"] == "day"}
    assert day["a"]["sum_value"] == 1.0 and day["b"]["sum_value"] == 5.0
