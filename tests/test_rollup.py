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


def test_kleinberg_bursts_vs_bruteforce(spark):
    """Planted 3-day surge inside a flat series: the decoded path
    equals exhaustive minimization over all 2^T state paths under the
    exact same 6dp-decimal cost model, and the burst run covers
    exactly the surge."""
    import datetime
    import itertools
    import math
    from decimal import Decimal

    from pyspark.sql import functions as F

    from ugfraud_spark.operators import funnel

    counts = [2, 2, 2, 20, 22, 21, 2, 2, 2, 2]
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(days=d),
                         1, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {r["day"]: r["state"]
           for r in funnel.kleinberg_bursts(ev).collect()}

    T = len(counts)
    l0 = sum(counts) / T
    l1 = funnel.BURST_S * l0

    def q6(x):
        return Decimal(str(round(x, 6)))

    g = q6(funnel.BURST_GAMMA * math.log(T))
    e = [[q6(l0 - n * math.log(l0)), q6(l1 - n * math.log(l1))]
         for n in counts]
    best, best_cost = None, None
    for path in itertools.product((0, 1), repeat=T):
        cost = e[0][path[0]] + (g if path[0] == 1 else Decimal(0))
        for t in range(1, T):
            cost += e[t][path[t]]
            if path[t - 1] == 0 and path[t] == 1:
                cost += g
        # match the engine's tie-break: lexicographically-smaller
        # (base-state-preferring) path wins on equal cost
        if best_cost is None or cost < best_cost or (
                cost == best_cost and path < best):
            best, best_cost = path, cost
    want = {datetime.date(2024, 3, 1) + datetime.timedelta(days=d): s
            for d, s in enumerate(best)}
    assert got == want
    assert [got[datetime.date(2024, 3, 1) + datetime.timedelta(days=d)]
            for d in range(T)] == [0, 0, 0, 1, 1, 1, 0, 0, 0, 0]
