"""Round-6 optimization internals: size-derived layouts and scoped conf.

These pin the NEW mechanisms (not results — every consumer query stays
oracle-gated): the sketch-partition sizing rule, the measured-size
colocate variant, and the conf restore discipline of the scoped plan
contexts (a raise inside a loop must never leak AQE-off or a shrunken
shuffle width into the rest of the session — the ADVICE-r3 failure
mode)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ugfraud_spark.operators.linalg import sketch_partitions
from ugfraud_spark.operators.superstep import (
    LAYOUT_ROWS_PER_PARTITION,
    colocate_edges_sized,
    fixed_plan,
    sized_plan,
)


def test_sketch_partitions_rule():
    # bench-scale case from the measured sweep: 600k edges, 20k cols,
    # l=136 → traffic rule ~9, rows rule ~10 → 9
    assert sketch_partitions(600_000, 20_000, 136, 32) == 9
    # small-blob case (fbox l=66): traffic rule alone would say 18+,
    # the rows cap holds it in the measured 6-10 basin
    assert sketch_partitions(600_000, 20_000, 66, 32) <= 10
    # conf saturation: huge edge side → the session conf rules
    assert sketch_partitions(10**9, 20_000, 136, 32) == 32
    # floor: tiny inputs never go below one partition
    assert sketch_partitions(10, 10, 4, 32) == 1


def test_colocate_edges_sized_shrinks_and_preserves_rows(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        edges = spark.range(1000).select(
            (F.col("id") % 50).alias("src"), (F.col("id") % 97).alias("dst")
        )
        out, m = colocate_edges_sized(edges)
        # 1000 rows ≪ 8 × LAYOUT_ROWS_PER_PARTITION → shrunk to 1
        assert m == 1
        assert out.rdd.getNumPartitions() == 1
        assert out.count() == 1000
        assert sorted(r["src"] for r in out.collect()) == sorted(
            r["src"] for r in edges.collect()
        )
        out.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_colocate_edges_sized_conf_saturated(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        n = 2 * LAYOUT_ROWS_PER_PARTITION + 10  # above the conf cap
        edges = spark.range(n).select(
            F.col("id").alias("src"), F.col("id").alias("dst")
        )
        out, m = colocate_edges_sized(edges)
        assert m == 2  # capped at conf — identical to plain colocate
        assert out.rdd.getNumPartitions() == 2
        out.unpersist()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_scoped_plan_contexts_restore_on_raise(spark):
    aqe0 = spark.conf.get("spark.sql.adaptive.enabled")
    n0 = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(RuntimeError):
        with fixed_plan(spark):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe0

    with pytest.raises(RuntimeError):
        with sized_plan(spark, 3):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.shuffle.partitions") == n0
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe0

    # adaptive_off=False variant scopes ONLY the width
    with sized_plan(spark, 3, adaptive_off=False):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
        assert spark.conf.get("spark.sql.adaptive.enabled") == aqe0
    assert spark.conf.get("spark.sql.shuffle.partitions") == n0
