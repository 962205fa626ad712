"""Degree aggregations (reference A1/A2: ``SpEagle.py:112-113``,
``GANG.py:99-104``, ``ZooBP.py:120-124`` row/col sums).

Pure groupBy-count/sum — map-side partial aggregation + final agg, no
custom code. At 100 TB this is one shuffle keyed on the vertex id; AQE
coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degree(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )


def in_degree(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )


def weighted_in_degree(edges: DataFrame, weight: str = "weight") -> DataFrame:
    """Reference A2: ``M.sum(axis=0)`` column sums (``Fraudar.py:155-156``)."""
    return edges.groupBy(F.col("dst").alias("id")).agg(
        F.sum(weight).alias("w_in_deg")
    )


def degree(edges_undirected_ab: DataFrame) -> DataFrame:
    """Undirected degree from canonical (a,b) edges."""
    u = edges_undirected_ab
    return (
        u.select(F.col("a").alias("id"))
        .unionAll(u.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
