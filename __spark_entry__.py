"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query (PageRank over the
derived web-ish graph at sf0.001). ``queries()``/``oracle_sql()`` expose
every implemented operator with its DuckDB oracle (see
``ugfraud_spark/registry.py``) up to the driver's 50-entry recording
budget; every query beyond the budget lives in
``registry.build_shadow_registry`` (len() it for the count) and runs
through the identical cross-engine gate in
``tests/test_oracle_parity.py`` — as-of/range joins, rollup, weighted
SSSP, mixture sampling, repetition metrics, vocabulary top-k, grouped
percentiles, clustering coefficient, IVF-ANN invariants, and the ten
long-stable entries rotated out in round 5 to make room for the
LLM-pipeline gates (dedup clusters, streaming incremental dedup,
contamination, BM25/TF-IDF retrieval, inverted index, sequence
packing, boilerplate removal, epoch shuffle, quality filter) in the
driver-recorded set.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ugfraud_spark.registry import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: PageRank supersteps over
    the derived link graph."""
    fn, _ = REGISTRY["pagerank"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
