"""Durable-state storage substrate: Iceberg when configured, parquet
otherwise.

The north_star names Iceberg as the table substrate; this sandbox has no
Iceberg runtime jars, so the swap point is kept CONTAINED here: superstep
checkpoints (and anything else that persists state) call ``write_state``
/ ``read_state`` and get

- an Iceberg table (``<catalog>.<ns>.superstep_state_<job>`` — one table
  per checkpoint_dir so concurrent jobs stay isolated, partitioned by
  ``step``, created on first write and thereafter written with
  ``overwritePartitions`` — idempotent per-step replace, snapshot
  isolation for readers) when the flag AND the runtime are both
  present, else
- the parquet layout used everywhere else (graceful fallback, logged
  once).

Enable with ``UGFRAUD_SPARK_ICEBERG=1`` plus a configured Spark catalog,
e.g.::

    spark.sql.catalog.ugfraud=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.ugfraud.type=hadoop
    spark.sql.catalog.ugfraud.warehouse=/path/warehouse

State refs are self-describing strings: ``iceberg:<table>@step=<n>`` or
a parquet directory path — ``read_state`` dispatches on the prefix, so
mixed-substrate metrics.jsonl histories resume correctly.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

log = logging.getLogger("ugfraud_spark.catalog")

ICEBERG_ENV = "UGFRAUD_SPARK_ICEBERG"
CATALOG_CONF = "spark.sql.catalog.ugfraud"
STATE_NAMESPACE = "ugfraud.state"

_warned = False


def state_table_for(checkpoint_dir: str) -> str:
    """Per-job state table name, keyed by checkpoint_dir.

    The parquet layout isolates jobs by directory; the Iceberg substrate
    must preserve that isolation or two concurrent jobs would overwrite
    each other's ``step`` partitions in one shared table and a resume
    could silently load the OTHER job's state. The ref recorded in
    metrics.jsonl carries the full table name, so reads never depend on
    re-deriving this mapping.
    """
    import hashlib

    digest = hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    return f"{STATE_NAMESPACE}.superstep_state_{digest}"


def iceberg_enabled(spark: SparkSession) -> bool:
    """Flag set AND catalog configured AND Iceberg classes loadable."""
    global _warned
    if os.environ.get(ICEBERG_ENV) != "1":
        return False
    try:
        if spark.conf.get(CATALOG_CONF, None) is None:
            raise RuntimeError(f"{CATALOG_CONF} not configured")
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception as exc:  # runtime lacks the jars / no catalog
        if not _warned:
            _warned = True
            log.warning(
                "%s=1 but the Iceberg runtime is unavailable (%s) — "
                "falling back to parquet checkpoints", ICEBERG_ENV, exc)
        return False


def write_state(state: DataFrame, checkpoint_dir: str, step: int) -> str:
    """Persist one superstep's state; returns the self-describing ref
    recorded in metrics.jsonl."""
    spark = state.sparkSession
    if iceberg_enabled(spark):
        table = state_table_for(checkpoint_dir)
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {STATE_NAMESPACE}")
        stamped = state.withColumn("step", F.lit(step))
        # DataFrameWriterV2.overwritePartitions() requires an existing
        # table — the first checkpoint of a fresh warehouse must create
        # it (partitioned by step so per-step replace stays idempotent).
        if spark.catalog.tableExists(table):
            stamped.writeTo(table).overwritePartitions()
        else:
            stamped.writeTo(table).partitionedBy(F.col("step")).create()
        return f"iceberg:{table}@step={step}"
    path = os.path.join(checkpoint_dir, f"step={step:06d}")
    state.write.mode("overwrite").parquet(path)
    return path


def read_state(spark: SparkSession, ref: str) -> DataFrame:
    """Load a state ref produced by ``write_state``."""
    if ref.startswith("iceberg:"):
        table, _, step = ref[len("iceberg:"):].partition("@step=")
        return (spark.read.table(table)
                .where(F.col("step") == int(step)).drop("step"))
    return spark.read.parquet(ref)
