#!/usr/bin/env python
"""Round-6 optimization experiments: phase breakdowns + variant timing.

Usage: python scripts/exp_r06.py <exp-name> [...]
Each experiment builds the same session shape as bench.py (warmup + per
attempt clearCache), times variants min-of-2, prints one line per
measurement. Never used by the frozen bench; numbers land in
OPTIMIZATION_r06.md.
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session():
    from ugfraud_spark.plans.session import get_spark

    return get_spark("exp_r06")


def warm(spark):
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    for w in ("pagerank", "multimodal_decode", "dedup_exact"):
        qmap[w](spark, SF_DIR).count()
    spark.catalog.clearCache()


def timeit(spark, label, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    print(f"TIME {label}: {best:.3f}", flush=True)
    return best


def exp_phases(spark):
    """Phase breakdown of the iterative-query input path."""
    from pyspark.sql import functions as F

    from ugfraud_spark.operators import pagerank
    from ugfraud_spark.operators.superstep import colocate_edges
    from ugfraud_spark.sources import tables

    timeit(spark, "lineitem_scan_count",
           lambda: tables.load(spark, SF_DIR, "lineitem").count())
    timeit(spark, "uni_edges_directed_count",
           lambda: tables.uni_edges_directed(spark, SF_DIR).count())
    timeit(spark, "bipartite_edges_count",
           lambda: tables.bipartite_edges(spark, SF_DIR).count())

    def colo():
        e = colocate_edges(
            tables.uni_edges_directed(spark, SF_DIR).select("src", "dst"))
        e.unpersist()

    timeit(spark, "colocate_edges", colo)

    def vb():
        e = colocate_edges(
            tables.uni_edges_directed(spark, SF_DIR).select("src", "dst"))
        base = pagerank._vertex_base(e).persist()
        base.count()
        base.unpersist()
        e.unpersist()

    timeit(spark, "colocate_plus_vertex_base", vb)


def exp_pagerank_ckpt(spark):
    from ugfraud_spark.operators import pagerank
    from ugfraud_spark.sources import tables

    e = tables.uni_edges_directed(spark, SF_DIR)
    for ck in (1, 2, 5):
        timeit(
            spark, f"pagerank_ckpt{ck}",
            lambda ck=ck: pagerank.pagerank(
                e, max_iter=5, checkpoint_every=ck).state.count())


def exp_pagerank_aqe(spark):
    from ugfraud_spark.operators import pagerank
    from ugfraud_spark.sources import tables

    e = tables.uni_edges_directed(spark, SF_DIR)
    for aqe in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        for ck in (1, 5):
            timeit(
                spark, f"pagerank_aqe_{aqe}_ckpt{ck}",
                lambda ck=ck: pagerank.pagerank(
                    e, max_iter=5, checkpoint_every=ck).state.count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")




def exp_colocate_fuse(spark):
    """Can the distinct ride the colocate shuffle? Count Exchanges."""
    from pyspark.sql import functions as F

    from ugfraud_spark.sources import tables

    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    li = tables.load(spark, SF_DIR, "lineitem")
    mod = tables.uni_mod_for(SF_DIR)
    raw = li.select(
        (F.col("l_orderkey") % mod).alias("src"),
        (F.col("l_partkey") % mod).alias("dst"),
    ).where(F.col("src") != F.col("dst"))

    a = raw.distinct().repartition(n, "src")
    b = raw.repartition(n, "src").dropDuplicates()
    c = raw.repartition(n, "src").dropDuplicates().repartition(n, "src")
    for name, df in (("A_distinct_then_repart", a),
                     ("B_repart_then_dropdup", b),
                     ("C_repart_dropdup_repart", c)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(f"PLAN {name}: exchanges={plan.count('Exchange')}")
        timeit(spark, name, lambda df=df: df.count())


def exp_partitions(spark):
    from ugfraud_spark.operators import pagerank
    from ugfraud_spark.sources import tables

    e = tables.uni_edges_directed(spark, SF_DIR)
    for n in (4, 8, 16, 32):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        timeit(spark, f"pagerank_parts{n}",
               lambda: pagerank.pagerank(e, max_iter=5,
                                         checkpoint_every=2).state.count())
    spark.conf.set("spark.sql.shuffle.partitions", "32")


def exp_matrix(spark):
    from ugfraud_spark.operators import pagerank
    from ugfraud_spark.sources import tables

    e = tables.uni_edges_directed(spark, SF_DIR)
    for aqe in ("true", "false"):
        for n in (8, 16, 32):
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            timeit(spark, f"pagerank_aqe{aqe}_p{n}",
                   lambda: pagerank.pagerank(e, max_iter=5).state.count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "phases"
    spark = get_session()
    warm(spark)
    fn = globals()[f"exp_{which}"]
    fn(spark)
    spark.stop()


if __name__ == "__main__":
    main()
