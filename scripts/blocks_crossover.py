#!/usr/bin/env python
"""Measure the join+agg vs CSR-block-SpMV PageRank crossover (VERDICT
r4 #5): the north_star's block layout (`adjacency.py`) pays an Arrow
round-trip per superstep but shuffles the edge payload only once, so it
should win as |E| grows relative to |V|-sized state traffic. This
script produces the measured curve that PLANS.md §76 documents.

Usage:  python scripts/blocks_crossover.py [edge counts ...]
Prints one JSON line per (size, kernel): wall seconds for the 8-superstep
iterate loop (build/layout time reported separately), min of 2 runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ugfraud_spark.operators import pagerank  # noqa: E402
from ugfraud_spark.plans.session import get_spark  # noqa: E402
from ugfraud_spark.sources import tables  # noqa: E402

ITERS = 8
VERT_RATIO = 16  # |E| / |V|, the bench generator's Zipf shape


def run_one(spark, n_edges: int, kernel: str) -> dict:
    edges = tables.synthetic_web_edges(spark, n_edges, n_edges // VERT_RATIO)
    t0 = time.time()
    if kernel == "join":
        res = pagerank.pagerank(edges, max_iter=ITERS, checkpoint_every=1)
    else:
        res = pagerank.pagerank_blocks(edges, max_iter=ITERS)
    res.state.count()
    total = time.time() - t0
    spark.catalog.clearCache()
    return {
        "kernel": kernel,
        "edges": n_edges,
        "iterate_s": round(res.wall_seconds, 2),
        "build_s": round(total - res.wall_seconds, 2),
        "edges_per_sec": round(n_edges * ITERS / res.wall_seconds),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2_000_000, 8_000_000,
                                               32_000_000]
    spark = get_spark("blocks_crossover")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # untimed session warmup of BOTH kernels: whole-stage-codegen
        # JIT and python-worker startup otherwise land in whichever
        # (size, kernel) cell runs first and skew the curve (measured:
        # the first join cell read 1.7x its warm self)
        for kernel in ("join", "blocks"):
            run_one(spark, 1_000_000, kernel)
        for n in sizes:
            for kernel in ("join", "blocks"):
                best = None
                for _ in range(2):
                    r = run_one(spark, n, kernel)
                    if best is None or r["iterate_s"] < best["iterate_s"]:
                        best = r
                print("CROSSOVER " + json.dumps(best), flush=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    spark.stop()


if __name__ == "__main__":
    main()
