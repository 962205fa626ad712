"""Run EVERY shadow-registry entry against its DuckDB oracle at an
arbitrary scale (default sf0.01 — the driver's gate scale, which
tests/test_oracle_parity.py does NOT cover for shadow entries; it runs
sf0.001). This sweep is what caught harmonic_centrality's rounding-tie
divergence (114/9931 vertices flipped ONLY at sf0.01 — PLANS.md §40).

Usage: python scripts/shadow_gate.py [sf_dir]
Exits nonzero on any mismatch.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from ugfraud_spark import registry as R                    # noqa: E402
from ugfraud_spark.plans.session import get_spark          # noqa: E402
from ugfraud_spark.sources.tables import TABLES, uni_mod_for  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("shadow_gate", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    shadow = R.build_shadow_registry(uni_mod=uni_mod_for(sf))
    bad = []
    for name, (fn, sql) in shadow.items():
        if not sql:
            continue
        srows = {tuple(sorted(r.asDict().items()))
                 for r in fn(spark, sf).collect()}
        res = con.execute(sql)
        cols = [d[0] for d in res.description]
        drows = {tuple(sorted(zip(cols, row))) for row in res.fetchall()}
        ok = srows == drows
        if not ok:
            bad.append(name)
        print(f"{name}: n={len(srows)} ok={ok}", flush=True)
    print("FAILED:", bad if bad else "none")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
