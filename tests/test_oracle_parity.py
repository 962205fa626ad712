"""Pre-validate the driver's cross-engine correctness gate: run every
registered Spark query and its DuckDB oracle SQL on sf0.001 and compare
row counts, column names, and (order-insensitively) values — the same
contract the driver applies at sf0.01."""

from __future__ import annotations

import math

import duckdb
import pytest

from ugfraud_spark.registry import build_registry, build_shadow_registry
from ugfraud_spark.sources.tables import TABLES, uni_mod_for

# re-render the oracles for sf0.001 (unipartite modulus 1000; the
# driver-facing REGISTRY is rendered for sf0.01 / modulus 10000);
# shadow entries are oracle-checked here but don't consume one of the
# driver's 50 CORRECTNESS slots
_MOD = uni_mod_for("/root/testdata/sf0.001")
REGISTRY = build_registry(uni_mod=_MOD) | build_shadow_registry(uni_mod=_MOD)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _normalize(rows, colnames):
    out = []
    for row in rows:
        vals = []
        for c in sorted(colnames):
            v = row[c]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


@pytest.mark.parametrize("name", [n for n, (_f, s) in REGISTRY.items() if s])
def test_query_matches_oracle(spark, sf_small, name):
    fn, sql = REGISTRY[name]
    # fixture-parquet oracles (reference-computed) are registered against
    # the driver's sf0.01; point them at the sf0.001 fixture here
    sql = sql.replace("/fixtures/oracle/sf0.01/", "/fixtures/oracle/sf0.001/")
    sdf = fn(spark, sf_small)
    spark_rows = [r.asDict() for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(sf_small)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [dict(zip(duck_cols, row)) for row in res.fetchall()]
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_norm = _normalize(spark_rows, spark_cols)
    d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm)
        if not _rows_close(a, b)
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=0, abs_tol=2e-6):
                return False
        elif x != y:
            return False
    return True
