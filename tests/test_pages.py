"""Pages substrate: byte-identical extraction invariant (input_hint) and
pages→edges derivation."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ugfraud_spark.sources import pages as P


def test_generation_is_order_independent(spark):
    a = P.generate_pages(spark, 200, seed=7, partitions=2).orderBy("url").collect()
    b = P.generate_pages(spark, 200, seed=7, partitions=13).orderBy("url").collect()
    assert a == b


def test_text_extraction_byte_identical(spark):
    pg = P.generate_pages(spark, 300, seed=42, partitions=4)
    # distributed Arrow UDF extraction vs the stored reference text column
    withx = pg.select(
        "url",
        F.md5(F.col("text").cast("binary")).alias("ref_md5"),
        F.md5(P.text_udf(F.col("html")).cast("binary")).alias("udf_md5"),
    )
    bad = withx.where(F.col("ref_md5") != F.col("udf_md5")).count()
    assert bad == 0
    # and vs a driver-side single-node loop (the S6 md5 integrity pattern)
    rows = pg.select("url", "html", "text").collect()
    for r in rows[:50]:
        assert P.extract_text_single(r["html"]) == r["text"]
        assert (
            hashlib.md5(r["text"].encode()).hexdigest()
            == hashlib.md5(P.extract_text_single(r["html"]).encode()).hexdigest()
        )


def test_pages_to_edges_zipf_hubs(spark):
    pg = P.generate_pages(spark, 500, seed=42, partitions=4)
    e = P.pages_to_edges(pg)
    n = e.count()
    assert n > 500  # ~8 links/page minus self/dedup
    assert e.columns == ["src", "dst", "weight"]
    # Zipfian target distribution ⇒ strong in-degree skew
    deg = e.groupBy("dst").count().orderBy(F.desc("count")).collect()
    top, med = deg[0]["count"], deg[len(deg) // 2]["count"]
    assert top > 10 * med
    # no self loops, deduped
    assert e.where(F.col("src") == F.col("dst")).count() == 0
    assert e.groupBy("src", "dst").count().where(F.col("count") > 1).count() == 0
