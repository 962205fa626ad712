"""Streaming exact dedup (streaming/events.py:run_stream_dedup). The
cross-engine gate (doubled delivery → recover the raw events view) runs
in test_oracle_parity; this test proves the redelivery is REAL — the
un-deduped drain of the same symlinked source sees deliveries×N rows —
so the gate can't pass by silently reading one copy."""

from __future__ import annotations

import os
import tempfile

from ugfraud_spark.streaming.events import EVENT_SCHEMA, run_stream_dedup

SRC = "/root/testdata/sf0.001/events.parquet"


def test_stream_dedup_recovers_batch_and_redelivery_is_real(spark):
    batch = spark.read.parquet(SRC)
    n = batch.count()

    # control: the same symlink fan-out WITHOUT dropDuplicates yields 3N
    tmp = tempfile.mkdtemp(prefix="dedup_ctrl_")
    for i in range(3):
        os.symlink(SRC, os.path.join(tmp, f"d{i}_events.parquet"))
    raw = spark.readStream.schema(EVENT_SCHEMA).parquet(tmp)
    q = (raw.writeStream.format("memory").queryName("dedup_ctrl")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    assert spark.table("dedup_ctrl").count() == 3 * n

    out = run_stream_dedup(spark, SRC, deliveries=3)
    got = {tuple(sorted(r.asDict().items())) for r in out.collect()}
    exp = {
        tuple(sorted(r.asDict().items()))
        for r in spark.sql(
            f"SELECT event_id, ts, user_id, event_type, "
            f"ROUND(value, 6) AS value FROM parquet.`{SRC}`"
        ).collect()
    }
    assert got == exp


def test_stream_incremental_dedup_microbatch_invariant(spark, sf_small):
    """The streaming admission check must produce EXACTLY the one-shot
    batch result however the stream is micro-batched: split the source
    into 3 files and force one file per trigger (3 real micro-batches),
    then compare against the batch operator on the same split."""
    import shutil

    from pyspark.sql import functions as F

    from ugfraud_spark.operators.dedup import incremental_dedup
    from ugfraud_spark.streaming.corpus import (
        run_stream_incremental_dedup,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    src_dir = tempfile.mkdtemp(prefix="incr_multi_src_")
    try:
        docs.repartition(3).write.mode("overwrite").parquet(src_dir)
        streamed = run_stream_incremental_dedup(
            spark, src_dir, mod=7, max_files_per_trigger=1)
        m = F.col("doc_id") % 7
        batch = incremental_dedup(docs.where(m != 0), docs.where(m == 0))
        s_rows = sorted(tuple(r) for r in streamed.collect())
        b_rows = sorted(tuple(r) for r in batch.collect())
        assert s_rows == b_rows and len(s_rows) > 0
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)


def test_windowed_approx_distinct_stream_equals_batch_and_is_close(
        spark, sf_small):
    """The HLL windowed-distinct sketch: the REAL streaming run equals
    the batch plan row-for-row (same registers, same estimate), and
    the estimate lands within the m=16 sketch's error envelope of the
    exact per-window distinct count."""
    from pyspark.sql import functions as F

    from ugfraud_spark.sources import tables
    from ugfraud_spark.streaming import events as se

    ev = tables.load(spark, sf_small, "events")
    batch = {r["window_start"]: r for r in
             se.windowed_approx_distinct(ev).collect()}
    stream = {r["window_start"]: r for r in
              se.run_stream_approx_distinct(
                  spark, f"{sf_small}/events.parquet").collect()}
    assert set(batch) == set(stream)
    for k in batch:
        assert batch[k]["n_events"] == stream[k]["n_events"], k
        assert batch[k]["approx_users"] == stream[k]["approx_users"], k

    exact = {r["window_start"]: r["n"] for r in
             ev.groupBy(F.window("ts", "60 minutes").alias("w"))
             .agg(F.count_distinct("user_id").alias("n"))
             .select(F.col("w.start").cast("string").alias("window_start"),
                     "n").collect()}
    assert set(exact) == set(batch)
    for k, n in exact.items():
        est = batch[k]["approx_users"]
        # m=16 HLL: ~26% relative std error; allow a generous 3-sigma
        assert abs(est - n) <= max(0.8 * n, 4), (k, est, n)


def test_attribution_stream_equals_batch_and_known_case(spark, sf_small):
    """The stream-stream interval join recovers the batch join exactly
    on the real events table, and a hand-built case pins the window
    semantics (inclusive bounds, multi-click fan-out, exact-µs gaps)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ugfraud_spark.sources import tables
    from ugfraud_spark.streaming import events as se

    ev = tables.load(spark, sf_small, "events")
    batch = {(r["user_id"], r["purchase_id"], r["click_id"], r["gap_us"])
             for r in se.purchase_attribution(
                 ev.where(F.col("event_type") == "purchase"),
                 ev.where(F.col("event_type") == "click")).collect()}
    stream = {(r["user_id"], r["purchase_id"], r["click_id"], r["gap_us"])
              for r in se.run_stream_attribution(
                  spark, f"{sf_small}/events.parquet").collect()}
    assert batch == stream and len(batch) > 0

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = dt.timedelta
    rows = [
        (1, t0, 7, "click", 0.0, "{}"),                 # 30:00 before: IN
        (2, t0 + mk(minutes=29), 7, "click", 0.0, "{}"),  # in window
        (3, t0 + mk(minutes=30), 7, "purchase", 1.0, "{}"),
        (4, t0 + mk(minutes=31), 7, "click", 0.0, "{}"),  # after: OUT
        (5, t0, 8, "click", 0.0, "{}"),                  # other user: OUT
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    got = {(r["purchase_id"], r["click_id"]): r["gap_us"]
           for r in se.purchase_attribution(
               df.where(F.col("event_type") == "purchase"),
               df.where(F.col("event_type") == "click")).collect()}
    assert got == {(3, 1): 30 * 60 * 1_000_000, (3, 2): 60 * 1_000_000}


def test_sessionize_stream_equals_batch_and_flushes_tail(spark, sf_small):
    """Append-mode session windows drain to EXACTLY the batch session
    set (each session emitted once, none held in state): without the
    sentinel flush the sessions nearest max(ts) would be missing, so
    assert specifically that the session containing the corpus's last
    event is present, and that no sentinel user leaks."""
    import pyspark.sql.functions as F

    from ugfraud_spark.streaming import events as se

    src = f"{sf_small}/events.parquet"
    batch_df = se.sessionize(spark.read.parquet(src))
    batch = {tuple(r) for r in batch_df.collect()}
    out = se.run_stream_sessionize(spark, src)
    stream = {tuple(r) for r in out.collect()}
    assert stream == batch and len(batch) > 0
    assert not any(r[0] == -1 for r in stream)

    ev = spark.read.parquet(src)
    last = ev.orderBy(F.desc("ts")).select("user_id", "ts").first()
    tail_sessions = {r for r in batch if r[0] == last["user_id"]}
    assert tail_sessions & stream == tail_sessions


def test_frontier_stream_microbatch_invariant(spark, sf_small):
    """Streaming frontier admission == the batch anti join under a
    forced 3-micro-batch split, and both admission branches carry
    rows (some urls admitted, some deduped as aliases)."""
    import shutil

    from pyspark.sql import functions as F

    from ugfraud_spark.operators.crawl import normalize_urls, synthetic_urls
    from ugfraud_spark.streaming.corpus import run_stream_frontier

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    src_dir = tempfile.mkdtemp(prefix="frontier_multi_src_")
    try:
        docs.repartition(3).write.mode("overwrite").parquet(src_dir)
        streamed = run_stream_frontier(
            spark, src_dir, mod=9, seen_mod=7, max_files_per_trigger=1)
        d = F.col("doc_id")
        seen = (normalize_urls(synthetic_urls(
                    docs.where((d % 9 != 0) & (d % 7 == 0))))
                .select("url_norm").distinct())
        arriving = normalize_urls(synthetic_urls(docs.where(d % 9 == 0)))
        batch = arriving.join(seen, "url_norm", "left_anti") \
            .select("doc_id", "url", "url_norm", "host")
        s_rows = sorted(tuple(r) for r in streamed.collect())
        b_rows = sorted(tuple(r) for r in batch.collect())
        n_arriving = arriving.count()
        assert s_rows == b_rows
        assert 0 < len(s_rows) < n_arriving   # both branches non-empty
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
