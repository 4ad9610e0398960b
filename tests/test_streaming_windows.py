"""Event-time windows + sessions: batch/streaming parity and oracles.

The contract: ONE implementation (streaming/windows.py) produces
identical results as a batch DataFrame op and as a Structured Streaming
query over the same rows — plus DuckDB oracle twins for the batch form
(wired as contract rows events_windowed_counts / events_sessionized).
"""

import datetime as dt
import os

import pytest

from pg_textsearch_spark.streaming.windows import (
    sessionize, windowed_event_counts)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark):
    rows = []
    eid = 0
    # user 1: two sessions (gap > 30 min between event 2 and 3)
    for mins in (0, 10, 55, 60):
        rows.append((eid, T0 + dt.timedelta(minutes=mins), 1,
                     "click" if mins % 20 else "view", float(mins + 1)))
        eid += 1
    # user 2: one long session crossing window boundaries
    for mins in (5, 25, 45):
        rows.append((eid, T0 + dt.timedelta(minutes=mins), 2,
                     "click", 2.5))
        eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def test_windowed_counts_batch(spark):
    out = windowed_event_counts(_events(spark), window="10 minutes").collect()
    assert out[0]["window_start"] == T0
    total = sum(r["n_events"] for r in out)
    assert total == 7
    # window [0,10) holds user1@0min (view) and user2@5min (click)
    first = [r for r in out if r["window_start"] == T0]
    assert {(r["event_type"], r["n_events"]) for r in first} == \
        {("view", 1), ("click", 1)}


def test_sessionize_batch(spark):
    out = sessionize(_events(spark), gap="30 minutes").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2          # 45-min gap splits user 1
    assert by_user[1][0]["n_events"] == 2
    assert by_user[1][1]["n_events"] == 2
    assert len(by_user[2]) == 1          # 20-min gaps keep user 2 whole
    assert by_user[2][0]["n_events"] == 3
    assert by_user[2][0]["total_value"] == pytest.approx(7.5)


def test_streaming_parity(spark, tmp_path):
    """The SAME functions over a file-source stream reproduce the batch
    results exactly (windowed counts AND session windows)."""
    events = _events(spark)
    src = str(tmp_path / "src")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    batch_w = {((r["window_start"]), r["event_type"]):
               (r["n_events"], r["total_value"], r["avg_value"])
               for r in windowed_event_counts(events).collect()}
    q = (windowed_event_counts(stream, watermark="1 hour")
         .writeStream.format("memory").queryName("win_par")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {((r["window_start"]), r["event_type"]):
           (r["n_events"], r["total_value"], r["avg_value"])
           for r in spark.sql("select * from win_par").collect()}
    assert got == batch_w

    batch_s = {(r["user_id"], r["session_start"]):
               (r["session_end_ts"], r["n_events"], r["total_value"])
               for r in sessionize(events, gap="30 minutes").collect()}
    q = (sessionize(stream, gap="30 minutes", watermark="1 hour")
         .writeStream.format("memory").queryName("sess_par")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["user_id"], r["session_start"]):
           (r["session_end_ts"], r["n_events"], r["total_value"])
           for r in spark.sql("select * from sess_par").collect()}
    assert got == batch_s


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed agg with a watermark: a row arriving behind
    the watermark is dropped (late-data semantics), and only finalized
    windows emit."""
    events = _events(spark)
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    # batch 1: everything up to minute 60
    events.coalesce(1).write.mode("append").parquet(src)
    ckpt = str(tmp_path / "ckpt")   # shared: carries the watermark across
    sink = str(tmp_path / "sink")   # parquet sink: resumable from ckpt
    stream = spark.readStream.schema(events.schema).parquet(src)

    def run_once():
        q = (windowed_event_counts(stream, window="10 minutes",
                                   watermark="10 minutes")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    # batch 2: one VERY late row (minute 1 — watermark is 60-10=50 min)
    late = spark.createDataFrame(
        [(99, T0 + dt.timedelta(minutes=1), 9, "late", 1.0)],
        events.schema)
    late.coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = spark.read.parquet(sink).collect()
    # the late 'late'-type row must NOT appear in any finalized window
    assert not [r for r in rows if r["event_type"] == "late"]
