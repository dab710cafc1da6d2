"""Watermark semantics: sufficiently late data is dropped, and append mode
emits only watermark-closed windows.

Four micro-batches (mtime-ordered files, maxFilesPerTrigger=1):
  batch 1: events at 10:00, 10:30  -> window [10:00) open
  batch 2: event at 12:30           -> watermark advances to 11:30
  batch 3: LATE event at 05:00      -> dropped (numRowsDroppedByWatermark=1
                                       observed while building this test)
  batch 4: event at 13:00           -> advances watermark, closes [10:00)

Append result: exactly one emitted row — window 10:00 with n=2 — and the
still-open windows (12:00, 13:00) are never emitted.

Observed boundary (documented, not asserted): Spark admits late rows whose
window END is still within watermark - delay — an event only ~1h late with
a 1h watermark merges into live state rather than being dropped. Dropping
is guaranteed only for lateness beyond delay + window size.
"""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture()
def staged_dir():
    out = os.path.join(SCRATCH, "watermark_events")
    os.makedirs(out, exist_ok=True)
    for old in os.listdir(out):
        os.remove(os.path.join(out, old))
    batches = [
        [("2024-01-01 10:00:00", 1.0), ("2024-01-01 10:30:00", 2.0)],
        [("2024-01-01 12:30:00", 4.0)],
        [("2024-01-01 05:00:00", 8.0)],   # far beyond the watermark: dropped
        [("2024-01-01 13:00:00", 16.0)],
    ]
    for i, rows in enumerate(batches):
        path = os.path.join(out, f"b{i}.parquet")
        pd.DataFrame(
            {"ts": pd.to_datetime([r[0] for r in rows]), "value": [r[1] for r in rows]}
        ).to_parquet(path, coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(path, (1_700_000_000 + i * 60,) * 2)
    return out


def test_late_data_dropped_and_append_emits_closed_windows(spark, staged_dir):
    from data_diff_spark.streaming.events_stream import run_to_completion

    schema = spark.read.parquet(staged_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged_dir)
        # watermarks require TIMESTAMP (tz), not NTZ; session tz is UTC
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .select(F.col("w.start").alias("hour"), "n", "sv")
    )
    got = run_to_completion(agg, mode="append").collect()
    assert len(got) == 1
    row = got[0]
    assert str(row.hour) == "2024-01-01 10:00:00"
    assert row.n == 2 and row.sv == 3.0  # the 05:00 late event (8.0) dropped


def test_streaming_dedup_across_batches(spark):
    """A key redelivered in a LATER micro-batch (within the watermark
    horizon) must still be dropped — state carries across batches."""
    from data_diff_spark.streaming.events_stream import run_to_completion, streaming_dedup

    out = os.path.join(SCRATCH, "dedup_events")
    os.makedirs(out, exist_ok=True)
    for old in os.listdir(out):
        os.remove(os.path.join(out, old))
    batches = [
        [(1, "2024-01-01 10:00:00", 1.0), (2, "2024-01-01 10:05:00", 2.0)],
        [(1, "2024-01-01 10:10:00", 99.0), (3, "2024-01-01 10:20:00", 3.0)],  # 1 redelivered
    ]
    for i, rows in enumerate(batches):
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]),
                "value": [r[2] for r in rows],
            }
        ).to_parquet(os.path.join(out, f"b{i}.parquet"), coerce_timestamps="us",
                     allow_truncated_timestamps=True)
        os.utime(os.path.join(out, f"b{i}.parquet"), (1_700_000_000 + i * 60,) * 2)
    schema = spark.read.parquet(out).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(out)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got = run_to_completion(
        streaming_dedup(stream, ["event_id"], watermark="1 hour").select("event_id", "value"),
        mode="append",
    )
    rows = {r["event_id"]: r["value"] for r in got.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] == 1.0  # the FIRST delivery wins; the batch-2 copy was dropped


def test_sliding_rollup_equals_batch_and_manual_replay(spark, sf_dir):
    """Streaming sliding windows on bounded input == batch F.window ==
    a from-first-principles replay (each event exploded into the 4
    overlapping 1h/15m windows that contain it)."""
    from data_diff_spark.sources.connect import normalize_event_ts
    from data_diff_spark.streaming.events_stream import (
        sliding_rollup_batch_equivalent,
    )

    got = sliding_rollup_batch_equivalent(spark, sf_dir)

    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    batch = (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(38,4)")).alias("d"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n",
                F.col("d").cast("double").alias("total_value"))
    )
    manual = (
        ev.select(
            "event_type", "value",
            F.explode(F.expr(
                # latest slide boundary <= ts, then the 3 earlier ones that
                # still contain ts (window length 1h = 4 slides)
                "sequence(0, 3)"
            )).alias("i"),
            F.col("ts").alias("ts"),
        )
        .withColumn(
            "win_start",
            F.timestamp_seconds(
                (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 900) - F.col("i") * 900
            ),
        )
        .groupBy("win_start", "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(38,4)")).alias("d"))
        .select("win_start", "event_type", "n", F.col("d").cast("double").alias("total_value"))
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, batch.collect()))
    c = sorted(map(tuple, manual.collect()))
    assert a == b == c
    assert len(a) > 0
