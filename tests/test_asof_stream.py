"""Streaming as-of (temporal) join vs the batch asof_join.

The bounded-input streaming run (multiple micro-batches via
maxFilesPerTrigger=1) must reduce to EXACTLY the batch operator's
result; a hand-built scenario pins the state mechanics (late right rows
improving provisional matches across batches)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.temporal import asof_join
from data_diff_spark.streaming.asof_stream import (
    asof_stream_batch_equivalent,
    reduce_to_final,
)


@pytest.fixture(scope="module")
def stream_final(spark, sf_dir):
    return asof_stream_batch_equivalent(spark, sf_dir).persist()


def _batch_truth(spark, sf_dir):
    from data_diff_spark.sources.connect import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    left = ev.select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(left, purchases, on="ts", by=["user_id"], prefix="purchase_")


def test_stream_equals_batch_asof(spark, sf_dir, stream_final):
    want = {
        (r.event_id, r.purchase_ts, r.purchase_value)
        for r in _batch_truth(spark, sf_dir)
        .select(
            "event_id",
            F.unix_micros("purchase_ts").alias("purchase_ts"),
            "purchase_value",
        )
        .collect()
    }
    got = {
        (r.event_id, r.purchase_us, r.purchase_value)
        for r in stream_final.collect()
    }
    assert len(got) == len(want)
    assert got == want


def test_every_event_appears_once(spark, sf_dir, stream_final):
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert stream_final.count() == n_events
    assert (
        stream_final.groupBy("event_id").count().filter("count > 1").count() == 0
    )


def test_multibatch_state_crossing(spark, tmp_path):
    """Right rows arriving in a LATER micro-batch than the left rows they
    match: the provisional emission (no match / stale match) must be
    superseded by the re-emission, and the reduce must pick the final."""
    d = tmp_path / "ev"
    d.mkdir()
    # batch 1 (file a): left events at t=10, 20 for user 1; right at t=5
    # batch 2 (file b): right rows at t=15 (improves event at 20) and a
    #                   left event at t=30
    rows_a = pd.DataFrame({
        "event_id": [1, 2, 100],
        "user_id": [1, 1, 1],
        "ts": pd.to_datetime([10, 20, 5], unit="s", utc=True),
        "event_type": ["view", "view", "purchase"],
        "value": [np.nan, np.nan, 50.0],
    })
    rows_b = pd.DataFrame({
        "event_id": [101, 3],
        "user_id": [1, 1],
        "ts": pd.to_datetime([15, 30], unit="s", utc=True),
        "event_type": ["purchase", "view"],
        "value": [70.0, np.nan],
    })
    spark.createDataFrame(rows_a).coalesce(1).write.parquet(str(d / "a"))
    spark.createDataFrame(rows_b).coalesce(1).write.parquet(str(d / "b"))
    # flatten into one directory of two files so maxFilesPerTrigger=1
    # yields two micro-batches (order of files is not guaranteed; both
    # orders must reduce to the same final answer)
    import glob
    import shutil

    flat = tmp_path / "flat"
    flat.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(d / "*" / "*.parquet")))):
        shutil.copy(f, flat / f"part-{i}.parquet")

    schema = spark.read.parquet(str(flat)).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    from data_diff_spark.streaming.asof_stream import asof_join_stream
    from data_diff_spark.streaming.events_stream import run_to_completion

    ev = stream
    pu = stream.filter(F.col("event_type") == "purchase")
    sink = run_to_completion(asof_join_stream(ev, pu), mode="update")
    got = {
        (r.event_id, r.purchase_us, r.purchase_value)
        for r in reduce_to_final(sink).collect()
    }
    s = 1_000_000
    assert got == {
        (1, 5 * s, 50.0),    # t=10 -> purchase at 5
        (2, 15 * s, 70.0),   # t=20 -> improved by late-arriving t=15
        (3, 15 * s, 70.0),   # t=30 -> purchase at 15
        (100, 5 * s, 50.0),  # purchases are left events too
        (101, 15 * s, 70.0),
    }


def test_no_match_stays_null(spark, tmp_path):
    d = tmp_path / "flat2"
    d.mkdir()
    rows = pd.DataFrame({
        "event_id": [1, 100],
        "user_id": [1, 1],
        "ts": pd.to_datetime([10, 20], unit="s", utc=True),
        "event_type": ["view", "purchase"],
        "value": [np.nan, 9.0],
    })
    spark.createDataFrame(rows).coalesce(1).write.parquet(str(d / "x"))
    schema = spark.read.parquet(str(d / "x")).schema
    stream = spark.readStream.schema(schema).parquet(str(d / "x"))
    from data_diff_spark.streaming.asof_stream import asof_join_stream
    from data_diff_spark.streaming.events_stream import run_to_completion

    sink = run_to_completion(
        asof_join_stream(stream, stream.filter(F.col("event_type") == "purchase")),
        mode="update",
    )
    got = {
        (r.event_id, r.purchase_us, r.purchase_value)
        for r in reduce_to_final(sink).collect()
    }
    # the view at t=10 precedes every purchase: left-outer null match
    assert got == {(1, None, None), (100, 20_000_000, 9.0)}


def test_key_with_no_right_rows_ever(spark, tmp_path):
    """A key whose right history is EMPTY when its left rows are scored
    (user 2 never purchases): the state update must emit all-null matches
    instead of indexing into a size-0 history array (r4 advice, high)."""
    d = tmp_path / "flat3"
    d.mkdir()
    rows = pd.DataFrame({
        "event_id": [1, 2, 100],
        "user_id": [2, 2, 1],
        "ts": pd.to_datetime([10, 20, 15], unit="s", utc=True),
        "event_type": ["view", "view", "purchase"],
        "value": [np.nan, np.nan, 5.0],
    })
    spark.createDataFrame(rows).coalesce(1).write.parquet(str(d / "x"))
    schema = spark.read.parquet(str(d / "x")).schema
    stream = spark.readStream.schema(schema).parquet(str(d / "x"))
    from data_diff_spark.streaming.asof_stream import asof_join_stream
    from data_diff_spark.streaming.events_stream import run_to_completion

    sink = run_to_completion(
        asof_join_stream(stream, stream.filter(F.col("event_type") == "purchase")),
        mode="update",
    )
    got = {
        (r.event_id, r.purchase_us, r.purchase_value)
        for r in reduce_to_final(sink).collect()
    }
    assert got == {
        (1, None, None),
        (2, None, None),
        (100, 15_000_000, 5.0),
    }
