"""Streaming CDC sink (streaming/cdc_stream.py): micro-batch SCD2 merges
into a versioned dimension; bounded result equals sequential batch
merges; replayed batches are no-ops (at-least-once -> exactly-once state)."""

import datetime
import os
import shutil
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.scd import merge_scd2
from data_diff_spark.sources import versioned as V
from data_diff_spark.streaming.cdc_stream import scd2_stream_sink

TS = datetime.datetime
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")

BATCH1 = [(1, "a1", TS(2021, 1, 1)), (2, "b", TS(2021, 1, 1))]
BATCH2 = [(1, "a2", TS(2021, 2, 1)), (3, "c", TS(2021, 2, 1))]


def _stage(dirname, batches):
    out = os.path.join(SCRATCH, dirname)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for i, rows in enumerate(batches):
        p = os.path.join(out, f"b{i}.parquet")
        df = pd.DataFrame(rows, columns=["k", "v", "effective_ts"])
        # µs timestamps: the shared session reads ns-parquet as long
        # (nanosAsLong, see sources/connect.normalize_event_ts)
        df["effective_ts"] = df["effective_ts"].astype("datetime64[us]")
        df.to_parquet(p)
        t = time.time() - 100 + i  # mtime order = batch order
        os.utime(p, (t, t))
    return out


@pytest.fixture()
def dim_root(spark, tmp_path):
    dim = spark.createDataFrame(
        [(1, "a", TS(2020, 1, 1), None, True), (2, "b", TS(2020, 1, 1), None, True)],
        "k long, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    root = str(tmp_path / "dim")
    V.create_table(dim, root, ["k", "valid_from"])
    return root


def _run(spark, root, src_dir, ckpt):
    stream = (
        spark.readStream.schema("k long, v string, effective_ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = scd2_stream_sink(stream, root, ["k"], checkpoint_dir=ckpt, trigger_once=True)
    q.awaitTermination(120)


def test_stream_equals_sequential_batch_merges(spark, dim_root, tmp_path):
    src = _stage("cdc_changes", [BATCH1, BATCH2])
    _run(spark, dim_root, src, str(tmp_path / "ck"))

    got = V.read_version(spark, dim_root)
    # reference: fold the same batches through batch merge_scd2
    want = spark.createDataFrame(
        [(1, "a", TS(2020, 1, 1), None, True), (2, "b", TS(2020, 1, 1), None, True)],
        "k long, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    for rows in (BATCH1, BATCH2):
        b = spark.createDataFrame(rows, "k long, v string, effective_ts timestamp")
        want = merge_scd2(want, b, keys=["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # k=1: original + two versions; current one is a2
    cur = {r["k"]: r["v"] for r in got.filter("is_current").collect()}
    assert cur == {1: "a2", 2: "b", 3: "c"}
    # two non-empty merges -> versions 2 and 3
    assert V.history(dim_root)[-1]["version"] == 3


def test_replayed_batch_is_noop(spark, dim_root, tmp_path):
    src = _stage("cdc_changes2", [BATCH1])
    _run(spark, dim_root, src, str(tmp_path / "ck1"))
    v_after = V.history(dim_root)[-1]["version"]
    # simulate at-least-once: same rows arrive again (fresh checkpoint =
    # the sink genuinely re-processes them)
    _run(spark, dim_root, src, str(tmp_path / "ck2"))
    assert V.history(dim_root)[-1]["version"] == v_after  # zero-diff commit skipped
