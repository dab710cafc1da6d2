"""Streaming drift monitor (streaming/drift_stream.py): the baseline
ruler never moves, a clean batch scores ~0, a shifted batch is flagged,
and the streaming sink appends one report per micro-batch."""

import os
import shutil
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_diff_spark.streaming.drift_stream import DriftMonitor

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture(scope="module")
def monitor(spark):
    rng = np.random.default_rng(4)
    base = spark.createDataFrame(
        [(float(v), s) for v, s in zip(rng.normal(0, 1, 3000),
                                       rng.choice(["a", "b", "c"], 3000))],
        "v double, s string",
    )
    return DriftMonitor(base, columns=["v", "s"])


def test_score_clean_vs_shifted(spark, monitor):
    rng = np.random.default_rng(5)
    clean = spark.createDataFrame(
        [(float(v), s) for v, s in zip(rng.normal(0, 1, 2000),
                                       rng.choice(["a", "b", "c"], 2000))],
        "v double, s string",
    )
    rows = {r[1]: r for r in monitor.score(clean)}
    assert not rows["v"][6] and not rows["s"][6]  # not drifted
    shifted = clean.withColumn("v", F.col("v") + 5).withColumn("s", F.lit("zzz"))
    rows = {r[1]: r for r in monitor.score(shifted)}
    assert rows["v"][6] and rows["s"][6]
    assert monitor.score(clean.limit(0)) == []  # empty batch skipped


def test_streaming_sink_reports_per_batch(spark, monitor, tmp_path):
    src = os.path.join(SCRATCH, "drift_batches")
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    rng = np.random.default_rng(6)
    batches = [
        pd.DataFrame({"v": rng.normal(0, 1, 500), "s": ["a"] * 500}),   # clean-ish
        pd.DataFrame({"v": rng.normal(9, 1, 500), "s": ["zz"] * 500}),  # drifted
    ]
    for i, b in enumerate(batches):
        p = os.path.join(src, f"b{i}.parquet")
        b.to_parquet(p)
        t = time.time() - 10 + i
        os.utime(p, (t, t))
    stream = (
        spark.readStream.schema("v double, s string")
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    spark.sql("drop table if exists drift_reports")
    q = monitor.sink(stream, str(tmp_path / "ck"), "drift_reports", trigger_once=True)
    q.awaitTermination(120)
    rep = spark.table("drift_reports")
    assert rep.select("batch_id").distinct().count() == 2
    by_batch = {
        (r["batch_id"], r["column"]): r["drifted"] for r in rep.collect()
    }
    assert by_batch[(1, "v")]  # the shifted batch flagged on the numeric
    assert not by_batch[(0, "v")]
    spark.sql("drop table if exists drift_reports")
