"""Streaming NDV rollup (streaming/sketch_stream.py): bounded multi-batch
run equals the batch rollup; history is a time-travel read."""

import glob
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.sketch import distinct_rollup
from data_diff_spark.sources import versioned as V
from data_diff_spark.streaming.sketch_stream import ndv_rollup_sink, read_rollup


def _write_batches(spark, d, batches):
    """One parquet file per batch in a flat dir so maxFilesPerTrigger=1
    yields one micro-batch per file."""
    d.mkdir()
    staging = d.parent / (d.name + "_stage")
    for i, rows in enumerate(batches):
        pdf = pd.DataFrame(rows, columns=["day", "uid"])
        spark.createDataFrame(pdf).coalesce(1).write.parquet(
            str(staging / str(i))
        )
        src = glob.glob(str(staging / str(i) / "*.parquet"))[0]
        shutil.copy(src, d / f"part-{i}.parquet")
    return str(d)


def test_stream_equals_batch_rollup(spark, tmp_path):
    batches = [
        [("d1", u) for u in range(60)],
        [("d1", u) for u in range(30, 90)] + [("d2", u) for u in range(40)],
        [("d2", u) for u in range(20, 50)] + [("d3", u) for u in range(10)],
    ]
    src = _write_batches(spark, tmp_path / "in", batches)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    root = str(tmp_path / "rollup")
    q = ndv_rollup_sink(
        stream, root, by=["day"], cols=["uid"],
        checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination()
    q.stop()

    got = {
        r.day: (r.uid__ndv, r.n_rows)
        for r in read_rollup(spark, root).collect()
    }
    allrows = [r for b in batches for r in b]
    want = {
        r.day: (r.uid__ndv, r.n_rows)
        for r in distinct_rollup(
            spark.createDataFrame(allrows, "day string, uid long"),
            ["day"], ["uid"],
        ).collect()
    }
    assert got == want
    # known exact values (small cardinalities are exact in sparse mode)
    assert got["d1"][0] == 90 and got["d2"][0] == 50 and got["d3"][0] == 10

    # history: one version per non-empty batch, time-travel shows growth
    hist = V.history(root)
    assert len(hist) == 3
    v1 = {r.day: r.uid__ndv for r in read_rollup(spark, root, 1).collect()}
    assert v1 == {"d1": 60}
    v2 = {r.day: r.uid__ndv for r in read_rollup(spark, root, 2).collect()}
    assert v2 == {"d1": 90, "d2": 40}
