"""Streaming NDV maintenance: fold a stream into a versioned sketch rollup.

The batch side (operators/sketch.py) maintains per-group HLL distinct
sketches by lossless union. The streaming-native version mirrors
streaming/cdc_stream.py's composition — foreachBatch over this engine's
own primitives, state stored in a versioned table so the rollup carries
history ("what was the distinct-user curve yesterday" is a time-travel
read, and version_diff shows which groups a day touched):

    head = versioned.read_version(root)            # current rollup
    next = refresh_distinct_rollup(head, batch)    # union-merge sketches
    versioned.commit(next, root)                   # store changed groups

Delivery semantics, stated honestly: foreachBatch is at-least-once.
HLL insertion is idempotent (re-observing a value cannot change the
registers), so the NDV estimates converge to exactly-once correctness
under replay; the companion n_rows counter is NOT idempotent and is
at-least-once — treat it as a throughput gauge, not an exact count
(the exact-count story is operators/incremental.py over a real CDC
feed). Groups a batch never touches pass through the refresh unchanged
and the versioned commit stores only changed groups.

Scale: the rollup is |groups| rows of kilobyte sketches — the whole
point of the pattern; per batch the wide work is one groupBy of the
batch plus one full-outer join against the rollup.
"""

from __future__ import annotations

import os
from typing import List, Sequence

from pyspark.sql import DataFrame

from data_diff_spark.operators.sketch import (
    DEFAULT_LG_K,
    _est,
    distinct_rollup,
    refresh_distinct_rollup,
)
from data_diff_spark.sources import versioned as V


def ndv_rollup_sink(
    stream: DataFrame,
    root: str,
    by: Sequence[str],
    cols: Sequence[str],
    checkpoint_dir: str,
    lg_k: int = DEFAULT_LG_K,
    available_now: bool = False,
):
    """Start the streaming query maintaining the sketch rollup at `root`
    (created on first non-empty batch as a versioned table keyed by the
    group columns). Returns the StreamingQuery."""
    by = list(by)
    cols = list(cols)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        spark = batch_df.sparkSession
        if not os.path.exists(os.path.join(root, V.MANIFEST)):
            V.create_table(
                distinct_rollup(batch_df, by, cols, lg_k), root, keys=by
            )
            return
        head = V.read_version(spark, root)
        V.commit(refresh_distinct_rollup(head, batch_df, by, cols, lg_k), root)

    w = stream.writeStream.foreachBatch(fold).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def read_rollup(spark, root: str, version: int | None = None) -> DataFrame:
    """The rollup at a version (None = latest) — a plain versioned read,
    named for discoverability next to the sink."""
    return V.read_version(spark, root, version)


def ndv_rollup_batch_equivalent(spark, sf_dir: str, n_batches: int | None = None):
    """Driver-gate harness (VERDICT r6 ask #3): fold the bounded events
    stream into a FRESH versioned sketch rollup across ~n_batches
    micro-batches (the relaid multi-file copy split by maxFilesPerTrigger,
    so the union-merge path genuinely runs), then return
    (batch_rollup_df, final_stream_rollup_df) over (event_type, n_rows,
    user_id NDV) for a `_must_equal` arm. Equality is the module's own
    losslessness contract made load-bearing: estimate(union of per-batch
    sketches) == estimate(one-shot sketch) exactly, and n_rows is
    exactly-once for a clean AvailableNow run. The final rollup is
    |event_type| rows — bounded driver collect by design — so the scratch
    table can be deleted before returning."""
    import glob
    import shutil
    import tempfile

    from data_diff_spark import workload as _wl
    from data_diff_spark.streaming.events_stream import (
        _as_stream_dir,
        bounded_stream_sizing,
        table_rows,
    )

    _wl.load_views(spark, sf_dir)
    if n_batches is None:  # the one bounded-stream sizing rule
        n_batches, _ = bounded_stream_sizing(
            table_rows(spark, sf_dir), spark.sparkContext.defaultParallelism)
    by, cols = ["event_type"], ["user_id"]
    batch = distinct_rollup(
        spark.table("events").select("event_type", "user_id"), by, cols)

    src = f"{sf_dir}/events.parquet"
    relaid = getattr(_wl, "_INGEST_PATHS", {}).get(src)
    reader = spark.readStream.option("pathGlobFilter", "part-*")
    if relaid:
        nfiles = len(glob.glob(os.path.join(relaid, "part-*")))
        reader = reader.schema(spark.read.parquet(relaid).schema).option(
            "maxFilesPerTrigger", max(1, -(-nfiles // n_batches)))
        sdir = relaid
    else:  # single-file original: one batch, merge path pinned in pytest
        reader = reader.option("pathGlobFilter", "*.parquet").schema(
            spark.read.parquet(src).schema)
        sdir = _as_stream_dir(sf_dir, "events")
    stream = reader.parquet(sdir).select("event_type", "user_id")

    scratch = tempfile.mkdtemp(prefix="ndv_gate_")
    root = os.path.join(scratch, "rollup")
    try:
        q = ndv_rollup_sink(stream, root, by, cols,
                            os.path.join(scratch, "ckpt"), available_now=True)
        q.awaitTermination()
        q.stop()
        if not os.path.exists(os.path.join(root, V.MANIFEST)):
            # fold() creates the table on the first non-empty batch; its
            # absence means the bounded stream delivered NOTHING — a
            # harness bug, never a valid (empty) rollup
            raise RuntimeError(
                "ndv gate: streaming fold saw no data — the bounded "
                "events stream was empty")
        final = read_rollup(spark, root).select(
            "event_type", "n_rows", _est("user_id"))
        final = spark.createDataFrame(final.collect(), final.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return batch.select("event_type", "n_rows", _est("user_id")), final
