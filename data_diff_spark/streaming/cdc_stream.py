"""Streaming CDC: fold a change stream into a versioned SCD2 dimension.

The reference's diff is a batch question; the streaming-native version of
its workflow is CDC consumption — attribute observations arrive
continuously and the dimension keeps full history. This sink composes
three of this engine's primitives per micro-batch, via foreachBatch:

    head   = versioned.read_version(root)          # current dimension
    merged = scd.merge_scd2(head, batch, keys)     # close/insert/history
    versioned.commit(merged, root)                 # store DIFF rows only

Delivery semantics: foreachBatch is at-least-once, and this pipeline is
IDEMPOTENT under replay — a re-delivered batch re-observes attribute
values already current, merge_scd2 no-ops them, and the zero-diff commit
is skipped (versioned.commit skip_empty), so the log does not grow.
That turns at-least-once delivery into exactly-once table state with no
transactional sink.

Scale notes (100 TB dimension):
  - per batch, the wide work is merge_scd2's single key join plus
    commit's diff of head vs merged — both O(dimension) scans. Trigger
    coarsely (minutes, not seconds); for sub-minute upserts use a real
    transactional format (delta:// MERGE) and keep this as the history
    layer.
  - reconstruction chains are bounded by commit's checkpoint_every;
    storage grows O(changed rows) per batch.
  - the versioned log is single-writer: exactly one streaming query may
    own a dimension root (enforce operationally; Spark's checkpoint dir
    already serializes the query itself).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame

from data_diff_spark.operators.scd import merge_scd2
from data_diff_spark.sources import versioned as V


def scd2_stream_sink(
    changes: DataFrame,
    root: str,
    keys: Sequence[str],
    checkpoint_dir: str,
    effective_col: str = "effective_ts",
    tracked_cols: Optional[Sequence[str]] = None,
    checkpoint_every: int = 10,
    trigger_once: bool = False,
):
    """Start the streaming query folding `changes` (a streaming DataFrame
    of key + attribute + effective_ts rows) into the SCD2 dimension at
    `root` (a versioned table created with keys + [valid_from] as its
    row identity). Returns the StreamingQuery."""
    keys = list(keys)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):  # empty trigger: nothing to merge
            return
        spark = batch_df.sparkSession
        head = V.read_version(spark, root)
        merged = merge_scd2(
            head,
            batch_df,
            keys=keys,
            tracked_cols=tracked_cols,
            effective_col=effective_col,
        )
        V.commit(merged, root, checkpoint_every=checkpoint_every)

    w = (
        changes.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
