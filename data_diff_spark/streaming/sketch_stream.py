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
