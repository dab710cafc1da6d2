"""Streaming training-export: Arrow IPC / WebDataset shards from a stream.

Completes the pipeline's terminal story for continuous ingestion: the same
shard writers that end a batch pipeline (sources/export.py), driven per
micro-batch through foreachBatch.

Exactly-once file set from at-least-once delivery — the same argument as
streaming/cdc_stream.py, applied to files instead of table state:

  1. shard names are fully deterministic AND batch-qualified
     (`batch-{batch_id:06d}-{partition:05d}-{seq:04d}`), so two different
     micro-batches can never collide, and a REPLAYED micro-batch (same
     batch_id, same data — Structured Streaming's replayable-source
     contract) regenerates byte-identical files under the same names;
  2. every write goes to an attempt-private tmp file then os.replace —
     so a replay atomically overwrites its own previous output, never
     duplicates it, and a crash mid-batch leaves only ignorable *.tmp;
  3. the per-batch manifest is itself written to a deterministic name
     (`_manifests/batch-{batch_id:06d}.jsonl`, tmp+rename), so consumers
     can treat manifest presence as the batch's commit marker.

Scale notes: the shard write is mapInPandas on the executors — no
driver data path; only the manifest rows (one per shard file) are
collected, bounded by rows-per-batch / rows_per_shard. Shard count per
batch follows the micro-batch's partitioning; repartition upstream in the
stream (or trigger less often) to keep shards from running small.
"""

from __future__ import annotations

import json
import os
from typing import Dict

from pyspark.sql import DataFrame

from data_diff_spark.sources.export import write_arrow_shards, write_webdataset


def _write_manifest(path: str, batch_id: int, rows) -> None:
    mdir = os.path.join(path, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"batch-{batch_id:06d}.jsonl")
    tmp = f"{final}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps({"path": r["path"], "rows": r["rows"],
                                "bytes": r["bytes"]}) + "\n")
    os.replace(tmp, final)


def _sink(stream: DataFrame, checkpoint_dir: str, batch_fn, trigger_once: bool):
    w = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def arrow_shard_stream_sink(
    stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    rows_per_shard: int = 100_000,
    trigger_once: bool = False,
):
    """Continuously export a stream as Arrow IPC shards under `path`.
    Returns the StreamingQuery."""

    def export_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        manifest = write_arrow_shards(
            batch_df, path, rows_per_shard,
            shard_prefix=f"batch-{batch_id:06d}",
        ).collect()
        _write_manifest(path, batch_id, manifest)

    return _sink(stream, checkpoint_dir, export_batch, trigger_once)


def webdataset_stream_sink(
    stream: DataFrame,
    path: str,
    key_col: str,
    extensions: Dict[str, str],
    checkpoint_dir: str,
    rows_per_shard: int = 10_000,
    trigger_once: bool = False,
):
    """Continuously export a stream as WebDataset tar shards under `path`.
    Returns the StreamingQuery."""

    def export_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        manifest = write_webdataset(
            batch_df, path, key_col, extensions, rows_per_shard,
            shard_prefix=f"batch-{batch_id:06d}",
        ).collect()
        _write_manifest(path, batch_id, manifest)

    return _sink(stream, checkpoint_dir, export_batch, trigger_once)
