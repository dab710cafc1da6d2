"""Structured Streaming over the events table.

The reference engine has no streaming surface (SURVEY.md §2.3 "Streaming
ops: none"); this module adds the Spark-native one: a file-source stream of
events, event-time windowed rollups with a watermark for late data, and a
run-to-completion harness (`Trigger.AvailableNow`) that makes the streaming
path testable against the batch oracle — on bounded input the streaming
rollup must equal the batch GROUP BY, which the driver's DuckDB gate checks.

At scale this is the template for continuous ingestion: swap the parquet
file source for Kafka, keep the watermark + window + sink. State size is
bounded by (watermark horizon / window size) * |event_type| rows per
window, evicted as the watermark passes — not by stream length.
"""

from __future__ import annotations

import hashlib
import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SINK_IDS = itertools.count()

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")

# --- bounded-run sizing: ONE rule for micro-batch count and state
# partitions (r7 carried two separate two-point fits — "8 under 500k
# events else 32" state partitions and "ceil(files/4)" batches — each
# tuned to the two corpora that existed; a third scale factor would have
# needed a third constant). Derived from payload targets instead, the
# same move _auto_bands made for LSH sizing:
#
#   ROWS_PER_BATCH       a bounded micro-batch should carry enough rows
#                        to amortize its fixed cost (offset-log write,
#                        state-store load, per-batch job scheduling —
#                        hundreds of ms each); 2M rows keeps that
#                        overhead <10% at measured per-row costs.
#   ROWS_PER_STATE_TASK  each stateful-shuffle task pays pandas/Arrow
#                        setup per GROUP it hosts; ~25k rows per task
#                        keeps tasks >100ms (not scheduling-bound) while
#                        spreading the per-group Python work.
#
# Floors: >=2 batches so every bounded gate run crosses state between
# micro-batches (the semantics being verified); >=8 state partitions so
# a skewed key set still spreads. Ceilings: 8 batches bounds fixed
# overhead on any corpus (the r7 sf1.0 probe measured 64 batches x 8
# partitions = 505s for work 4 batches did in 53s); state partitions cap
# at the session's cores — beyond that extra partitions only add tasks.
ROWS_PER_BATCH = 2_000_000
ROWS_PER_STATE_TASK = 25_000

_ROW_COUNTS: dict = {}


def table_rows(spark: SparkSession, sf_dir: str, table: str = "events") -> int:
    """Memoized row count of a source table (zero-column parquet scan,
    paid once per session) — sizing decisions must not cost a full-table
    action per query (VERDICT r7 'What's wrong #3' for the LSH analogue)."""
    key = (spark.sparkContext.applicationId, sf_dir, table)
    if key not in _ROW_COUNTS:
        _ROW_COUNTS[key] = spark.read.parquet(
            os.path.join(sf_dir, f"{table}.parquet")).count()
    return _ROW_COUNTS[key]


def bounded_stream_sizing(n_rows: int, cores: int) -> tuple:
    """(n_batches, n_state_partitions) for a bounded streaming run over
    `n_rows` input rows on a `cores`-slot cluster. Documented above;
    probed flat across sf0.01/0.1/1.0 in tools/scale_probe.py."""
    n_batches = min(8, max(2, -(-n_rows // ROWS_PER_BATCH)))
    per_batch = -(-n_rows // n_batches)
    n_state = min(max(8, -(-per_batch // ROWS_PER_STATE_TASK)), max(cores, 8))
    return n_batches, n_state


def _as_stream_dir(sf_dir: str, table: str) -> str:
    """Spark's file stream source only accepts directories; expose the
    single-file table through a symlink in a scratch dir (idempotent).

    Directory-style tables (e.g. the sf1.0 scale corpus, written as 64
    part files) are returned AS-IS: the file stream source does not
    recurse through a symlinked subdirectory, so the old symlink route
    produced a silently EMPTY stream for them (caught by the r7 sf1.0
    refresh: the drift/ndv gate arms errored and the as-of stream arm
    compared against nothing)."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isdir(src):
        return src
    key = hashlib.md5(f"{sf_dir}/{table}".encode()).hexdigest()[:12]
    d = os.path.join(_SCRATCH, f"stream_{table}_{key}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, f"{table}.parquet")
    if not os.path.lexists(link):
        os.symlink(src, link)
    return d


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the same schema-adaptive ts
    normalization as the batch path (workload.load_views).

    Micro-batch sizing: maxFilesPerTrigger = ceil(files/n_batches) with
    n_batches from bounded_stream_sizing (the one rule, documented at the
    top of this module). Single-file tables still run 1 batch; the
    64-part sf1.0 scale corpus runs ceil(6M/2M)=3 instead of 64, whose
    per-batch stateful-shuffle overhead made the bounded as-of run 505s
    at sf1.0 (r7 measurement) for work a few batches do in seconds."""
    import glob as _glob

    from data_diff_spark.sources.connect import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    d = _as_stream_dir(sf_dir, "events")
    nfiles = len([p for p in _glob.glob(os.path.join(d, "*"))
                  if not os.path.basename(p).startswith(("_", "."))])
    n_batches, _ = bounded_stream_sizing(
        table_rows(spark, sf_dir), spark.sparkContext.defaultParallelism)
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max(1, -(-nfiles // n_batches)))
        .parquet(d)
    )
    return normalize_event_ts(raw)


def hourly_rollup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Event-time hourly rollup with late-data watermark: counts + exact
    decimal sums per (hour, event_type). window('1 hour').start ==
    date_trunc('hour', ts), so the batch oracle is a plain GROUP BY."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,4)")).alias("total_value_dec"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n",
            F.col("total_value_dec").cast("double").alias("total_value"),
        )
    )


def run_to_completion(result: DataFrame, mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame to the end of its bounded input
    (AvailableNow trigger) into a memory sink; return the materialized
    result as a batch DataFrame. 'complete' mode emits every window —
    including ones the watermark hasn't closed — which is what makes the
    bounded-input result comparable to the batch GROUP BY."""
    spark = result.sparkSession
    name = f"stream_sink_{next(_SINK_IDS)}"
    q = (
        result.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return spark.table(name)


def hourly_rollup_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming pipeline, run to completion on the bounded events
    table — used by the workload registry and oracle-checked against the
    batch SQL."""
    return run_to_completion(hourly_rollup(events_stream(spark, sf_dir)))


def sliding_rollup(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    window/slide overlapping windows (4 for 1h/15m) — the
    moving-average/alerting shape tumbling windows can't express. State
    grows by the same factor, still bounded by the watermark horizon.
    window('1h','15m').start hits every slide boundary ≤ ts, so a batch
    engine replays it as GROUP BY over generate_series offsets — which is
    how the test oracles it."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,4)")).alias("total_value_dec"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            F.col("total_value_dec").cast("double").alias("total_value"),
        )
    )


def sliding_rollup_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sliding pipeline run to completion on the bounded events table."""
    return run_to_completion(sliding_rollup(events_stream(spark, sf_dir)))


def streaming_dedup(stream: DataFrame, keys, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once projection of an at-least-once stream: stateful
    dropDuplicatesWithinWatermark keeps one row per key, with state BOUNDED
    by the watermark horizon (a plain dropDuplicates would keep every key
    forever — unusable on an unbounded stream). This is the standard
    Kafka-redelivery / retry-storm guard in front of every downstream agg."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def streaming_dedup_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline run to completion on bounded input with every
    event delivered TWICE (the stream unioned with itself): 2N rows in,
    N out, equal to the batch DISTINCT — which the driver's oracle checks."""
    s = events_stream(spark, sf_dir)
    doubled = s.unionByName(s)
    return run_to_completion(
        streaming_dedup(doubled, ["event_id"]).select("event_id", "event_type", "value"),
        mode="append",
    )
