"""Stream-stream interval join: continuous attribution.

The batch operator (operators/temporal.py:interval_join) attributes events
to the 30-minute window after each same-user purchase. The streaming-native
version is Spark's watermarked stream-stream join: both sides are streams,
the join condition carries the time bounds, and the watermarks let the
engine EVICT buffered rows once no future match is possible — state is
bounded by (watermark horizon + window span) x arrival rate, not by stream
length. This is the operator you run against live traffic; the batch one is
the backfill.

Spark plans the time-bound condition natively (no binning needed on the
streaming path: each side's buffer is already an index keyed by the
equi-join keys; the range predicate prunes within a key's buffer).

On bounded input the result equals the batch inequality join, which is what
the driver's DuckDB oracle checks (same ORACLE_RANGE_JOIN as the batch
query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def attribution_join(events: DataFrame, purchases: DataFrame, window: str = "30 minutes",
                     watermark: str = "1 hour") -> DataFrame:
    """events/purchases are STREAMING frames sharing user_id + event time.
    Inner join: every event in [purchase_ts, purchase_ts + window) of a
    same-user purchase. Both sides watermarked — required for state
    eviction in a stream-stream join (without it, Spark buffers forever)."""
    ev = events.select(
        "event_id", "user_id", "ts", "event_type"
    ).withWatermark("ts", watermark)
    pu = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    return ev.join(
        pu,
        F.expr(
            f"user_id = p_user_id and ts >= p_ts and ts < p_ts + interval {window}"
        ),
        "inner",
    ).select("purchase_id", "event_id", "user_id", "ts", "event_type")


def attribution_stream_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stream-stream attribution to completion on the bounded events
    table; equals the batch interval join (driver oracle: ORACLE_RANGE_JOIN).
    Two independent readStream sources over the same files — a genuine
    stream-stream join, not a self-join alias."""
    from data_diff_spark.streaming.events_stream import events_stream, run_to_completion

    ev = events_stream(spark, sf_dir)
    pu = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    return run_to_completion(attribution_join(ev, pu), mode="append")
