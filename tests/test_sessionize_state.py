"""Stateful streaming sessionization: state must carry across micro-batches.

The workload entry streams one parquet file (one batch); here the events
table is split into several files so maxFilesPerTrigger=1 forces multiple
micro-batches, and a user's session that spans a batch boundary must not be
double-counted.
"""

import os

import pytest
from pyspark.sql import Window, functions as F

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


@pytest.fixture(scope="module")
def split_events_dir(sf_dir):
    """Events split into 4 files by time quartile, with file mtimes forced
    into event-time order: the file stream source processes files by
    (modification time, path), and gap sessionization — like any in-order
    stateful operator — assumes batches arrive in event-time order (a real
    ingestion's append order)."""
    import duckdb

    out = os.path.join(SCRATCH, "events_split")
    os.makedirs(out, exist_ok=True)
    for old in os.listdir(out):
        os.remove(os.path.join(out, old))
    for i in range(4):
        path = os.path.join(out, f"events_{i}.parquet")
        duckdb.sql(f"""
          copy (
            select * exclude (_b) replace (ts::timestamp as ts) from (
              select *, ntile(4) over (order by ts, event_id) as _b
              from '{sf_dir}/events.parquet'
            ) where _b = {i + 1}
          ) to '{path}' (format parquet)
        """)
        os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return out


def test_state_carries_across_batches(spark, sf_dir, split_events_dir):
    from data_diff_spark.streaming.events_stream import run_to_completion
    from data_diff_spark.streaming.sessionize import sessionize_stream

    # DuckDB already truncated ns -> us when rewriting, so ts is a plain
    # timestamp here — no nanos conversion needed.
    schema = spark.read.parquet(split_events_dir).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
    )
    sink = run_to_completion(sessionize_stream(raw), mode="update")
    got = (
        sink.groupBy("user_id")
        .agg(F.max("n_sessions").alias("n_sessions"), F.max("n_events").alias("n_events"))
    )

    # batch truth via window functions over the same (micros-truncated) data
    from data_diff_spark.sources.connect import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    want = (
        ev.withColumn("new_s", F.when(gap.isNull() | (gap > 1800 * 1000 * 1000), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_collect_stats_and_ignore_column(spark, sf_dir):
    from data_diff_spark import table_segment

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = table_segment(orders, ["o_orderkey"])
    stats = t.collect_stats()
    assert stats["count"] == orders.count()
    assert "sum_o_totalprice" in stats and "sum_o_orderstatus" not in stats

    t2 = t.ignore_column("o_totalprice")
    assert "o_totalprice" not in t2.relevant_columns
    with pytest.raises(ValueError):
        t.ignore_column("o_orderkey")
