"""Stream-stream as-of (temporal) join: each left event picks up the
right side's most recent value at or before its event time.

The batch operator (operators/temporal.py:asof_join) is the backfill;
this is the live-traffic version of the same semantics — Flink calls it
a temporal join; the classic instance is trades enriched with the
prevailing quote. Spark has no built-in stream-stream as-of join (the
watermarked interval join needs a bounded window; as-of's "most recent,
however old" does not have one), so this is a custom stateful operator
on `applyInPandasWithState`, the same template as streaming/sessionize.

Design (per `by` key, state carried across micro-batches):

  - both streams are union-tagged into ONE keyed stream (left rows carry
    the event id, right rows the value), because a grouped stateful op
    takes a single input; duplicate right rows at one (key, ts) collapse
    to max(value) INSIDE the state update — doing it as an upstream
    streaming aggregate would chain two stateful operators.
  - state = the right-side history (ts-sorted arrays) + the pending left
    rows. A left row with ts <= watermark is FINAL (any right row still
    to arrive has ts' > watermark >= left.ts, which cannot change a
    backward match) — emitted once more and dropped. A left row above
    the watermark is emitted PROVISIONALLY every batch and retained; its
    match can only improve (right history only grows), so the correct
    final answer is, per left row, the emission with the greatest
    matched right timestamp — a monotone reduce the sink applies, the
    same re-emission discipline sessionize uses for running counters.
  - eviction keeps the single newest right row at or below the watermark
    (the floor candidate every future left above the watermark needs)
    plus everything above it: state is bounded by the watermark horizon
    x arrival rate, not by stream length.

On bounded input (AvailableNow) every emission in the last batch sees
the complete right history, so the reduced result equals the batch
asof_join exactly — pinned in tests/test_asof_stream.py, including a
multi-micro-batch run where matches cross batch boundaries.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, event_id bigint, us bigint, "
    "purchase_us bigint, purchase_value double"
)
STATE_SCHEMA = (
    "hist_us array<bigint>, hist_val array<double>, "
    "pend_id array<bigint>, pend_us array<bigint>"
)


def _asof_update(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    import numpy as np

    hist_us, hist_val, pend_id, pend_us = (
        state.get if state.exists else ([], [], [], [])
    )
    hist_us = np.asarray(hist_us, dtype=np.int64)
    hist_val = np.asarray(hist_val, dtype=np.float64)

    rows = pd.concat(list(pdfs), ignore_index=True)
    rights = rows[rows["side"] == "r"]
    lefts = rows[rows["side"] == "l"]

    if len(rights):
        # merge into history; duplicates at one ts collapse to max(value)
        merged = pd.DataFrame({
            "us": np.concatenate([hist_us, rights["us"].to_numpy(np.int64)]),
            "v": np.concatenate([hist_val, rights["val"].to_numpy(np.float64)]),
        })
        merged = merged.groupby("us", sort=True)["v"].max().reset_index()
        hist_us = merged["us"].to_numpy(np.int64)
        hist_val = merged["v"].to_numpy(np.float64)

    pend_id = np.concatenate([
        np.asarray(pend_id, dtype=np.int64),
        lefts["event_id"].to_numpy(np.int64),
    ])
    pend_us = np.concatenate([
        np.asarray(pend_us, dtype=np.int64),
        lefts["us"].to_numpy(np.int64),
    ])

    # emit the current floor match for every pending left row
    out = None
    if len(pend_id):
        if len(hist_us):
            idx = np.searchsorted(hist_us, pend_us, side="right") - 1
            has = idx >= 0
            m_us = np.where(has, hist_us[np.clip(idx, 0, None)], 0)
            m_val = np.where(has, hist_val[np.clip(idx, 0, None)], np.nan)
        else:
            # no right history yet for this key: every pending left is a
            # (provisional) left-outer null match — indexing an empty
            # array would raise, so short-circuit
            has = np.zeros(len(pend_id), dtype=bool)
            m_us = np.zeros(len(pend_id), dtype=np.int64)
            m_val = np.full(len(pend_id), np.nan)
        out = pd.DataFrame({
            "user_id": np.full(len(pend_id), key[0], dtype=np.int64),
            "event_id": pend_id,
            "us": pend_us,
            "purchase_us": pd.array(
                [int(u) if h else None for u, h in zip(m_us, has)],
                dtype="Int64",
            ),
            "purchase_value": [
                float(v) if h else None for v, h in zip(m_val, has)
            ],
        })

    wm_us = state.getCurrentWatermarkMs() * 1000
    # finalized lefts (ts <= watermark) were just emitted — drop them
    keep = pend_us > wm_us
    # history: newest row at/below the watermark + everything above it
    h_keep = hist_us > wm_us
    floor_idx = np.searchsorted(hist_us, wm_us, side="right") - 1
    if floor_idx >= 0:
        h_keep[floor_idx] = True
    state.update((
        [int(x) for x in hist_us[h_keep]],
        [float(x) for x in hist_val[h_keep]],
        [int(x) for x in pend_id[keep]],
        [int(x) for x in pend_us[keep]],
    ))
    if out is not None:
        yield out


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming as-of join of two streams sharing (user_id, ts): left
    rows carry event_id, right rows carry value. Emits (possibly
    provisional) matches per micro-batch; reduce per event_id by max
    purchase_us for finals (see module docstring)."""
    lt = left.select(
        "user_id", "ts",
        F.col("event_id").cast("long").alias("event_id"),
        F.lit(None).cast("double").alias("val"),
        F.lit("l").alias("side"),
    )
    rt = right.select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("value").cast("double").alias("val"),
        F.lit("r").alias("side"),
    )
    # the watermark column must survive into the stateful operator for
    # getCurrentWatermarkMs — keep ts alongside its micros projection
    unioned = (
        lt.unionByName(rt)
        .select(
            "user_id", "ts", F.unix_micros("ts").alias("us"),
            "event_id", "val", "side",
        )
        .withWatermark("ts", watermark)
    )
    return unioned.groupBy("user_id").applyInPandasWithState(
        _asof_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def reduce_to_final(sink: DataFrame) -> DataFrame:
    """Collapse re-emissions to the final match per left event: the
    emission with the greatest matched right timestamp wins (matches only
    improve as right history grows; struct max puts NULL matches first)."""
    return (
        sink.groupBy("user_id", "event_id", "us")
        .agg(F.max(F.struct("purchase_us", "purchase_value")).alias("m"))
        .select(
            "user_id", "event_id", "us",
            F.col("m.purchase_us").alias("purchase_us"),
            F.col("m.purchase_value").alias("purchase_value"),
        )
    )


def asof_stream_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the streaming as-of to completion on the bounded events table:
    every event tagged with the user's most recent purchase — the same
    relation as the batch asof_join in workload.q_asof_purchase."""
    from data_diff_spark.streaming.events_stream import events_stream, run_to_completion

    ev = events_stream(spark, sf_dir)
    pu = events_stream(spark, sf_dir).filter(F.col("event_type") == "purchase")
    sink = run_to_completion(asof_join_stream(ev, pu), mode="update")
    return reduce_to_final(sink)
