"""Custom stateful streaming operator: gap-based sessionization.

The reference engine has no streaming or analytic surface; this is the
Spark-native custom-stateful-operator template the brief asks for
(`applyInPandasWithState`): per-user session counting with a 30-minute
inactivity gap, state = (last event time, running session/event counts)
carried across micro-batches.

Semantics match the batch window-function sessionization
(workload.q_events_sessionize) exactly: events ordered by (ts, event_id),
a new session starts when the gap to the previous event exceeds
`gap_seconds`. Emitted rows are running totals per user per batch; both
counters are monotone, so `max()` per user over the sink is the final
answer regardless of how many micro-batches the input was split into —
which is what makes the bounded-input run oracle-checkable against the
same DuckDB SQL as the batch version.

State size: one (long, long, long) per active user — eviction would use
GroupStateTimeout on a real unbounded stream; bounded runs don't need it.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_sessions bigint, n_events bigint"
STATE_SCHEMA = "last_us bigint, n_sessions bigint, n_events bigint"


def _session_update(gap_us: int):
    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        last_us, n_sessions, n_events = (
            state.get if state.exists else (None, 0, 0)
        )
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["us", "event_id"])
        us = rows["us"].to_numpy()
        if len(us):
            prev = us[:-1]
            gaps_new = (us[1:] - prev) > gap_us
            first_new = last_us is None or (us[0] - last_us) > gap_us
            n_sessions += int(first_new) + int(gaps_new.sum())
            n_events += len(us)
            last_us = int(us[-1])
        state.update((last_us, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return fn


def sessionize_stream(stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Streaming DataFrame of per-user running (n_sessions, n_events)."""
    ev = stream.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"), "event_id"
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _session_update(gap_seconds * 1_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful stream to completion on the bounded events table and
    reduce running totals to finals (max per user — monotone counters)."""
    from data_diff_spark.streaming.events_stream import events_stream, run_to_completion

    sink = run_to_completion(sessionize_stream(events_stream(spark, sf_dir)), mode="update")
    return sink.groupBy("user_id").agg(
        F.max("n_sessions").alias("n_sessions"),
        F.max("n_events").alias("n_events"),
    )
