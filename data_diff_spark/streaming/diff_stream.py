"""Streaming diff: validate a stream of rows against a reference table.

The reference engine diffs two static tables; the streaming-native analogue
is continuous validation — as rows arrive, emit every row that is missing
from or disagrees with a reference (static) table. Spark's stream-static
join does this with no custom state: the static side is (re)broadcast per
micro-batch, the stream side never buffers.

Output: the stream's rows annotated with a sign —
    '+'  key not present in the reference at all
    '!'  key present but at least one compared column differs

Deletions (reference keys never seen on the stream) are not observable from
a stream-side join; a bounded run closes that gap with one batch anti-join
if needed — the same asymmetry the reference's joindiff-from-one-side has.

On bounded input the result equals the batch left-join diff, which is what
the driver's oracle checks.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SIGN_COL = "sign"


def stream_vs_reference(
    stream: DataFrame,
    reference: DataFrame,
    keys: Sequence[str],
    compare: Sequence[str],
) -> DataFrame:
    """Streaming DataFrame of (sign, *keys, *compare) for non-matching rows."""
    ref = reference.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        *[F.col(c).alias(f"__r_{c}") for c in compare],
        F.lit(True).alias("__r_present"),
    )
    on = None
    for k in keys:
        cond = F.col(k).eqNullSafe(F.col(f"__r_{k}"))
        on = cond if on is None else on & cond
    j = stream.join(ref, on=on, how="left")

    missing = F.col("__r_present").isNull()
    differs = F.lit(False)
    for c in compare:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__r_{c}"))
    sign = F.when(missing, F.lit("+")).otherwise(F.lit("!"))
    return (
        j.filter(missing | differs)
        .select(sign.alias(SIGN_COL), *keys, *compare)
    )


def validate_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-run harness: stream the events table against a deterministic
    'reference' copy (some rows missing, some values shifted) and return the
    materialized validation report."""
    from data_diff_spark.streaming.events_stream import events_stream, run_to_completion
    from data_diff_spark.workload import load_views

    load_views(spark, sf_dir)
    reference = spark.sql(REFERENCE_EVENTS_SQL)
    out = stream_vs_reference(
        events_stream(spark, sf_dir),
        reference,
        keys=["event_id"],
        compare=["event_type", "value"],
    )
    return run_to_completion(out, mode="append")


# Deterministic perturbed reference shared with the DuckDB oracle: drop
# event_id % 97 == 0, shift value for event_id % 50 == 0.
REFERENCE_EVENTS_SQL = """
select event_id, event_type,
       case when event_id % 50 = 0 then value + 1.0 else value end as value
from events
where event_id % 97 <> 0
"""
