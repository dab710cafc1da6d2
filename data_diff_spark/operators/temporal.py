"""Temporal joins: as-of join and interval (range-overlap) join.

The reference engine has neither (its relational surface is the sqeleton
AST, /root/reference/data_diff/queries/ast_classes.py — equi/theta joins
only); these are the two temporal primitives every event-data pipeline
needs, implemented Spark-first:

  asof_join      zero-join design: union both sides, ONE window over the
                 `by` keys picks each left row's most recent right row.
                 A naive implementation is an inequality join (O(n*m)
                 BroadcastNestedLoop in Catalyst); this is one shuffle on
                 the by-keys + a linear scan per key, the same plan a
                 hand-written merge-asof would produce.
  interval_join  bucketed-bin equi-join: intervals explode into the
                 fixed-width time bins they cover, points hash to their
                 bin, Catalyst runs a plain shuffled equi-join on
                 (by, bin) and a cheap residual filter. No cartesian, no
                 nested-loop; output is exactly the inequality-join result.

Scale notes (100 TB):
  - asof_join shuffles each side once on `by`; per-key state is the single
    "last seen right row" struct, so the window never buffers the
    partition. Skewed keys fall to AQE. An empty `by` does NOT serialize
    into one global window: the time axis is cut into `num_buckets`
    fixed-width buckets, the window runs per bucket, and the only
    cross-bucket state is one "last right row" per bucket — carried by a
    prefix pass over a num_buckets-row spine and broadcast back. Data
    never moves through a single task.
  - interval_join's fan-out is interval_span/bin_width rows per interval;
    pick bin_width near the median interval span so the explode factor
    stays O(1). Long-tail intervals are capped by `max_bins` (explicit
    error, not a silent hang).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    right_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance: Optional[str] = None,
    prefix: str = "r_",
    num_buckets: int = 256,
) -> DataFrame:
    """For each left row, attach the single matching right row: the latest
    right row with right.on <= left.on (direction='backward', ties match)
    or the earliest with right.on >= left.on ('forward'). Left-outer
    semantics: unmatched left rows keep nulls. Matches DuckDB
    `ASOF LEFT JOIN ... ON l.by = r.by AND l.on >= r.on` bit-for-bit when
    (by, on) is unique on the right side; with duplicate right (by, on)
    rows this picks the last in (on, input-order) — pre-deduplicate the
    right side for a deterministic result.

    Implementation: tag sides, union, and take last-non-null of the right
    row's struct over a window partitioned by `by`, ordered by (on, side)
    with right rows sorting before left rows at equal `on`. One shuffle,
    no join operator at all.

    `tolerance`: an INTERVAL string (e.g. '30 minutes') for timestamp
    `on`, or an int/float for numeric `on`; matches farther than the
    tolerance are nulled out (row is kept, left-outer).

    With an empty `by`, a naive global window would be a single task; the
    global path instead cuts the time axis into `num_buckets` fixed-width
    buckets (monotone in `on`, so bucket order == time order), runs the
    same last-non-null window per bucket, and fills left rows whose bucket
    holds no earlier right row from a per-bucket carry: the latest right
    row of every strictly earlier bucket, computed on a num_buckets-row
    spine and broadcast back. Bounded extra cost: one min/max scan of the
    `on` column and one map-combined per-bucket aggregate of the right
    side. Left rows with a NULL `on` never match (NULL is not comparable
    to any time).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]
    overlap = set(right_cols) & set(left.columns)

    def out_name(c: str) -> str:
        return f"{prefix}{c}" if c in overlap or c == on else c

    r_on = f"{prefix}{on}"
    rs = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(on).alias(r_on),
            *[F.col(c).alias(out_name(c)) for c in right_cols],
        ).alias("__r"),
    )
    ls = left.select(*left.columns, F.lit(1).alias("__side"))
    u = ls.unionByName(rs, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(on).asc(), F.col("__side").asc()]
    else:
        order = [F.col(on).desc(), F.col("__side").asc()]
    if by:
        w = (
            Window.partitionBy(*by)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
            F.col("__side") == 1
        )
    else:
        matched = _global_asof_match(u, rs, on, order, direction, num_buckets)

    if tolerance is not None:
        tol = (
            F.lit(tolerance)
            if isinstance(tolerance, (int, float))
            else F.expr(f"interval {tolerance}")
        )
        gap_ok = (
            F.col(on) - tol <= F.col(f"__m.{r_on}")
            if direction == "backward"
            else F.col(on) + tol >= F.col(f"__m.{r_on}")
        )
        matched = matched.withColumn("__m", F.when(gap_ok, F.col("__m")))

    out_cols = [r_on] + [out_name(c) for c in right_cols]
    return matched.select(
        *left.columns, *[F.col(f"__m.{c}").alias(c) for c in out_cols]
    )


def _global_asof_match(
    u: DataFrame,
    rs: DataFrame,
    on: str,
    order: Sequence[Column],
    direction: str,
    num_buckets: int,
) -> DataFrame:
    """Keyless as-of matching without a single-task window.

    Bucket the time axis into `num_buckets` fixed-width slices. Because the
    bucket function is monotone in `on`, a right row in a strictly earlier
    bucket is strictly earlier in time than every row of later buckets
    (equal `on` always lands in the same bucket) — so each left row's
    match is either the in-bucket window result (later or equal to any
    earlier-bucket right) or, when its bucket has no preceding right row,
    the latest right row across all earlier buckets. That carry is one
    row per bucket: aggregated map-side, prefix-scanned over a
    num_buckets-row spine (the only single-task window, over ≤num_buckets
    rows), and broadcast back. Exact same rows as the keyed path with a
    constant key (pinned by test); `forward` mirrors with min/desc."""
    backward = direction == "backward"
    spark = u.sparkSession
    dt = u.schema[on].dataType
    from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

    def tkey(c: Column) -> Column:
        if isinstance(dt, (TimestampType, TimestampNTZType, DateType)):
            return F.unix_micros(c.cast("timestamp"))
        return c.cast("double")

    b = u.select(tkey(F.col(on)).alias("k")).agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()[0]
    lo, hi = b["lo"], b["hi"]
    if lo is None:  # empty input or all-NULL `on`: nothing can match
        return u.filter(F.col("__side") == 1).withColumn(
            "__m", F.lit(None).cast(u.schema["__r"].dataType)
        )
    # float width is fine: correctness needs only a deterministic MONOTONE
    # bucket function, not exact edges (unlike interval_join's binning)
    width = max((hi - lo) / num_buckets, 1e-9)

    def bucket(c: Column) -> Column:
        return F.least(
            F.floor((tkey(c) - F.lit(lo)) / F.lit(width)), F.lit(num_buckets - 1)
        ).cast("long")

    w = (
        Window.partitionBy("__bucket")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        u.withColumn("__bucket", bucket(F.col(on)))
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )

    pick = (F.max_by if backward else F.min_by)("__r", tkey(F.col(on)))
    per_bucket = (
        rs.filter(F.col(on).isNotNull())
        .withColumn("__bucket", bucket(F.col(on)))
        .groupBy("__bucket")
        .agg(pick.alias("__last_r"))
    )
    spine = spark.range(num_buckets).select(F.col("id").alias("__bucket"))
    cw = Window.orderBy(
        F.col("__bucket").asc() if backward else F.col("__bucket").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    carry = (
        spine.join(per_bucket, "__bucket", "left")
        .withColumn("__carry", F.last("__last_r", ignorenulls=True).over(cw))
        .select("__bucket", "__carry")
    )
    return (
        local.join(F.broadcast(carry), "__bucket", "left")
        .withColumn(
            "__m",
            F.when(F.col(on).isNotNull(), F.coalesce("__m", "__carry")),
        )
        .drop("__bucket", "__carry")
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    by: Sequence[str] = (),
    bin_width: str = "1 hour",
    closed: str = "both",
    max_bins: int = 10_000,
) -> DataFrame:
    """Inner join of point rows to every interval row that contains them:
    start <= point <= end (`closed`: 'both' | 'left' -> start <= p < end).
    Same rows as the inequality join, but executed as a shuffled EQUI-join:
    each interval is exploded to the fixed-width bins it covers, each point
    hashes to its bin, and the residual containment predicate filters the
    per-bin candidates. Catalyst would otherwise plan the pure inequality
    join as BroadcastNestedLoop/Cartesian — quadratic and unshippable at
    scale.

    `bin_width` is an INTERVAL string for timestamp columns; intervals
    spanning more than `max_bins` bins raise (a year-long interval with a
    1-second bin is a config error, not a workload).
    """
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be both|left, got {closed!r}")
    by = list(by)
    # interval width in µs, timezone-independent: timestamp_seconds(0) is
    # the epoch INSTANT (a '1970-01-01' string parse would be session-tz —
    # an eastern offset larger than bin_width made the width negative and
    # the binning undefined). Evaluated once driver-side so the width is a
    # foldable literal and a non-positive value is a plan-BUILD error.
    width_val = (
        points.sparkSession.range(1)
        .select(
            F.unix_micros(
                F.timestamp_seconds(F.lit(0)) + F.expr(f"interval {bin_width}")
            ).alias("w")
        )
        .collect()[0]["w"]
    )
    if width_val is None or width_val <= 0:
        raise ValueError(
            f"interval_join: bin_width {bin_width!r} has non-positive length "
            f"({width_val} us)"
        )
    width_us = F.lit(width_val)

    def bin_of(c: Column) -> Column:
        # exact integer floordiv: (x - pmod(x, w)) / w never leaves the
        # integers, so no double-rounding can misbin a boundary point (a
        # misbinned point silently loses its candidates — worse than wrong,
        # invisible). pmod keeps floor semantics for pre-1970 timestamps.
        um = F.unix_micros(c)
        return ((um - F.pmod(um, width_us)) / width_us).cast("long")

    # the guard lives INSIDE the exploded expression — a separate check
    # column would be pruned by Catalyst as unused and never fire
    n_bins = bin_of(F.col(end_col)) - bin_of(F.col(start_col)) + 1
    bins = F.when(
        n_bins <= F.lit(max_bins),
        F.sequence(bin_of(F.col(start_col)), bin_of(F.col(end_col))),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"interval_join: an interval spans more than {max_bins} "
                "bins; raise bin_width or max_bins"
            )
        )
    )
    iv = intervals.withColumn("__bin", F.explode(bins))
    pt = points.withColumn("__bin", bin_of(F.col(point_col)))

    contains = F.col(point_col) >= F.col(start_col)
    contains = contains & (
        F.col(point_col) <= F.col(end_col)
        if closed == "both"
        else F.col(point_col) < F.col(end_col)
    )
    joined = pt.join(iv, on=by + ["__bin"], how="inner").filter(contains).drop("__bin")
    return joined
