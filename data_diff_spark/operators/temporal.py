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
    partition. Skewed keys fall to AQE; an empty `by` would serialize into
    one task, so it is rejected — global as-of at scale should range-
    partition on the time column instead (documented below).
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
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if not by:
        # A global window is a single task — wrong at any scale. Force the
        # caller to choose keys or to range-partition + mapInPandas instead.
        raise ValueError("asof_join requires at least one `by` key")
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
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w)).filter(
        F.col("__side") == 1
    )

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
