"""Table validation rules + column profiling (the dbt-tests analogue).

The reference's ecosystem leans on dbt's schema tests for table health
(its PK discovery even reads them — dbt_parser.py:468-504); the engine
itself only ships the two diff-time guards (duplicate-key, null-key).
This module completes the surface: declarative rules evaluated in ONE
aggregation pass, plus an ANALYZE-style column profiler.

Rules (all evaluated together — one scan, one row out per rule):
    not_null(col)               no NULLs
    unique(*cols)               no duplicate (cols) tuples
    accepted_values(col, vals)  every value in the list (NULLs ignored,
                                dbt semantics)
    in_range(col, lo, hi)       lo <= col <= hi (NULLs ignored)
    matches(col, regex)         full-match regex (NULLs ignored)
    relationship(col, ref_df, ref_col)
                                referential integrity: every non-NULL col
                                exists in ref (left_anti count — the one
                                rule needing a join; broadcast-eligible)

Failure counts, not booleans: a report row per rule with n_failed and a
pass flag — the operational artifact a pipeline gates on.

profile() computes per-column stats in one pass: count, nulls, distinct
(exact or approx), min/max, and for numerics mean plus approximate
percentiles — the input to partition-sizing and skew decisions at 100 TB
(approx_count_distinct / approx_percentile are the scalable defaults;
exact=True opts into expensive exact distinct counts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    # aggregation producing the number of FAILING rows (None -> uses join)
    fail_count: Optional[Column] = None
    ref: Optional[tuple] = None  # (ref_df, col, ref_col) for relationship
    detail: str = ""


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.sum(F.col(col).isNull().cast("long")))


def unique(*cols: str) -> Rule:
    # failures = rows beyond the first of each duplicated tuple:
    # count(*) - count(distinct cols) counts exactly those (NULL-containing
    # tuples participate via the fingerprint)
    fp = F.concat_ws("\x01", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols])
    return Rule(
        f"unique({', '.join(cols)})",
        F.count(F.lit(1)) - F.countDistinct(fp),
    )


def accepted_values(col: str, values: Sequence[Any]) -> Rule:
    c = F.col(col)
    bad = (~c.isin(list(values))) & c.isNotNull()
    return Rule(f"accepted_values({col})", F.sum(bad.cast("long")),
                detail=f"allowed={list(values)!r}")


def in_range(col: str, lo: Any, hi: Any) -> Rule:
    c = F.col(col)
    bad = ((c < F.lit(lo)) | (c > F.lit(hi))) & c.isNotNull()
    return Rule(f"in_range({col})", F.sum(bad.cast("long")),
                detail=f"[{lo}, {hi}]")


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    bad = (~c.rlike(f"^(?:{pattern})$")) & c.isNotNull()
    return Rule(f"matches({col})", F.sum(bad.cast("long")), detail=pattern)


def relationship(col: str, ref_df: DataFrame, ref_col: str) -> Rule:
    return Rule(f"relationship({col} -> {ref_col})", None, ref=(ref_df, col, ref_col))


def validate(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """One report row per rule: (rule, n_failed, passed, detail). All
    aggregate rules share ONE scan; each relationship rule adds one
    left_anti join (broadcast-eligible when the reference side is a
    dimension). The aggregate job and the relationship-union job are
    independent and SUBMITTED CONCURRENTLY (Spark accepts jobs from
    multiple driver threads), so wall-clock is max(scan-agg, anti-joins)
    rather than their sum — the count-distinct Expand in a unique() rule
    leaves task slots idle at its stage barrier that the anti-joins fill."""
    spark = df.sparkSession
    agg_rules = [r for r in rules if r.fail_count is not None]
    rel_rules = [r for r in rules if r.ref is not None]

    def _agg_rows() -> List[tuple]:
        if not agg_rules:
            return []
        res = df.agg(*[
            F.coalesce(r.fail_count, F.lit(0)).alias(f"r{i}")
            for i, r in enumerate(agg_rules)
        ]).collect()[0]
        return [
            (r.name, int(res[f"r{i}"]), int(res[f"r{i}"]) == 0, r.detail)
            for i, r in enumerate(agg_rules)
        ]

    def _rel_rows() -> List[tuple]:
        # all relationship rules in ONE job: each is a broadcast left-anti
        # count over its own scan, unioned — a per-rule .count() loop paid
        # a scheduling round-trip per rule
        if not rel_rules:
            return []
        frames = []
        for i, r in enumerate(rel_rules):
            ref_df, col, ref_col = r.ref
            frames.append(
                df.filter(F.col(col).isNotNull())
                .join(
                    F.broadcast(ref_df.select(F.col(ref_col).alias(col)).distinct()),
                    col, "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.lit(i).alias("i"), "n")
            )
        u = frames[0]
        for f in frames[1:]:
            u = u.unionByName(f)
        got = {row["i"]: int(row["n"]) for row in u.collect()}
        return [
            (r.name, got[i], got[i] == 0, r.detail)
            for i, r in enumerate(rel_rules)
        ]

    if agg_rules and rel_rules:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as ex:
            fa, fr = ex.submit(_agg_rows), ex.submit(_rel_rows)
            rows = fa.result() + fr.result()
    else:
        rows = _agg_rows() + _rel_rows()
    return spark.createDataFrame(
        rows, "rule string, n_failed long, passed boolean, detail string"
    )


def profile(df: DataFrame, columns: Optional[Sequence[str]] = None,
            exact: bool = False, numeric_stats: bool = True) -> DataFrame:
    """ANALYZE-style per-column stats in one pass: (column, count, nulls,
    distinct, min, max, mean, p50, p95) — min/max/mean/percentiles as
    strings so heterogenous columns share one report schema.
    numeric_stats=False skips mean + approximate percentiles (those
    columns come back NULL): percentile_approx's QuantileSummaries is
    the expensive aggregate in the pass, and exactly-replayable
    consumers (the DuckDB gate) can't use approximate sketches anyway."""
    from pyspark.sql import types as T

    cols = list(columns or df.columns)
    numeric = {
        f.name for f in df.schema.fields
        if isinstance(f.dataType, (T.NumericType,))
    } if numeric_stats else set()
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"cnt_{c}"),
            F.sum(col.isNull().cast("long")).alias(f"null_{c}"),
            (F.countDistinct(col) if exact else F.approx_count_distinct(col)).alias(f"nd_{c}"),
            F.min(col).cast("string").alias(f"min_{c}"),
            F.max(col).cast("string").alias(f"max_{c}"),
        ]
        if c in numeric:
            aggs += [
                F.avg(col).alias(f"avg_{c}"),
                F.percentile_approx(col, [0.5, 0.95]).alias(f"pct_{c}"),
            ]
    row = df.agg(*aggs).collect()[0]
    out = []
    for c in cols:
        is_num = c in numeric
        out.append((
            c, int(row[f"cnt_{c}"]), int(row[f"null_{c}"] or 0), int(row[f"nd_{c}"]),
            row[f"min_{c}"], row[f"max_{c}"],
            float(row[f"avg_{c}"]) if is_num and row[f"avg_{c}"] is not None else None,
            float(row[f"pct_{c}"][0]) if is_num and row[f"pct_{c}"] else None,
            float(row[f"pct_{c}"][1]) if is_num and row[f"pct_{c}"] else None,
        ))
    return df.sparkSession.createDataFrame(
        out,
        "column string, count long, nulls long, distinct long, "
        "min string, max string, mean double, p50 double, p95 double",
    )
