"""Distribution drift between two tables: PSI / TVD per column.

The reference answers "which ROWS changed"; the monitoring counterpart is
"did the DISTRIBUTION change" — schema-identical tables can pass a
row-count gate while a column quietly collapses to a constant. This
report computes, per column:

  numeric:      PSI (population stability index) over fixed equi-width
                bins spanning the combined min/max — the standard
                model-monitoring metric (PSI > 0.2 ≈ action threshold);
  categorical/
  string:       total variation distance over HASH-BUCKETED frequencies
                (64 buckets): deterministic, one-pass, and a LOWER bound
                of the true TVD (hashing can only merge mass, never split
                it) — so a drifted hash-TVD is always real drift;
  every column: null-rate shift.

Scale shape (100 TB): exactly TWO scans per table — one min/max pass to
fix the bins, one conditional-aggregation pass computing every column's
every bin in a single map-side agg (no shuffle at all beyond the final
single-row reduce). No per-column groupBy jobs, no collect of data rows.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EPS = 1e-6
N_HASH_BUCKETS = 64


def _numeric_cols(df: DataFrame, columns) -> List[str]:
    return [
        f.name for f in df.schema.fields
        if f.name in columns and isinstance(f.dataType, T.NumericType)
    ]


def _bin_counts(df: DataFrame, cols_bins: dict, cat_cols: List[str]):
    """ONE aggregation pass: per numeric column, counts of each fixed bin;
    per categorical column, counts of each hash bucket; plus per-column
    null counts and the total row count."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c, (lo, w, n_bins) in cols_bins.items():
        col = F.col(c).cast("double")
        bucket = F.least(
            F.greatest(F.floor((col - F.lit(lo)) / F.lit(w)), F.lit(0)),
            F.lit(n_bins - 1),
        )
        for i in range(n_bins):
            aggs.append(
                F.sum((col.isNotNull() & (bucket == i)).cast("long")).alias(f"b_{c}_{i}")
            )
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"n_{c}"))
    for c in cat_cols:
        h = F.pmod(F.xxhash64(F.col(c).cast("string")), F.lit(N_HASH_BUCKETS))
        for i in range(N_HASH_BUCKETS):
            aggs.append(
                F.sum((F.col(c).isNotNull() & (h == i)).cast("long")).alias(f"b_{c}_{i}")
            )
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"n_{c}"))
    return df.agg(*aggs).collect()[0]


def drift_report(
    df1: DataFrame,
    df2: DataFrame,
    columns: Optional[Sequence[str]] = None,
    n_bins: int = 20,
    psi_threshold: float = 0.2,
    tvd_threshold: float = 0.1,
) -> DataFrame:
    """(column, metric, value, null_rate_a, null_rate_b, drifted) per
    shared column. See module docstring for metric semantics."""
    shared = [c for c in df1.columns if c in set(df2.columns)]
    columns = [c for c in (columns or shared) if c in shared]
    nums = set(_numeric_cols(df1, columns)) & set(_numeric_cols(df2, columns))
    cats = [c for c in columns if c not in nums]

    # pass 1: combined min/max per numeric column (both tables, one agg each)
    def minmax(df):
        if not nums:
            return {}
        r = df.agg(*[
            a for c in nums for a in (
                F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"hi_{c}"),
            )
        ]).collect()[0]
        return {c: (r[f"lo_{c}"], r[f"hi_{c}"]) for c in nums}

    m1, m2 = minmax(df1), minmax(df2)
    cols_bins = {}
    for c in nums:
        los = [v for v in (m1[c][0], m2[c][0]) if v is not None]
        his = [v for v in (m1[c][1], m2[c][1]) if v is not None]
        if not los or not his:
            continue  # all-null on a side: null-rate shift will surface it
        lo, hi = min(los), max(his)
        w = (hi - lo) / n_bins or 1.0
        cols_bins[c] = (lo, w, n_bins)

    # pass 2: every bin of every column in one agg per table
    r1 = _bin_counts(df1, cols_bins, cats)
    r2 = _bin_counts(df2, cols_bins, cats)
    t1, t2 = max(r1["__total"], 1), max(r2["__total"], 1)

    rows = []
    for c in columns:
        nr1, nr2 = r1[f"n_{c}"] / t1, r2[f"n_{c}"] / t2
        if c in cols_bins:
            _, _, nb = (0, 0, cols_bins[c][2])
            psi = 0.0
            for i in range(nb):
                p = r1[f"b_{c}_{i}"] / t1 + _EPS
                q = r2[f"b_{c}_{i}"] / t2 + _EPS
                psi += (p - q) * math.log(p / q)
            rows.append((c, "psi", psi, nr1, nr2, psi > psi_threshold))
        elif c in cats:
            tvd = 0.5 * sum(
                abs(r1[f"b_{c}_{i}"] / t1 - r2[f"b_{c}_{i}"] / t2)
                for i in range(N_HASH_BUCKETS)
            )
            rows.append((c, "tvd_hash64", tvd, nr1, nr2, tvd > tvd_threshold))
    return df1.sparkSession.createDataFrame(
        rows,
        "column string, metric string, value double, "
        "null_rate_a double, null_rate_b double, drifted boolean",
    )
