"""Time-series subsequence matching: find where a query pattern occurs.

UCR-style whole-matching over streams of (key, ts, value) rows (cf. EDBT
2019 "Time Series Similarity Search for Streaming Data in Distributed
Systems"): every length-m subsequence of every key's series is scored by
z-normalized Euclidean distance against a driver-side query pattern, and
the best matches surface. The reference engine has no time-series surface
at all (SURVEY §1.1 "no streams, graphs, time-series").

Spark-first shape — no UDF, no driver loop:
  - one window per key (`rowsBetween(currentRow, m-1)` collect_list)
    materializes each subsequence next to its start row: ONE shuffle on
    the keys, same layout as asof_join;
  - per-subsequence mean/std and the distance to the (pre-z-normalized,
    literal) query are higher-order-function folds inside codegen;
  - top-k = global ascending-distance take with a deterministic tiebreak.

Scale notes (100 TB of series):
  - per-key state in the window is the m-row frame, not the partition;
    skewed keys fall to AQE. m is a pattern length (tens-hundreds), so
    the collect_list arrays stay small;
  - z-normalization makes the match amplitude/offset invariant (the
    standard semantics); flat subsequences (std == 0) are given infinite
    distance unless the query is itself flat — matching UCR convention
    that a constant segment matches nothing but a constant;
  - for very long patterns or huge k the literature's pruning (early
    abandon, LB_Keogh) is a per-partition refinement — this exact version
    is the correctness baseline those optimize.
"""

from __future__ import annotations

import math
from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _znorm_query(query: Sequence[float]) -> List[float]:
    m = len(query)
    mu = sum(query) / m
    var = sum((q - mu) ** 2 for q in query) / m
    sd = math.sqrt(var)
    if sd == 0.0:
        return [0.0] * m
    return [(q - mu) / sd for q in query]


def _sq(e: Column) -> Column:
    """e*e, NOT e**2: Spark's ** compiles to Math.pow, whose exactness for
    integer exponents is only 1-ulp-bounded — an explicit product is the
    same correctly-rounded IEEE multiply DuckDB's (x*x) oracle computes,
    so distances stay bit-identical cross-engine."""
    return e * e


def subsequence_match(
    df: DataFrame,
    query: Sequence[float],
    ts_col: str = "ts",
    value_col: str = "value",
    by: Sequence[str] = ("user_id",),
    top_k: int = 10,
    max_dist: float = None,
) -> DataFrame:
    """(by..., start_ts, dist) rows for subsequences close to `query`
    under z-normalized Euclidean distance: the global top-k by default,
    or — when `max_dist` is given — EVERY subsequence with dist <=
    max_dist (threshold semantics; set top_k=None for no limit). The
    threshold form is the scale shape: no global ordering at all, the
    filter rides the per-key window stage map-side. Ordering within a
    key must be unambiguous — deduplicate or tiebreak `ts_col` first if
    a key can carry simultaneous rows."""
    m = len(query)
    if m < 2:
        raise ValueError("query pattern needs at least 2 points")
    by = list(by)
    q = _znorm_query(query)
    q_flat = all(v == 0.0 for v in q)
    qlit = F.array(*[F.lit(float(v)) for v in q])

    w = Window.partitionBy(*by).orderBy(ts_col).rowsBetween(0, m - 1)
    sub = (
        df.select(*by, ts_col, F.col(value_col).cast("double").alias("__v"))
        .withColumn("__seq", F.collect_list("__v").over(w))
        .filter(F.size("__seq") == m)
    )
    mean = _fsum(F.col("__seq")) / m
    sub = sub.withColumn("__mu", mean)
    var = _fsum(F.transform("__seq", lambda x: _sq(x - F.col("__mu")))) / m
    sub = sub.withColumn("__sd", F.sqrt(var))

    if q_flat:
        # a flat query matches flat subsequences exactly (dist 0), and by
        # convention nothing else meaningfully — non-flat subsequences get
        # their z-normed self-distance to the zero vector
        dist = F.when(F.col("__sd") == 0.0, F.lit(0.0)).otherwise(
            F.sqrt(_fsum(F.transform(
                "__seq", lambda x: _sq((x - F.col("__mu")) / F.col("__sd"))
            )))
        )
    else:
        dist = F.when(F.col("__sd") == 0.0, F.lit(float("inf"))).otherwise(
            F.sqrt(_fsum(F.zip_with(
                "__seq", qlit,
                lambda x, qv: _sq((x - F.col("__mu")) / F.col("__sd") - qv),
            )))
        )
    if max_dist is not None:
        # Fence the threshold filter: PushDownPredicate substitutes a
        # deterministic alias into the Filter condition, which would
        # inline the whole mu/sd/sqrt fold and evaluate it TWICE per
        # subsequence (the inlined-filter double-eval trap the plan audit
        # counts; drop-column uuid riders get pruned before they fence —
        # r9 lesson). A value-neutral nondeterministic rider on the dist
        # expression itself cannot be pruned (the column is consumed) and
        # blocks both CollapseProject and predicate pushdown: 0.0*rand()
        # is exactly 0.0 and dist >= 0, so dist + 0.0*rand() == dist
        # bit-for-bit.
        dist = dist + F.lit(0.0) * F.rand(12345)
        out = sub.select(*by, F.col(ts_col).alias("start_ts"), dist.alias("dist"))
        out = out.filter(F.col("dist") <= float(max_dist))
        if top_k is None:
            return out
    else:
        out = sub.select(*by, F.col(ts_col).alias("start_ts"), dist.alias("dist"))
    return out.orderBy(F.col("dist").asc(), *by, "start_ts").limit(top_k)


def _fsum(arr) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
