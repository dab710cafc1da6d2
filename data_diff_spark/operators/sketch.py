"""Mergeable distinct-count sketches: incremental NDV maintenance.

operators/incremental.py refreshes count/sum rollups from diffs and
REFUSES distinct counts — exact NDV is not delta-maintainable (a delete
may or may not remove the last occurrence). The industry answer is a
mergeable sketch: Spark ships Apache DataSketches HyperLogLog as
`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate` (binary,
algebraic, map-side combinable). This module wraps them into the same
maintenance discipline incremental.py uses for counts and sums:

  distinct_rollup          per-group binary sketch + estimate per column
  refresh_distinct_rollup  fold NEW rows into a stored rollup — union of
                           sketches, touching only affected groups; no
                           corpus rescan. Insert-only by contract:
                           sketches cannot forget, so deletions are
                           refused loudly (same policy as incremental's
                           min/max refusal), not approximated.
  estimate_union           cross-group NDV from the stored sketches alone
                           (e.g. distinct users over any day range from
                           per-day sketches) — the 100 TB pattern: one
                           sketch per partition at ingest, every later
                           NDV question answered by merging kilobytes.

Error: DataSketches HLL with lg_k=12 gives ~1.6% RSE (public library
documentation); tests pin observed error well inside 3*RSE and pin the
algebraic property estimate(sketch(A) ∪ sketch(B)) == estimate(sketch(A
∪ B)) exactly — merging is lossless, not a second approximation.

The reference engine has no sketch surface; closest is its
`approximate_size()` row-count bound (table_segment.py:281-286).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 4 KiB per sketch, ~1.6% relative standard error


def _sk(col: str) -> str:
    return f"{col}__sketch"


def _est(col: str) -> str:
    return f"{col}__ndv"


def distinct_rollup(
    df: DataFrame,
    by: List[str],
    cols: List[str],
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """One row per `by` group: for each col, a binary HLL sketch and its
    NDV estimate, plus the exact row count. The sketch column is the
    durable artifact — store it; estimates are derived views."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.hll_sketch_agg(F.col(c), lg_k).alias(_sk(c)))
    out = df.groupBy(*by).agg(*aggs)
    for c in cols:
        out = out.withColumn(_est(c), F.hll_sketch_estimate(F.col(_sk(c))))
    return out


def refresh_distinct_rollup(
    rollup: DataFrame,
    new_rows: DataFrame,
    by: List[str],
    cols: List[str],
    lg_k: int = DEFAULT_LG_K,
    deletes: Optional[DataFrame] = None,
) -> DataFrame:
    """Fold a batch of NEW rows into a stored rollup: sketch the batch,
    full-outer-merge on the group keys, union sketches pairwise and add
    row counts. Groups untouched by the batch pass through byte-identical;
    new groups appear. Cost is O(|batch| + |rollup|) — never a rescan of
    the original corpus.

    `deletes` is refused (ValueError): an HLL sketch cannot forget. If
    the source sees deletions, rebuild the affected partitions' sketches
    instead (partition-grained rebuild is exactly what per-partition
    rollups make cheap)."""
    if deletes is not None:
        raise ValueError(
            "distinct sketches are insert-only: deletions cannot be "
            "subtracted from an HLL sketch. Rebuild the affected "
            "partitions with distinct_rollup() instead."
        )
    delta = distinct_rollup(new_rows, by, cols, lg_k)
    a = rollup.select(*by, "n_rows", *[_sk(c) for c in cols]).alias("a")
    b = delta.select(*by, "n_rows", *[_sk(c) for c in cols]).alias("b")
    joined = a.join(b, on=by, how="full_outer")
    out_cols = [
        *[F.col(k) for k in by],
        (
            F.coalesce(F.col("a.n_rows"), F.lit(0))
            + F.coalesce(F.col("b.n_rows"), F.lit(0))
        ).alias("n_rows"),
    ]
    for c in cols:
        sa, sb = F.col(f"a.{_sk(c)}"), F.col(f"b.{_sk(c)}")
        merged = (
            F.when(sa.isNull(), sb)
            .when(sb.isNull(), sa)
            .otherwise(F.hll_union(sa, sb))
        )
        out_cols.append(merged.alias(_sk(c)))
    out = joined.select(*out_cols)
    for c in cols:
        out = out.withColumn(_est(c), F.hll_sketch_estimate(F.col(_sk(c))))
    return out


def estimate_union(
    rollup: DataFrame,
    cols: List[str],
    where=None,
) -> DataFrame:
    """Single-row cross-group NDV per column, computed purely from the
    stored sketches (optionally restricted by a predicate on the group
    keys): e.g. distinct users over an arbitrary day range from per-day
    sketches, without touching the fact table."""
    src = rollup.filter(where) if where is not None else rollup
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.hll_sketch_estimate(F.hll_union_agg(F.col(_sk(c)))).alias(_est(c))
        )
    return src.agg(*aggs)
