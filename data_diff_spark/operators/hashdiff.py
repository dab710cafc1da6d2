"""hashdiff — checksum-bucketed diff, the cross-engine algorithm.

Spark redesign of /root/reference/data_diff/hashdiff_tables.py:88-264.

The reference recursively bisects the key space, issuing one
count+md5-checksum SQL query per segment per side per level, because each
round-trip to a remote database is expensive. In Spark a single shuffle
replaces the whole recursion tree (SURVEY.md §4.3):

  1. per row: checksum = md5_as_int(fingerprint(normalized cols)),
     bucket = pmod(xxhash64(normalized keys), n_buckets)
  2. per side: groupBy(bucket).agg(count, sum(checksum))   -- map-side
     combined partial aggregation; the shuffle moves only n_buckets rows
  3. compare the two tiny digest tables; equal digests prune the bucket
     (the reference's checksum-equality pruning, hashdiff_tables.py:210-212)
  4. only rows of mismatched buckets are re-read and diffed with the exact
     diff_sets duplicate-PK semantics (hashdiff_tables.py:30-84)

Cost on a cluster: two scans with count/sum partial aggs (the Spark analogue
of "within an order of magnitude of count(*)", README.md:191) plus work
proportional to the number of *differing* buckets — not to table size.

The checksum formula is bit-identical to every reference dialect (see
normalize.py), so step 2's digests can also be computed by a remote
PostgreSQL/DuckDB/Snowflake via the reference's segment SQL
(table_segment.py:239-258) for true cross-engine comparisons.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_diff_spark.normalize import (
    md5_as_int,
    normalized_columns,
    row_fingerprint,
)
from data_diff_spark.operators.joindiff import SIGN_COL, _check_consistent
from data_diff_spark.table import TableSegment

DEFAULT_N_BUCKETS = 4096  # replaces bisection_factor=32 ** levels; one knob

_CKS = "__cks__"
_BUCKET = "__bucket__"
_CNT = "__cnt__"
_SUM = "__sum__"


def _annotated(t: TableSegment, cols: List[str], out_names: List[str], n_buckets: int) -> DataFrame:
    """Rows + per-row checksum + bucket id, columns renamed to the shared
    output names. Bucketing hashes the *normalized key strings* so both
    sides land in the same bucket even when key columns differ in name or
    physical type (the reference aligns segments by key value,
    diff_tables.py:377-391 — hashing canonical strings gives the same
    alignment-by-construction)."""
    nkeys = len(t.key_columns)
    df = t.make_select()
    normd = normalized_columns(t.schema, cols, t.precision_overrides)
    cks = md5_as_int(row_fingerprint(normd))
    key_norm = [
        F.coalesce(c, F.lit("<null>")) for c in
        normalized_columns(t.schema, cols[:nkeys], t.precision_overrides)
    ]
    bucket = F.pmod(F.xxhash64(*key_norm), F.lit(n_buckets))
    renamed = [F.col(c).alias(o) for c, o in zip(cols, out_names)]
    return df.select(*renamed, cks.alias(_CKS), bucket.alias(_BUCKET))


def _bucket_digest(df: DataFrame) -> DataFrame:
    return df.groupBy(_BUCKET).agg(
        F.count(F.lit(1)).alias(_CNT), F.sum(_CKS).alias(_SUM)
    )


def mismatched_buckets(da: DataFrame, db: DataFrame) -> DataFrame:
    """Bucket ids whose (count, checksum-sum) digests differ between sides."""
    a = da.select(F.col(_BUCKET), F.col(_CNT).alias("ca"), F.col(_SUM).alias("sa"))
    b = db.select(F.col(_BUCKET), F.col(_CNT).alias("cb"), F.col(_SUM).alias("sb"))
    j = a.join(b, on=_BUCKET, how="full_outer")
    differs = (
        ~F.col("ca").eqNullSafe(F.col("cb")) | ~F.col("sa").eqNullSafe(F.col("sb"))
    )
    return j.filter(differs).select(_BUCKET)


def hash_diff(
    t1: TableSegment,
    t2: TableSegment,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Diff DataFrame (sign, *columns-of-table-1's-names), duplicate-PK-aware.

    diff_sets contract (hashdiff_tables.py:62-69): for each PK, if either
    side has ≠1 rows, or the single rows differ, emit ALL rows of that PK
    from both sides ('-' for A, '+' for B); otherwise emit nothing.
    """
    cols1, cols2 = _check_consistent(t1, t2)
    out_names = cols1
    keys = list(t1.key_columns)

    a = _annotated(t1, cols1, out_names, n_buckets)
    b = _annotated(t2, cols2, out_names, n_buckets)

    bad = F.broadcast(mismatched_buckets(_bucket_digest(a), _bucket_digest(b)))

    # Only rows of mismatched buckets survive — at scale this is the
    # reference's "few differences ⇒ cheap" property.
    a_bad = a.join(bad, on=_BUCKET, how="left_semi")
    b_bad = b.join(bad, on=_BUCKET, how="left_semi")

    # Per-PK digests on the surviving rows: count + checksum-sum identify a
    # PK's row multiset (the reference compares downloaded rows in memory;
    # we compare their checksums distributed).
    def pk_digest(df: DataFrame, side: str) -> DataFrame:
        g = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias(f"c{side}"), F.sum(_CKS).alias(f"s{side}")
        )
        return g.select(
            *[F.col(k).alias(f"__k{side}_{k}") for k in keys], f"c{side}", f"s{side}"
        )

    pa = pk_digest(a_bad, "a")
    pb = pk_digest(b_bad, "b")
    on = None
    for k in keys:
        cond = F.col(f"__ka_{k}").eqNullSafe(F.col(f"__kb_{k}"))
        on = cond if on is None else on & cond
    pkj = pa.join(pb, on=on, how="full_outer")
    pk_differs = (
        (F.coalesce(F.col("ca"), F.lit(0)) != 1)
        | (F.coalesce(F.col("cb"), F.lit(0)) != 1)
        | ~F.col("sa").eqNullSafe(F.col("sb"))
    )
    diff_pks = pkj.filter(pk_differs).select(
        *[F.coalesce(F.col(f"__ka_{k}"), F.col(f"__kb_{k}")).alias(f"__k_{k}") for k in keys]
    )

    # NULL-safe semi-join back to the full rows; AQE turns this into a
    # broadcast join at runtime when the diff-PK set is small (the common
    # case), without us guessing its size at plan time.
    def emit(df: DataFrame, sign: str) -> DataFrame:
        cond = None
        for k in keys:
            c = df[k].eqNullSafe(diff_pks[f"__k_{k}"])
            cond = c if cond is None else cond & c
        j = df.join(diff_pks, on=cond, how="left_semi")
        return j.select(F.lit(sign).alias(SIGN_COL), *out_names)

    return emit(a_bad, "-").unionAll(emit(b_bad, "+"))


def count_and_checksum(t: TableSegment) -> Tuple[int, Optional[int]]:
    """Whole-table count + checksum (one pass); see TableSegment.count_and_checksum."""
    return t.count_and_checksum()
