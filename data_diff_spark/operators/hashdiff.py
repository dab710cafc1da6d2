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
    normd = normalized_columns(t.schema, cols, t.precision_overrides, t.kind_overrides)
    cks = md5_as_int(row_fingerprint(normd))
    key_norm = [
        F.coalesce(c, F.lit("<null>")) for c in
        normalized_columns(t.schema, cols[:nkeys], t.precision_overrides, t.kind_overrides)
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
    emit_equal_duplicates: bool = False,
) -> DataFrame:
    """Diff DataFrame (sign, *columns-of-table-1's-names), duplicate-PK-aware.

    Default: emit ALL rows of every PK whose row *multiset* differs between
    sides — deterministic regardless of bucketing.

    emit_equal_duplicates=True reproduces the reference's diff_sets artifact
    (hashdiff_tables.py:62-69): a PK with 2+ rows on either side is emitted
    "regardless of values" — but only when its segment was downloaded, i.e.
    here, when its bucket digest mismatched. Like the reference, that output
    then depends on how the key space was segmented.
    """
    cols1, cols2 = _check_consistent(t1, t2)
    out_names = cols1
    keys = list(t1.key_columns)

    # Persisted: each side feeds two plan subtrees (the digest compare and
    # the phase-2 row diff), and normalization+md5 is the dominant per-row
    # cost — without the persist both scans run twice. MEMORY_AND_DISK
    # spills for tables beyond executor memory; at extreme scale prefer
    # writing (keys, cks, bucket) to a bucketed intermediate instead.
    a = _annotated(t1, cols1, out_names, n_buckets).persist()
    b = _annotated(t2, cols2, out_names, n_buckets).persist()

    # Materialize the mismatched bucket ids ONCE (≤ n_buckets ints on the
    # driver). Leaving this as a lazy semi-join makes Spark rebuild the whole
    # digest subtree — two checksum scans — once per downstream branch; an
    # eager digest compare is also exactly how the reference behaves (one
    # checksum round-trip, then prune, hashdiff_tables.py:210-215).
    bad_ids = [
        r[_BUCKET]
        for r in mismatched_buckets(_bucket_digest(a), _bucket_digest(b)).collect()
    ]
    if len(bad_ids) < n_buckets:
        # isin over a literal set compiles to a hash-set probe (InSet) —
        # no join, no recompute; empty set folds to an empty scan.
        a_bad = a.filter(F.col(_BUCKET).isin(bad_ids))
        b_bad = b.filter(F.col(_BUCKET).isin(bad_ids))
    else:
        # every bucket differs (the reference's documented degradation mode:
        # many differences) — skip the useless filter and diff everything.
        a_bad, b_bad = a, b

    # Phase 2 — the diff_sets pass, as ONE shuffle and zero joins: union both
    # sides tagged with a sign, hash-partition by PK, and compare each PK's
    # per-side (count, checksum-sum) multiset digest with window aggregates.
    # (A groupBy + join-back formulation re-scans the sources and risks
    # nested-loop null-safe joins; the window form shuffles the surviving
    # rows exactly once.)
    from pyspark.sql import Window

    u = a_bad.withColumn(SIGN_COL, F.lit("-")).unionAll(
        b_bad.withColumn(SIGN_COL, F.lit("+"))
    )
    w = Window.partitionBy(*keys)
    is_a = (F.col(SIGN_COL) == "-").cast("long")
    is_b = (F.col(SIGN_COL) == "+").cast("long")
    ca = F.sum(is_a).over(w)
    cb = F.sum(is_b).over(w)
    sa = F.sum(F.when(F.col(SIGN_COL) == "-", F.col(_CKS))).over(w)
    sb = F.sum(F.when(F.col(SIGN_COL) == "+", F.col(_CKS))).over(w)

    multiset_differs = (ca != cb) | ~sa.eqNullSafe(sb)
    if emit_equal_duplicates:
        pk_differs = (ca != 1) | (cb != 1) | multiset_differs
    else:
        pk_differs = multiset_differs

    return u.withColumn("__emit__", pk_differs).filter(F.col("__emit__")).select(
        SIGN_COL, *out_names
    )


def count_and_checksum(t: TableSegment) -> Tuple[int, Optional[int]]:
    """Whole-table count + checksum (one pass); see TableSegment.count_and_checksum."""
    return t.count_and_checksum()
