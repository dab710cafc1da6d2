"""Skew-handling utilities: salted aggregation and salted joins.

At 100 TB a handful of hot keys (a viral document's shingle, a default
user_id, an empty-string fingerprint) can turn one reducer into the whole
job's critical path. First line of defense is AQE
(spark.sql.adaptive.skewJoin.enabled splits oversized partitions of
sort-merge joins at runtime); these helpers cover the cases AQE does not:
skewed *aggregations* and skewed joins against a *broadcastable* side.

Everything is deterministic — salts are hashes of row content, not RNG —
so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (spark_agg, combiner) per supported algebraic aggregate: stage 1 computes
# the partial per (keys, salt); stage 2 combines partials per keys.
_ALGEBRAIC = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Tuple[str, str, str]],
    n_salt: int = 64,
) -> DataFrame:
    """Two-stage aggregation for skewed grouping keys.

    aggs: (column, fn, alias) with fn in {count, sum, min, max} — the
    algebraic aggregates, which decompose into partial + combine. Stage 1
    groups by (keys, salt) so a hot key's rows spread over n_salt reducers;
    stage 2 combines the ≤ n_salt partials per key. The salt is a hash of
    the full row (deterministic, uniform); for count the salted column is
    irrelevant.

    Equivalent by algebra to df.groupBy(keys).agg(...) — pinned in tests.
    """
    for _, fn, _ in aggs:
        if fn not in _ALGEBRAIC:
            raise ValueError(f"unsupported aggregate {fn!r}; algebraic only: {sorted(_ALGEBRAIC)}")
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in df.columns])), F.lit(n_salt))
    stage1 = (
        df.withColumn("__salt__", salt)
        .groupBy(*keys, "__salt__")
        .agg(*[
            _ALGEBRAIC[fn][0](col).alias(f"__p_{alias}") for col, fn, alias in aggs
        ])
    )
    return stage1.groupBy(*keys).agg(*[
        _ALGEBRAIC[fn][1](f"__p_{alias}").alias(alias) for _, fn, alias in aggs
    ])


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed large side against a small side without a hot
    partition: the skewed side gets a deterministic per-row salt, the small
    side is replicated n_salt times (explode of a literal range — it must
    be broadcastable, which is the case this helper exists for), and the
    join key becomes (on..., salt). Row-for-row equivalent to
    skewed.join(small, on, how).

    For two *large* skewed sides, prefer AQE's skew-join split; replication
    there multiplies real data volume.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side must not need exclusives)")
    salt = F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in skewed.columns])), F.lit(n_salt))
    s = skewed.withColumn("__salt__", salt)
    rep = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return s.join(F.broadcast(rep), [*on, "__salt__"], how).drop("__salt__")
