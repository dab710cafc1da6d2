"""Deterministic sampling for training-data pipelines.

Spark's `df.sample()` is seeded per-partition: the selected rows change
whenever partitioning, task retries, or row order change — useless for a
reproducible corpus snapshot, an A/B holdout, or a train/val/test split
that must survive re-runs and engine changes. These operators key every
decision off a content hash (functions/text.py:hash60 — md5-derived, so
DuckDB/Postgres replay it bit-identically), making samples:

  - stable under repartitioning, retries, and cluster size,
  - consistent across engines (the DuckDB oracles replay them exactly),
  - disjoint/complete for splits (every row lands in exactly one split).

The reference engine has no sampling surface beyond `_sample_and_count_
exclusive` (random, joindiff diagnostics); these are beyond-reference
operators for the 100 TB pipeline story. All are map-only (zero shuffle)
except stratified_sample's per-stratum rank, which compiles to
WindowGroupLimit[Partial] below the exchange on Spark 3.5+ so the shuffle
carries at most n rows per stratum per map partition.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_diff_spark.functions.text import duckdb_hash60, hash60

HASH_SPACE = 1 << 60  # hash60 is uniform on [0, 2^60)


def _key_col(key_cols: Sequence[str], salt: str) -> Column:
    # 0x1F (ASCII unit separator) never appears in real text; the salt decorrelates
    # independent samples over the same keys (e.g. a 1% probe vs a 10% eval
    # holdout must not be nested unless the caller wants them to be).
    return F.concat_ws("\x1f", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])


def _bucket(key_cols: Sequence[str], salt: str) -> Column:
    return hash60(_key_col(key_cols, salt))


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_cols: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Keep rows whose key hashes below `fraction` of the hash space.
    Map-only: the filter is a pure Column predicate evaluated in the scan
    stage (no shuffle; the md5 itself is not a parquet-pushable filter, so
    the scan still reads all row groups — at 100 TB, pre-partition the
    corpus by a hash bucket column if sampling is the dominant access
    path). Exactly reproducible: the same (keys, salt) always selects the
    same rows, on any cluster layout."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    threshold = int(fraction * HASH_SPACE)
    return df.filter(_bucket(key_cols, salt) < F.lit(threshold))


def duckdb_hash_sample_pred(fraction: float, key_cols: Sequence[str], salt: str = "") -> str:
    """The DuckDB predicate replaying hash_sample bit-identically."""
    threshold = int(fraction * HASH_SPACE)
    key = "concat_ws(chr(31), '{}'".format(salt) + "".join(
        f", {c}::varchar" for c in key_cols
    ) + ")"
    return f"{duckdb_hash60(key)} < {threshold}"


def split_assign(
    df: DataFrame,
    weights: Mapping[str, float],
    key_cols: Sequence[str],
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Tag every row with a split label ('train'/'val'/'test'/...) by
    cumulative hash ranges: disjoint, complete, reproducible, map-only.
    Weights are normalized; the last split absorbs rounding remainder so
    every hash value maps to exactly one label."""
    if not weights:
        raise ValueError("at least one split is required")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _bucket(key_cols, salt)
    expr: Optional[Column] = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        bound = F.lit(int(cum * HASH_SPACE))
        expr = F.when(h < bound, F.lit(name)) if expr is None else expr.when(h < bound, F.lit(name))
    label = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out, label)


def duckdb_split_assign_expr(
    weights: Mapping[str, float], key_cols: Sequence[str], salt: str = ""
) -> str:
    total = float(sum(weights.values()))
    key = "concat_ws(chr(31), '{}'".format(salt) + "".join(
        f", {c}::varchar" for c in key_cols
    ) + ")"
    h = duckdb_hash60(key)
    names = list(weights)
    cases, cum = [], 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cases.append(f"when {h} < {int(cum * HASH_SPACE)} then '{name}'")
    return "case " + " ".join(cases) + f" else '{names[-1]}' end"


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    key_cols: Sequence[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic n rows per stratum: rank rows within each stratum by
    their key hash (ties broken by the key itself — total order, so the
    selection is unique) and keep the n smallest. The row_number+filter
    shape compiles to WindowGroupLimit[Partial] below the exchange
    (SPARK-37099), so each map partition forwards at most n rows per
    stratum — the shuffle is bounded by n * strata * partitions, never the
    corpus."""
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    w = Window.partitionBy(*strata_cols).orderBy(
        _bucket(key_cols, salt).asc(), _key_col(key_cols, salt).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def mix_corpora(
    sources: Mapping[str, tuple],
    key_cols: Sequence[str],
    salt: str = "mix",
    source_col: str = "mix_source",
) -> DataFrame:
    """Build a training mixture from several corpora with per-source
    sampling rates: sources = {name: (df, fraction)}; each source is
    hash-sampled at its fraction (deterministic per (keys, salt, name) —
    re-runs and engine changes select the same rows) and tagged with its
    name. The data-mixing step of every pretraining recipe, as one
    map-only union — no shuffle, sampling happens in each source's scan
    stage. Sources must share a schema (unionByName); iteration order is
    name-sorted so the plan is stable."""
    parts = []
    for name in sorted(sources):
        df, fraction = sources[name]
        if not (0.0 < fraction <= 1.0):
            raise ValueError(f"fraction for {name!r} must be in (0, 1], got {fraction}")
        s = df if fraction >= 1.0 else hash_sample(df, fraction, key_cols, salt=f"{salt}:{name}")
        parts.append(s.withColumn(source_col, F.lit(name)))
    if not parts:
        raise ValueError("mix_corpora needs at least one source")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
