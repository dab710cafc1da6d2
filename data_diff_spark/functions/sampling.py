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


# --- budgeted corpus selection ----------------------------------------------

# Boundary-region size at which the exact ordered prefix is finished with
# one single-partition window. 2^17 narrow rows (id, score, n_tok) is a
# few MB in one task — the same bound class as the components() local
# gate. With 1024 buckets per refinement level, reaching the window from
# a 10^11-row corpus takes 2 levels; every level is one small aggregate
# over a shrinking filtered region.
TOKEN_BUDGET_TAIL_ROWS = 1 << 17
TOKEN_BUDGET_BUCKETS = 1024


def _budget_scored(df: DataFrame, id_col: str, sc: Column, nt: Column) -> DataFrame:
    """(id, score, n_tok) projection + null-score guard for
    select_by_token_budget, with the score Filter FENCED: a drop-column
    rider (select-then-drop monotonically_increasing_id) gets pruned by
    ColumnPruning before it can fence, and PushDownPredicate then
    inlines the tokenization-heavy score expression into the Filter —
    the double-eval trap (r9 lesson, see timeseries' subsequence
    threshold). A value-neutral nondeterministic rider on score itself
    cannot be pruned (the column is consumed) and blocks both
    CollapseProject and predicate pushdown: 0.0*rand() is exactly +0.0,
    and score + 0.0 == score bit-for-bit for every non-NaN score the
    filter keeps (a -0.0 score normalizes to +0.0, which compares and
    orders identically). Plan-pinned in tests/test_sampling.py."""
    return df.select(
        F.col(id_col).alias("id"),
        (sc.cast("double") + F.lit(0.0) * F.rand(20260816)).alias("score"),
        F.greatest(F.lit(0).cast("long"), F.coalesce(nt.cast("long"), F.lit(0))).alias("n_tok"),
    ).filter(F.col("score").isNotNull() & ~F.isnan(F.col("score")))


def select_by_token_budget(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    score: Optional[Column] = None,
    n_tokens: Optional[Column] = None,
    n_buckets: int = TOKEN_BUDGET_BUCKETS,
    max_tail_rows: int = TOKEN_BUDGET_TAIL_ROWS,
    max_levels: int = 16,
) -> DataFrame:
    """Budgeted corpus selection: keep the best-scoring documents whose
    running token total stays within `budget` — the dataset-curation step
    "give me the highest-quality N-token corpus". Semantics are the exact
    greedy prefix of the corpus ordered by (score DESC, id ASC): a doc is
    kept iff the cumulative token count up to and including it is <=
    budget (the running sum is monotone, so the kept set is a prefix).
    Returns (id_col, score, n_tok). `id_col` must be unique (it is the
    deterministic tie-break).

    A naive implementation is a global sort + window cumsum — one
    all-to-one ordering of the full corpus. This one never sorts the
    corpus: a histogram threshold search finds the score cutoff with
    driver-side walks over per-bucket (token-sum, row-count) aggregates
    (score is bucketed over its observed range; levels refine the ONE
    boundary bucket, so each level is an aggregate over a region ~1/B
    the previous). Buckets strictly above the cutoff are kept wholesale
    by a map-side filter; only the boundary region — at most
    `max_tail_rows` rows — pays the ordered window, in one bounded task.
    A region of exactly tied scores (floor can't split it) refines on the
    id range instead, which always splits since ids are unique; non-
    numeric ids in that degenerate case fall through to the window on
    whatever region remains (correct, single-task — documented bound)."""
    from data_diff_spark.functions.text import quality_score, token_count

    sc = score if score is not None else quality_score(F.col(text_col))
    nt = n_tokens if n_tokens is not None else token_count(F.col(text_col))
    # Null discipline (r9 ADVICE): the histogram walk and the greedy
    # prefix both assume non-null, non-NaN score and a non-negative
    # token count. n_tok is clamped (F.size(tokens(NULL)) returns -1,
    # which would break the monotone-cumsum prefix invariant; a null
    # count becomes 0). Rows whose score is NULL or NaN are NOT
    # selectable — there is no deterministic place for them in the
    # (score DESC, id ASC) order — and are filtered here; callers
    # wanting them ranked must coalesce their score expression first.
    scored = _budget_scored(df, id_col, sc, nt).persist()

    from pyspark.sql.types import NumericType

    numeric_ids = isinstance(scored.schema["id"].dataType, NumericType)

    def bucket_expr(col, lo, hi):
        span = hi - lo
        if span <= 0:  # single point: everything in bucket 0
            return F.lit(0)
        b = F.floor((col - F.lit(float(lo))) / F.lit(float(span)) * n_buckets)
        return F.greatest(F.lit(0), F.least(F.lit(n_buckets - 1), b)).cast("int")

    region = F.lit(True)
    head_preds = []
    consumed = 0
    tail = None  # set when the boundary region is small enough to window
    phase = "score"  # then "id" once scores are exactly tied
    lo, hi = None, None  # refinement bounds for the current phase column

    for _level in range(max_levels):
        col = F.col("score") if phase == "score" else F.col("id")
        if lo is None:  # first level of a phase: observe the range
            r = scored.filter(region).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            ).collect()[0]
            if r["lo"] is None:  # empty region: nothing left to place
                break
            lo, hi = float(r["lo"]), float(r["hi"])
        be = bucket_expr(col, lo, hi)
        hist = (
            scored.filter(region)
            .groupBy(be.alias("b"))
            .agg(
                F.sum("n_tok").alias("tok"), F.count(F.lit(1)).alias("cnt"),
                F.min("score").alias("min_s"), F.max("score").alias("max_s"),
                F.min(col).alias("min_c"), F.max(col).alias("max_c"),
            )
            .collect()
        )
        # walk in global order: score DESC <=> bucket DESC; id ASC <=> ASC
        hist.sort(key=lambda r: r["b"], reverse=(phase == "score"))
        boundary = None
        cum = consumed
        for row in hist:
            if cum + row["tok"] <= budget:
                cum += row["tok"]
            else:
                boundary = row
                break
        if boundary is None:  # whole region fits: keep it outright
            head_preds.append(region)
            break
        cmp = (be > F.lit(boundary["b"])) if phase == "score" else (be < F.lit(boundary["b"]))
        head_preds.append(region & cmp)
        consumed = cum
        region = region & (be == F.lit(boundary["b"]))
        if boundary["cnt"] <= max_tail_rows:
            tail = scored.filter(region)
            break
        if phase == "score" and boundary["min_s"] == boundary["max_s"]:
            if not numeric_ids:
                tail = scored.filter(region)  # documented non-numeric fallback
                break
            phase, lo, hi = "id", None, None  # exact ties: refine on id range
        else:
            lo, hi = float(boundary["min_c"]), float(boundary["max_c"])
            if lo == hi and phase == "id":  # unreachable with unique ids
                tail = scored.filter(region)
                break
    else:
        tail = scored.filter(region)  # max_levels exhausted: window the rest

    parts = []
    if head_preds:
        p = head_preds[0]
        for q in head_preds[1:]:
            p = p | q
        parts.append(scored.filter(p))
    if tail is not None:
        w = (
            Window.orderBy(F.col("score").desc(), F.col("id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        parts.append(
            tail.withColumn("cum", F.sum("n_tok").over(w) + F.lit(consumed))
            .filter(F.col("cum") <= budget)
            .select("id", "score", "n_tok")
        )
    if not parts:
        out = scored.limit(0)
    else:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    out = out.select(F.col("id").alias(id_col), "score", "n_tok")
    out._ddspark_persisted = [scored]  # released by the workload harness
    return out
