"""Deduplication operators for training-data pipelines.

Four dedup families, each chosen for a different scale/accuracy point. The
reference engine (datafold/data-diff) has no dedup surface; these are the
beyond-reference operators the brief asks for, designed Spark-first:

  exact_dedup          one hash-groupBy (single shuffle, map-side combine)
  jaccard_pairs        exact n-gram Jaccard via an inverted-index shingle
                       join — never materializes the O(n^2) cross product;
                       only docs sharing >=1 shingle ever meet
  minhash_lsh_dedup    MinHash signatures (one explode + one map-side-
                       combinable min-agg) -> LSH band join for candidates
                       -> exact Jaccard verification of candidates only
  simhash / simhash_pairs
                       60-bit SimHash computed as a pure per-row array fold
                       (NO shuffle at all for the signature), then a
                       pigeonhole chunk join for hamming-distance pairs

Scale notes (100 TB):
  - Shingle explode is the dominant shuffle; `max_shingle_freq` drops
    ultra-common shingles (stop-shingles) which otherwise create quadratic
    skew in the inverted-index join (one boilerplate shingle shared by 1M
    docs is a 10^12-row join partition). The cap is ON by default
    (DEFAULT_MAX_SHINGLE_FREQ) with the dropped-shingle count logged —
    with the cap the result is Jaccard over the *pruned* shingle space.
  - Minhash min-aggregation combines map-side: the shuffle carries one
    k-vector per (doc, reducer), not one row per shingle.
  - LSH band join shuffles (band_idx, band_hash) — uniform by construction
    (hash values), so no salting needed.
  - All hashes are md5-derived (functions/text.py:hash60) so results are
    reproducible across engines; swap hash60 for xxhash64 for ~2x scan
    speed when cross-engine parity is not required.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

logger = logging.getLogger(__name__)

# A shingle in more docs than this is boilerplate, not signal: it cannot
# separate near-duplicates, but it quadratically inflates the inverted-index
# join. 100k keeps every plausible real shingle at sub-100TB corpus sizes
# while capping a viral shingle's join contribution at 100k^2 rows.
DEFAULT_MAX_SHINGLE_FREQ = 100_000

from data_diff_spark.functions.text import (
    P31,
    hash60,
    perm_coefficients,
)
from data_diff_spark.planutil import explode_nonnull


# --- exact ------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Collapse byte-identical documents: one row per distinct text with the
    canonical (minimum) id and the copy count. Single shuffle on the md5 of
    the text — the 100 TB-safe way to dedup (never groups on the full text
    bytes; the 32-char digest is the shuffle key)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- exact n-gram Jaccard similarity join -----------------------------------


def shingle_sets(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingles: array<string>) with distinct word n-grams per doc.

    Two plan-shape guards, both measured to matter ~5-10x at sf0.1:
      - the token array is materialized in its own projection (expressions
        referenced from a higher-order-function lambda are re-evaluated per
        element — inlining tokenize into the transform re-tokenizes once
        per gram);
      - a nondeterministic no-op column rides along in the shingle
        projection so Catalyst cannot push inferred filters
        (InferFiltersFromGenerate, join-constraint isnotnull) below it —
        pushed down, those filters inline the whole tokenize+ngram pipeline
        into per-row Filter conditions, evaluating it up to 5x per row."""
    from data_diff_spark.functions.text import tokens

    t = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
    )
    # pushdown barrier: any nondeterministic no-op works. uuid(), not
    # monotonically_increasing_id: streaming queries reject the latter
    # even when it sits in a STATIC subtree joined into the stream
    # (similarity_stream's corpus index).
    barrier = F.expr("uuid()")
    return (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_toks"))
        .select(
            "id",
            F.array_distinct(
                F.when(F.size(t) >= n, grams).otherwise(F.array().cast("array<string>"))
            ).alias("shingles"),
            barrier.alias("_nd"),  # pushdown barrier
        )
        .drop("_nd")
    )


def jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: Optional[int] = DEFAULT_MAX_SHINGLE_FREQ,
) -> DataFrame:
    """All unordered doc pairs with n-gram Jaccard >= threshold, computed
    exactly via the inverted-index pattern: explode distinct shingles, self-
    join on the shingle, count common shingles per pair, then
    J = inter / (|A| + |B| - inter). Only pairs sharing at least one shingle
    are ever formed; with threshold > 0 that is also every qualifying pair.

    `max_shingle_freq` (DEFAULT_MAX_SHINGLE_FREQ by default; None disables)
    drops shingles occurring in more than that many docs *before* both the
    sizes and the intersection are counted — consistent pruning, so the
    returned value is true Jaccard over the pruned shingle space. The
    number of dropped shingles is computed up front (one small
    map-side-combined frequency aggregation) and LOGGED — never silent —
    and when nothing exceeds the cap the plan is byte-identical to the
    uncapped one (no anti-join, set sizes straight off the arrays).

    The shingle frame is persisted (MEMORY_AND_DISK): it feeds three plan
    subtrees (both self-join sides + set sizes), and broadcast joins can't
    reuse exchanges, so without the persist the tokenize+shingle pipeline
    runs 3x. At 100 TB swap the persist for a bucketed intermediate
    table."""
    s = shingle_sets(df, n, text_col, id_col).persist()
    ex = s.select("id", F.explode("shingles").alias("sh"))
    pruned = False
    handles = [s]
    if max_shingle_freq is not None:
        viral = (
            ex.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") > max_shingle_freq)
            .select("sh")
            .persist()
        )
        n_viral = viral.count()
        if n_viral:
            logger.warning(
                "jaccard_pairs: dropping %d shingle(s) occurring in more than "
                "%d docs; jaccard values are exact over the pruned shingle "
                "space (pass max_shingle_freq=None to disable)",
                n_viral, max_shingle_freq,
            )
            ex = ex.join(F.broadcast(viral), "sh", "left_anti")
            pruned = True
            handles.append(viral)  # released with the shingle cache
        else:
            logger.info(
                "jaccard_pairs: no shingle exceeds max_shingle_freq=%d; "
                "result is exact", max_shingle_freq,
            )
            viral.unpersist()
    if pruned:
        sizes = ex.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    else:
        # unpruned: set sizes come straight off the shingle arrays — one
        # scan, no explode/shuffle
        sizes = s.select("id", F.size("shingles").alias("sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    out = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # caller-managed cache lifecycle (operators/hashdiff.py contract): the
    # shingle cache (and the viral-shingle set when pruning engaged) must
    # outlive the lazy result; release via these handles
    out._ddspark_persisted = handles
    return out


# --- MinHash + LSH ----------------------------------------------------------


# Corpus-rows dispatch to the Arrow segment-min fold. The k=128 SQL
# aggregate runs INTERPRETED: HashAggregate declines whole-stage codegen
# above spark.sql.codegen.maxFields (100) buffer fields, and under the
# bench harness's C1-only JIT the measured cost is ~60ns per
# (row, permutation) — 2.0s for 260k exploded rows at sf0.1 vs 1.1s for
# the numpy fold (same integer math, bit-parity pinned in
# tests/test_text_dedup.py). JIT caveat (tools/PROBE_minhash_jit.json):
# under FULL tiered compilation C2 compiles the interpreted evaluators
# and the two paths are within noise at sf1/sf10 — the fold's win is
# concentrated under C1 (exactly the bench/driver instrument); on a
# long-lived cluster the dispatch is cost-neutral. Below the threshold
# the fixed Arrow cost (python worker spin-up + Arrow conversion) exceeds
# the win, so small corpora — including every sf0.01 gate — keep the
# SQL plan.
_MINHASH_ARROW_MIN_ROWS = 2048


def minhash_signatures(
    df: DataFrame,
    k: int = 128,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    _shingles: Optional[DataFrame] = None,
    n_rows: Optional[int] = None,
) -> DataFrame:
    """k-permutation MinHash signature per doc: explode distinct shingles to
    (id, h) once, then min over (a_i*h+b_i) mod P31 for all k permutations in
    ONE aggregation — the shuffle carries k longs per doc after map-side
    combine, independent of document length. Pass the action-free `n_rows`
    hint (corpus docs) to route big corpora to the Arrow segment-min fold
    (_MINHASH_ARROW_MIN_ROWS): that path folds all k permutations
    vectorized per INPUT partition, then min-merges the partials (same
    map-side-combine shuffle bound as the SQL aggregate)."""
    s = shingle_sets(df, n, text_col, id_col) if _shingles is None else _shingles
    ex = explode_nonnull(s, ["id"], F.col("shingles"), "sh").select(
        "id", (hash60(F.col("sh")) % P31).alias("h")
    )
    coeffs = perm_coefficients(k)
    if n_rows is not None and n_rows >= _MINHASH_ARROW_MIN_ROWS:
        return _minhash_arrow(ex, coeffs)
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % P31).alias(f"mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return ex.groupBy("id").agg(*aggs)


def _minhash_arrow(ex: DataFrame, coeffs: Sequence) -> DataFrame:
    """(id, h) -> (id, mh0..mh{k-1}) via numpy, with map-side combine: the
    segment-min fold runs per INPUT partition first (explode keeps a
    doc's shingle rows in its source partition), so each partition emits
    one k-long partial signature per local id; the partials are then
    hash-repartitioned by id and min-merged by a second vectorized fold.
    The shuffle carries <= k+1 longs per (partition, id) — the same
    combine property as the SQL path, independent of document length
    (r12 verdict: the previous repartition-FIRST shape shuffled every
    exploded (id, h) row). The merge is a pandas groupby-min, NOT a
    k-column SQL min aggregate: the 128-field HashAggregate declines
    codegen and its interpreted evaluators cost ~1s at sf0.1 even over
    mere partial rows (measured 2.49s vs 1.43s for this shape, parity
    identical) — the same reason the dispatch exists at all.

    Per Arrow batch: sort each ~8 MB row block by id, evaluate the
    (block x k) permutation matrix, segment-min with np.minimum.reduceat;
    block partials fold into a running per-partition accumulator with one
    pandas groupby-min per batch. The accumulator never exceeds the
    partition's distinct ids (x k+1 longs), and at most one batch's
    partials are alive besides it — the 100 TB memory bound.
    Exactly the SQL aggregation's integer math — h < P31 and a < P31, so
    a*h + b < 2^62 never overflows int64 — and min is
    order/partitioning-invariant, so block/batch/partition boundaries
    cannot change the result. The id column keeps the caller's id type
    (the fold is dtype-agnostic: argsort/reduceat/groupby all take object
    arrays), matching the SQL groupBy path."""
    k = len(coeffs)
    schema = T.StructType(
        [T.StructField("id", ex.schema["id"].dataType)]
        + [T.StructField(f"mh{i}", T.LongType()) for i in range(k)]
    )

    def fold(batches):
        import numpy as np
        import pandas as pd

        A = np.array([a for a, _ in coeffs], dtype=np.int64)
        B = np.array([b for _, b in coeffs], dtype=np.int64)
        cols = [f"mh{i}" for i in range(k)]
        step = max(1, (1 << 20) // k)  # ~8 MB permutation matrix per block
        acc = None
        for pdf in batches:
            partials = [] if acc is None else [acc]
            for lo in range(0, len(pdf), step):
                blk = pdf.iloc[lo:lo + step]
                idv = blk["id"].to_numpy()
                hv = blk["h"].to_numpy(dtype=np.int64)
                order = np.argsort(idv, kind="stable")
                idv, hv = idv[order], hv[order]
                vals = (hv[:, None] * A[None, :] + B[None, :]) % P31
                bounds = np.flatnonzero(np.r_[True, idv[1:] != idv[:-1]])
                p = pd.DataFrame(
                    np.minimum.reduceat(vals, bounds, axis=0), columns=cols
                )
                p.insert(0, "id", idv[bounds])
                partials.append(p)
            if partials:
                acc = pd.concat(partials, ignore_index=True).groupby(
                    "id", as_index=False, sort=False).min()
        if acc is not None:
            yield acc

    def merge(batches):
        import pandas as pd

        acc = None
        for pdf in batches:
            frames = [pdf] if acc is None else [acc, pdf]
            acc = pd.concat(frames, ignore_index=True).groupby(
                "id", as_index=False, sort=False).min()
        if acc is not None:
            yield acc

    partials = ex.mapInPandas(fold, schema)
    return partials.repartition(F.col("id")).mapInPandas(merge, schema)


def _band_rows(signatures: DataFrame, bands: int, rows: int) -> DataFrame:
    """(id, band_idx, band_hash) rows — the LSH bucket membership relation,
    shared by the one-shot pair join and the persisted incremental index."""
    k = bands * rows
    band_cols = [
        F.md5(F.concat_ws(",", *[F.col(f"mh{b*rows + r}") for r in range(rows)]))
        .alias(f"band{b}")
        for b in range(bands)
    ]
    assert f"mh{k-1}" in signatures.columns, "signature too short for bands*rows"
    return explode_nonnull(
        signatures,
        ["id"],
        F.array(*[
            F.struct(F.lit(b).alias("band_idx"), band_cols[b].alias("band_hash"))
            for b in range(bands)
        ]),
        "bb",
    ).select("id", "bb.band_idx", "bb.band_hash")


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 32, rows: int = 4) -> DataFrame:
    """Banding: hash each band of `rows` consecutive minhashes; docs sharing
    any (band_idx, band_hash) become a candidate pair. P(candidate) =
    1-(1-s^rows)^bands — at s=0.8, 32x4 gives miss probability ~5e-8."""
    banded = _band_rows(signatures, bands, rows)
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    threshold: float = 0.8,
    k: int = 128,
    bands: int = 32,
    rows: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_rows: Optional[int] = None,
) -> DataFrame:
    """Near-dup pairs at scale: LSH candidates, then *exact* Jaccard
    verification of candidates only (false positives are filtered; false
    negatives bounded by the banding s-curve). Output identical in shape —
    and, at sane thresholds, in content — to jaccard_pairs. `n_rows` is the
    action-free corpus-size hint for the signature fold dispatch."""
    s = shingle_sets(df, n, text_col, id_col).persist()
    sig = minhash_signatures(df, k, n, text_col, id_col, _shingles=s,
                             n_rows=n_rows)
    cand = lsh_candidate_pairs(sig, bands, rows)
    sa = s.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = s.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # caller-managed cache lifecycle (operators/hashdiff.py contract)
    out._ddspark_persisted = [s]
    return out


# --- persisted LSH index: incremental corpus dedup --------------------------
# At 100 TB the corpus is not re-deduplicated per ingest batch: the band
# membership and shingle sets are WRITTEN ONCE as tables, and each daily
# increment probes them — pair discovery cost is O(new x matching buckets),
# never O(corpus x corpus) again. The invariant (pinned in
# tests/test_text_dedup.py): pairs(old ∪ new) == pairs(old) ∪
# incremental_pairs(new vs index), because every pair with >=1 new doc has a
# new doc whose band rows are probed, and old-old pairs were found when the
# index was built.


def _bands_table_name(path: str) -> str:
    import hashlib as _hl
    import os as _os

    return "lsh_bands_" + _hl.md5(_os.path.abspath(path).encode()).hexdigest()[:12]


def lsh_index_write(
    df: DataFrame,
    path: str,
    threshold: float = 0.8,
    k: int = 128,
    bands: int = 32,
    rows: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 32,
    n_rows: Optional[int] = None,
) -> None:
    """Materialize the dedup index for a corpus: bands/ (id, band_idx,
    band_hash) BUCKETED by band_hash (external Spark bucketed table at
    <path>/bands, name + bucket count in the manifest) and shingles/
    (id, shingles) parquet, plus a params manifest (a probe with
    different k/bands/rows/n would silently find nothing — refused
    instead). Bucketing-on-write is the at-scale point of a persisted
    index: increment probes join the stored side WITHOUT an Exchange —
    only the (small) new batch shuffles, to the bucket layout — pinned
    in tests/test_plans.py::test_lsh_incremental_stored_side_no_exchange."""
    import json as _json

    spark = df.sparkSession
    s = shingle_sets(df, n, text_col, id_col)
    sig = minhash_signatures(df, k, n, text_col, id_col, _shingles=s,
                             n_rows=n_rows)
    tbl = _bands_table_name(path)
    spark.sql(f"drop table if exists {tbl}")
    (
        _band_rows(sig, bands, rows)
        .write.mode("overwrite")
        .bucketBy(n_buckets, "band_idx", "band_hash")
        .sortBy("band_idx", "band_hash")
        .option("path", f"{path}/bands")
        .saveAsTable(tbl)
    )
    s.write.mode("overwrite").parquet(f"{path}/shingles")
    meta = {"threshold": threshold, "k": k, "bands": bands, "rows": rows,
            "n": n, "bands_table": tbl, "bands_buckets": n_buckets}
    with open(f"{path}/params.json", "w") as f:
        _json.dump(meta, f)


def _bands_table(spark, index_path: str, p: dict) -> DataFrame:
    """The stored bands relation, bucket-aligned: re-registers the external
    bucketed table in a fresh session (the index is self-describing — the
    manifest carries name + bucket count; the DDL re-derives the schema
    from the files). Legacy manifests without a bucket spec fall back to a
    plain parquet scan (correct, just shuffles on probe)."""
    tbl = p.get("bands_table")
    if not tbl:
        return spark.read.parquet(f"{index_path}/bands")
    if not spark.catalog.tableExists(tbl):
        schema = spark.read.parquet(f"{index_path}/bands").schema
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        spark.sql(
            f"create table {tbl} ({cols}) using parquet "
            f"clustered by (band_idx, band_hash) sorted by (band_idx, band_hash) "
            f"into {p['bands_buckets']} buckets "
            f"location '{index_path}/bands'"
        )
    return spark.table(tbl)


def _lsh_index_params(path: str) -> dict:
    import json as _json

    with open(f"{path}/params.json") as f:
        return _json.load(f)


def minhash_lsh_incremental(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
    n_rows: Optional[int] = None,
) -> DataFrame:
    """Near-dup pairs involving AT LEAST ONE new document, against a
    persisted index: the new docs' band rows probe (stored ∪ new) band
    rows; candidates verify with exact Jaccard over stored + fresh
    shingle sets. Output shape matches minhash_lsh_dedup, canonicalized
    to id_a < id_b. With append=True the new band/shingle rows are added
    to the index afterwards, so the next increment sees this one.

    append is two plain parquet appends (idempotence is the caller's
    retry concern; route through a versioned:// table for exactly-once)."""
    spark = new_docs.sparkSession
    p = _lsh_index_params(index_path)
    threshold, k, bands, rows, n = (
        p["threshold"], p["k"], p["bands"], p["rows"], p["n"]
    )
    s_new = shingle_sets(new_docs, n, text_col, id_col).persist()
    sig = minhash_signatures(new_docs, k, n, text_col, id_col,
                             _shingles=s_new, n_rows=n_rows)
    new_bands = _band_rows(sig, bands, rows).persist()

    # Probe new x stored and new x new SEPARATELY: a union of (bucketed
    # stored ∪ new) would discard the stored side's bucket partitioning and
    # shuffle the WHOLE index per increment. Split, the stored side joins
    # Exchange-free (HashPartitioning(band_idx, band_hash) matches the
    # probe-join keys exactly) and only the new batch
    # shuffles — O(new), not O(corpus), per ingest.
    old_bands = _bands_table(spark, index_path, p)
    join_keys = (
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
    )
    cand_old = (
        new_bands.alias("a")
        .join(old_bands.alias("b"), join_keys & (F.col("a.id") != F.col("b.id")))
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
        )
    )
    cand_new = (
        new_bands.alias("a")
        .join(new_bands.alias("b"), join_keys & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    cand = cand_old.unionAll(cand_new).distinct()
    shingles = spark.read.parquet(f"{index_path}/shingles").unionByName(s_new)
    sa = shingles.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sb = shingles.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    out = (
        cand.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", inter.cast("double") / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if append:
        # materialize pairs BEFORE mutating the index: the lazy plan reads
        # the index tables, and appending to a parquet dir a running scan
        # is also reading is undefined
        out = out.persist()
        out.count()
        if p.get("bands_table"):
            # append THROUGH the bucketed table (spec must match the
            # catalog's): a raw parquet append would break the bucket
            # layout every later increment relies on
            (
                new_bands.write.mode("append")
                .bucketBy(p["bands_buckets"], "band_idx", "band_hash")
                .sortBy("band_idx", "band_hash")
                .format("parquet")
                .saveAsTable(p["bands_table"])
            )
        else:
            new_bands.write.mode("append").parquet(f"{index_path}/bands")
        s_new.write.mode("append").parquet(f"{index_path}/shingles")
        out._ddspark_persisted = [s_new, new_bands, out]
    else:
        out._ddspark_persisted = [s_new, new_bands]
    return out


# --- SimHash ----------------------------------------------------------------

SIMHASH_BITS = 60  # hash60 yields 60 deterministic bits


def _simhash_votes(hs: Column, bits: int = SIMHASH_BITS) -> Column:
    """Packed simhash from an array-of-token-hashes column: per-bit +/-1
    vote folds -> sign -> packed int64."""

    def _vote(j: int) -> Column:
        # NB: the merge lambda must have exactly 2 params (Spark binds one
        # lambda variable per parameter), so j is captured by closure.
        return F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(F.shiftright(x, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    votes = [_vote(j) for j in range(bits)]
    out = F.lit(0).cast("long")
    for j, v in enumerate(votes):
        out = out + F.when(v > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0))
    return out


def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """60-bit SimHash as a single per-row expression. NOTE: each of the
    `bits` vote folds re-evaluates the md5 token hashes — prefer
    with_simhash() on a DataFrame, which materializes the hash array once
    per row (~60x fewer md5 calls)."""
    from data_diff_spark.functions.text import tokens

    return _simhash_votes(F.transform(tokens(col), hash60), bits)


# Above this many rows the SQL vote folds (bits interpreted aggregate
# lambdas per row, each rescanning the token-hash array — O(bits*tokens)
# interpreted ops) yield to an Arrow-batched numpy bit-unpack + scatter
# over the SAME staged JVM-md5 hash column — identical packing, ties
# (vote == 0 -> bit clear) included; parity pinned in
# tests/test_text_dedup.py. Same size-gated split as hashed_vector.
_SIMHASH_UDF_MIN_ROWS = 2048


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    out: str = "sh",
    bits: int = SIMHASH_BITS,
    n_rows: Optional[int] = None,
) -> DataFrame:
    """df plus a simhash column, computed map-only (zero shuffle) in two
    projections: the token-hash array is aliased in its own Project, and
    because it is non-cheap and referenced `bits` times, Catalyst's
    CollapseProject keeps the boundary — so md5 runs once per token, not
    once per (token, bit). Pass the action-free `n_rows` hint to route
    big corpora to the numpy vote fold (_SIMHASH_UDF_MIN_ROWS)."""
    from data_diff_spark.functions.text import tokens

    hs = "_simhash_hs"
    # NULL text -> empty hash array -> simhash 0 on every route (the SQL
    # vote folds already treated the NULL fold as 0 via `when`, and the
    # DuckDB oracle coalesces votes to 0; the numpy path raised on
    # np.asarray(None) — r9 ADVICE)
    staged = df.withColumn(
        hs, F.transform(tokens(F.coalesce(F.col(text_col), F.lit(""))), hash60)
    )
    if n_rows is not None and n_rows >= _SIMHASH_UDF_MIN_ROWS:
        import numpy as np
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        J = None

        def _votes(hcol):
            nonlocal J
            if J is None:
                J = np.arange(bits, dtype=np.int64)
            arrs = [np.asarray(a if a is not None else (), dtype=np.int64) for a in hcol]
            n = len(arrs)
            if not n:
                return pd.Series([], dtype="int64")
            votes = np.zeros((n, bits), dtype=np.int64)
            lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
            if lens.sum():
                h = np.concatenate([a for a in arrs if len(a)])
                rows = np.repeat(np.arange(n), lens)
                # chunk the T x bits unpack so the temp stays ~tens of MB
                step = max(1, (1 << 22) // bits)
                for lo in range(0, len(h), step):
                    contrib = (((h[lo:lo + step, None] >> J) & 1) * 2 - 1)
                    np.add.at(votes, rows[lo:lo + step], contrib)
            packed = ((votes > 0).astype(np.int64) << J).sum(axis=1)
            return pd.Series(packed)

        _votes.__annotations__ = {"hcol": pd.Series, "return": pd.Series}
        return staged.withColumn(out, pandas_udf(_votes, "long")(F.col(hs))).drop(hs)
    return staged.withColumn(out, _simhash_votes(F.col(hs), bits)).drop(hs)


def duckdb_simhash(col: str, bits: int = SIMHASH_BITS) -> str:
    from data_diff_spark.functions.text import duckdb_hash60, duckdb_tokens

    hs = f"list_transform({duckdb_tokens(col)}, x -> {duckdb_hash60('x')})"
    terms = []
    for j in range(bits):
        vote = (
            f"list_sum(list_transform({hs}, h -> "
            f"case when (h >> {j}) & 1 = 1 then 1 else -1 end))"
        )
        terms.append(f"(case when coalesce({vote}, 0) > 0 then {1 << j} else 0 end)")
    return "(" + "::BIGINT + ".join(terms) + "::BIGINT)"


# --- benchmark decontamination ----------------------------------------------


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    n: int = 5,
    broadcast_benchmark: bool = True,
    normalize: bool = False,
) -> DataFrame:
    """Flag training documents that share word n-grams with an evaluation
    benchmark — the standard pre-training decontamination pass (GPT-3
    App. C / Llama-style 'n-gram overlap with eval sets'). Returns one row
    per CONTAMINATED corpus doc: (id, n_grams, n_hits, n_bench_docs);
    clean docs are absent (anti-join against this result to scrub).

    normalize=True lowercases and strips non-alphanumerics (to spaces)
    before shingling on BOTH sides — the usual hardening against trivial
    case/punctuation evasion of the overlap check.

    Spark-first shape: both sides explode to distinct 60-bit n-gram hashes
    (hash60, cross-engine reproducible) — an inverted-index equi-join, the
    same never-all-pairs contract as jaccard_pairs. The benchmark side is
    tiny by nature (eval sets are KBs-MBs vs a 100 TB corpus), so it is
    broadcast by default: the corpus gram stream is filtered map-side and
    ONLY hitting grams ever shuffle into the per-doc aggregation. Set
    broadcast_benchmark=False if the benchmark is genuinely large (falls
    back to a shuffled equi-join on the gram hash).
    """
    def prep(col):
        if normalize:
            col = F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
        return col

    # ONE corpus scan, via shingle_sets' staged shape: the token array is
    # materialized in its own projection (a lambda-captured tokenize
    # re-runs per gram — O(len^2) per document; this path measured 4.6x
    # at sf1.0 when it built grams from raw text), the distinct-gram
    # array in the next, then BOTH the per-doc gram count and the
    # exploded gram stream derive from it — computing n_grams in a
    # second scan would be a full redundant tokenize pass at 100 TB.
    grams = shingle_sets(
        corpus.select(F.col(id_col).alias("__id"),
                      prep(F.col(text_col)).alias("__txt")),
        n=n, text_col="__txt", id_col="__id",
    )
    # the gram-hash join key is wrapped non-NULLABLE (coalesce with a
    # never-taken 0 — md5 of a non-null gram is never null): the inner
    # join otherwise infers isnotnull(hash60(__g)) and pushdown inlines
    # the md5 into a per-row Filter UNDER the projection that computes
    # it — every gram hashed twice (round-9 double-eval audit)
    def gram_hash(c):
        return F.coalesce(hash60(c), F.lit(0))

    cg = explode_nonnull(
        grams,
        [F.col("id").alias("__id"), F.size("shingles").alias("n_grams")],
        F.col("shingles"), "__g",
    ).withColumn("__g", gram_hash(F.col("__g")))
    bg = (
        explode_nonnull(
            shingle_sets(
                benchmark.select(F.col(bench_id_col).alias("__bid"),
                                 prep(F.col(text_col)).alias("__txt")),
                n=n, text_col="__txt", id_col="__bid",
            ),
            [F.col("id").alias("__bid")], F.col("shingles"), "__g",
        )
        .withColumn("__g", gram_hash(F.col("__g")))
        .distinct()
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    hits = (
        cg.join(bg, "__g")
        .groupBy("__id")
        .agg(
            # n_grams is constant per __id (it rides along every exploded
            # row), so max() just picks it up — no second scan, no join back
            F.max("n_grams").alias("n_grams"),
            F.countDistinct("__g").alias("n_hits"),
            F.countDistinct("__bid").alias("n_bench_docs"),
        )
    )
    return hits.select(
        F.col("__id").alias(id_col), "n_grams", "n_hits", "n_bench_docs"
    )


def duckdb_decontaminate(
    bench_where: str,
    text_col: str = "text",
    n: int = 5,
) -> str:
    """DuckDB replica of decontaminate() over the documents view, with the
    benchmark defined by a WHERE predicate on the same table."""
    from data_diff_spark.functions.text import duckdb_hash60, duckdb_word_ngrams

    ng = f"list_distinct({duckdb_word_ngrams(text_col, n)})"
    return f"""
with cg as (
  select doc_id as id, {duckdb_hash60('g.g')} as g
  from (select doc_id, unnest({ng}) as g from documents) g(doc_id, g)
),
bg as (
  select distinct {duckdb_hash60('g.g')} as g, doc_id as bid
  from (select doc_id, unnest({ng}) as g from documents where {bench_where}) g(doc_id, g)
),
ngr as (select doc_id as id, len({ng})::BIGINT as n_grams from documents)
select cg.id as doc_id, any_value(ngr.n_grams) as n_grams,
       count(distinct cg.g) as n_hits, count(distinct bg.bid) as n_bench_docs
from cg join bg using (g) join ngr using (id)
group by cg.id
"""


# --- connected components / cluster resolution ------------------------------

# Below this many (directed) edge rows the iterative loop is pure job
# latency — each round is two shuffles plus a witness aggregate over a
# frame of a few thousand rows, 4-6 jobs total for a near-dup graph that
# converges in 2-4 rounds. One bounded collect + a driver union-find
# replaces all of them with a single job (measured at sf0.1: ~2.3s ->
# ~0.3s per components() call). 2^17 edge rows collect in ~a few MB —
# far under driver headroom anywhere this engine runs; bigger graphs
# take the distributed path unchanged. Same size-gated-fast-path shape
# as the LM broadcast rule (functions/lm.py:LM_BROADCAST_MAX_ROWS).
COMPONENTS_LOCAL_MAX_EDGES = 1 << 17


def _components_local(spark, edge_rows, schema) -> DataFrame:
    """Driver union-find over a bounded edge list; identical contract to
    the distributed loop (component = MIN reachable id, only ids that
    appear in the pair list are returned). Parity pinned in
    tests/test_text_dedup.py::test_components_local_matches_distributed."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for src, dst in edge_rows:
        parent.setdefault(src, src)
        parent.setdefault(dst, dst)
        ra, rb = find(src), find(dst)
        if ra != rb:
            parent[rb] = ra
    roots: dict = {}
    for v in parent:
        r = find(v)
        m = roots.get(r)
        if m is None or v < m:
            roots[r] = v
    out = [(v, roots[find(v)]) for v in parent]
    return spark.createDataFrame(out, schema)


def components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair list: (id, component)
    where component = the MINIMUM id reachable from `id` — deterministic
    regardless of iteration order, so the output is oracle-able.

    Min-label propagation with pointer jumping, all DataFrame ops:
      1. neighbor-min:  l(v) <- min(l(v), min_{(v,u) in E} l(u))
      2. pointer-jump:  l(v) <- l(l(v))   (path doubling)
    Step 1 alone converges in O(diameter) rounds; the jump makes it
    O(log diameter) (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — same contraction idea as their large-star). Each
    round is two shuffles on `id`; frames are localCheckpoint'ed so lineage
    stays flat (an iterative plan otherwise doubles every round and the
    optimizer chokes long before the cluster does). Near-dup graphs have
    tiny diameters (clusters are quasi-cliques: every member shares most
    shingles), so 2-4 rounds is typical at any corpus size.

    Convergence: labels are monotonically non-increasing under min-
    propagation, so for INTEGRAL ids sum(lbl) strictly decreases until the
    fixed point and sum-unchanged ⟺ no label changed. The sum is exact
    (decimal(38,0) — int64 ids over 10^10 rows overflow a bigint sum) and
    costs ONE aggregate per round instead of an old/new join + count.
    The witness requires the cast to decimal(38,0) to be LOSSLESS: integral
    types and scale-0 decimals only. Fractional ids (float/double/decimal
    with scale) would truncate under the cast — labels could still be
    changing while the truncated sum is unchanged, silently terminating
    early with wrong components — so they keep the join-based changed-count,
    as do non-numeric ids (no order-preserving exact sum).

    Only ids that appear in `pairs` are returned; use assign_clusters() to
    extend the mapping to singleton documents."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint()
    # size-gated fast path: the count is free (edges just materialized)
    if edges.count() <= COMPONENTS_LOCAL_MAX_EDGES:
        from pyspark.sql.types import StructField, StructType

        id_type = edges.schema["src"].dataType
        schema = StructType([
            StructField("id", id_type), StructField("component", id_type)
        ])
        return _components_local(
            pairs.sparkSession,
            [(r["src"], r["dst"]) for r in edges.collect()],
            schema,
        )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint()
    )
    from pyspark.sql.types import DecimalType, IntegralType

    lbl_type = labels.schema["lbl"].dataType
    numeric_ids = isinstance(lbl_type, IntegralType) or (
        isinstance(lbl_type, DecimalType) and lbl_type.scale == 0
    )

    def _lblsum(frame: DataFrame) -> object:
        return frame.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = None  # first round always runs; no upfront sum job
    prev_cached: Optional[DataFrame] = None
    for it in range(max_iter):
        # 1. neighbor-min: messages flow dst-label -> src, min with own label
        msgs = edges.join(
            labels.select(F.col("id").alias("dst"), "lbl"), "dst"
        ).select(F.col("src").alias("id"), "lbl")
        nm = (
            msgs.unionByName(labels)
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
        )
        # 2. pointer jump: l(v) <- l(l(v)).  Invariant l(v) <= v holds under
        # min-propagation, so the jump only ever decreases labels.
        j = nm.select(F.col("id").alias("lbl"), F.col("lbl").alias("lbl2"))
        new = nm.join(j, "lbl", "left").select(
            "id", F.coalesce(F.least("lbl", "lbl2"), F.col("lbl")).alias("lbl")
        )
        # LAZY persist, not an eager checkpoint: the convergence-witness job
        # right below materializes the cache anyway, so each round runs ONE
        # job instead of checkpoint-then-witness (measured ~1s/round of pure
        # job latency at sf0.1). Lineage still gets truncated every 4th
        # round — near-dup graphs converge in 2-4, so the optimizer never
        # sees a deep plan, while pathological graphs stay bounded.
        new = new.localCheckpoint() if it % 4 == 3 else new.persist()
        if numeric_ids:
            new_sum = _lblsum(new)
            changed = new_sum != prev_sum
            prev_sum = new_sum
        else:
            changed = (
                new.join(labels.withColumnRenamed("lbl", "old"), "id")
                .filter(F.col("lbl") != F.col("old"))
                .count()
                > 0
            )
        if prev_cached is not None:  # materialized above; parent now unused
            prev_cached.unpersist()
        prev_cached = new if it % 4 != 3 else None
        labels = new
        if not changed:
            break
    else:
        raise RuntimeError(f"components: no convergence after {max_iter} iterations")
    logger.info("components: converged after %d round(s)", it + 1)
    return labels.select("id", F.col("lbl").alias("component"))


def assign_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Every row of `df` tagged with its near-dup cluster id: the component
    min-id for paired docs, the doc's own id for singletons. The component
    map is tiny relative to the corpus (only docs that had a candidate
    pair), so the join is broadcast — the full corpus is never shuffled."""
    comp = components(pairs)
    return df.join(
        F.broadcast(comp.withColumnRenamed("id", id_col)), id_col, "left"
    ).withColumn("cluster_id", F.coalesce("component", F.col(id_col))).drop("component")


def dedup_resolve(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score: Optional[Column] = None,
    clusters: Optional[DataFrame] = None,
) -> DataFrame:
    """Cluster near-duplicates and keep ONE canonical doc per cluster:
    highest `score` (default: functions.text.quality_score on `text`),
    ties broken by maximum id — fully deterministic. Returns one row per
    cluster: (cluster_id, kept_id, n_members, kept_score).

    This is the end of the dedup pipeline: pairs (LSH) -> clusters
    (components) -> survivors. Scoring is map-only over the corpus; the
    per-cluster argmax is ONE map-side-combinable aggregation —
    max(struct(score, id)) compares lexicographically, so no window, no
    join-back, no sort of the full corpus; the shuffle carries one struct
    per (cluster, map partition).

    Pass a precomputed `clusters` frame (assign_clusters output over the
    same df/pairs) to avoid re-running components when the caller already
    materialized the assignment — the full pipeline entry does."""
    from data_diff_spark.functions.text import quality_score

    sc = score if score is not None else quality_score(F.col("text"))
    assigned = clusters if clusters is not None else assign_clusters(df, pairs, id_col)
    scored = assigned.select(
        "cluster_id", F.col(id_col).alias("id"), sc.alias("score")
    )
    return (
        scored.groupBy("cluster_id")
        .agg(
            F.max(F.struct("score", "id")).alias("best"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .select(
            "cluster_id",
            F.col("best.id").alias("kept_id"),
            "n_members",
            F.col("best.score").alias("kept_score"),
        )
    )


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_rows: Optional[int] = None,
) -> DataFrame:
    """Pairs within hamming distance `max_hamming` of each other's simhash.
    Pigeonhole: with `chunks` disjoint bit-chunks and max_hamming < chunks,
    any qualifying pair shares at least one exact chunk — so the join is on
    (chunk_idx, chunk_value), never all-pairs. Verification is
    bit_count(xor) on the 60-bit signatures."""
    assert max_hamming < chunks, "pigeonhole needs max_hamming < chunks"
    width = SIMHASH_BITS // chunks
    sh = with_simhash(df, text_col, out="sh", n_rows=n_rows).select(
        F.col(id_col).alias("id"), "sh")
    # explode_nonnull: a plain explode's inferred filter would inline the
    # whole with_simhash vote pipeline into a per-row Filter (2x the
    # interpreted token-hash fold) — see planutil.explode_nonnull
    chunked = explode_nonnull(
        sh,
        ["id", "sh"],
        F.array(*[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright("sh", c * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("chunk_val"),
            )
            for c in range(chunks)
        ]),
        "cc",
    ).select("id", "sh", "cc.chunk_idx", "cc.chunk_val")
    a, b = chunked.alias("a"), chunked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- sorted-neighborhood near-dup pairs (SNM) -------------------------------


# Skew guard for the sorted-neighborhood bucketing: a census prefix whose
# row count exceeds this is re-censused at a longer prefix (order-
# preserving subdivision of its key range), up to SNM_MAX_REFINE extra
# levels of SNM_REFINE_STEP chars each. The cap is an absolute constant,
# not a fraction of the corpus: a <=4096-row window partition is cheap on
# any executor, while "fraction" rules would leave hot buckets growing
# linearly with corpus size. At the driver-gate SFs every bucket sits far
# under the cap, so the refined path compiles to the identical
# single-broadcast-join plan (pinned by the oracle and tests).
SNM_MAX_BUCKET_ROWS = 4096
SNM_REFINE_STEP = 2
SNM_MAX_REFINE = 3


def _snm_census(keyed: DataFrame, prefix_len: int, window: int) -> list:
    """(prefix, count) census of `keyed._k`, refined until no prefix holds
    more than max(SNM_MAX_BUCKET_ROWS, window + 1) rows or the refinement
    budget is spent. Returned prefixes have MIXED lengths but partition
    the key space (a split parent is replaced by its children — including
    the bare parent string itself when keys end at the parent length), and
    lexicographic order of the prefixes equals key-range order, which the
    driver bucket fold relies on. Keys identical beyond the deepest
    refined length stay one bucket — undocumented residual skew only for
    corpora of near-identical openings longer than
    prefix_len + SNM_MAX_REFINE*SNM_REFINE_STEP chars."""
    cap = max(SNM_MAX_BUCKET_ROWS, window + 1)
    rows = keyed.groupBy(
        F.substring("_k", 1, prefix_len).alias("_pfx")).count().collect()
    census = [(r["_pfx"], r["count"]) for r in rows]
    cur_len = prefix_len
    for _ in range(SNM_MAX_REFINE):
        # splittable = over cap AND as long as its census level: a shorter
        # entry means every key in it EQUALS the prefix (substring returned
        # the whole key), so a longer prefix cannot subdivide it
        hot = [p for p, c in census if c > cap and len(p) == cur_len]
        if not hot:
            break
        cur_len += SNM_REFINE_STEP
        # one census job over the hot slice only; its result is bounded by
        # (hot prefixes) x (observed extensions), the same driver-safety
        # argument as the base census
        sub = keyed.filter(
            F.substring("_k", 1, cur_len - SNM_REFINE_STEP).isin(hot)
        ).groupBy(F.substring("_k", 1, cur_len).alias("_pfx")).count().collect()
        census = [(p, c) for p, c in census if p not in hot]
        census += [(r["_pfx"], r["count"]) for r in sub]
    census.sort(key=lambda pc: pc[0])
    return census


def snm_pairs(
    df: DataFrame,
    sort_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    max_edit_pct: int = 20,
    prefix_len: int = 2,
    compare_col: Optional[str] = None,
) -> DataFrame:
    """Sorted-neighborhood near-duplicate pairs, verified by edit distance.

    The classic entity-resolution blocking alternative to LSH (Hernandez &
    Stolfo's merge/purge, SIGMOD'95): sort the corpus by a key, compare
    each record only to its `window` successors in sort order, keep pairs
    whose Levenshtein distance is <= max_edit_pct% of the longer text.
    Output: (id_a, id_b, edit_dist, max_len) with id_a the earlier record
    in sort order — integer columns only, so the result is bit-exact
    across engines (no float similarity).

    A naive `row_number() OVER (ORDER BY ...)` is a single-task global
    sort — the one plan shape this repo bans. Scale design instead:

      1. monotone range-bucket on the first `prefix_len` chars of the
         sort key (order-preserving by construction, unlike a hash);
      2. a bounded bucket census (one row per distinct prefix — at most
         alphabet^prefix_len rows, driver-safe the same way IVF bounds
         its training sample) merges adjacent under-full buckets so every
         bucket holds MORE than `window` rows; prefixes holding more than
         SNM_MAX_BUCKET_ROWS are REFINED with longer prefixes first
         (order-preserving: extending a shared prefix subdivides its key
         range) — real corpora open with Zipf-distributed phrases, and an
         unrefined hot prefix is one giant window partition, the classic
         skew straggler (measured: the sf1 replica corpus puts 10% of all
         rows in ONE 2-char bucket, 29x the median);
      3. each bucket's last `window` rows are replicated into the next
         bucket ("carry" rows), so every record sees its full successor
         window inside exactly one bucket partition — per-bucket
         row_number/lead windows run fully parallel, and a carry-carry
         pair (already emitted natively in its home bucket) is filtered.

    Every pair in the total order appears exactly once: (a, b) is emitted
    in a's home bucket when b is local, else in the next bucket where a
    rides as a carry — step 2's fill guarantee means a successor window
    never spans more than one boundary. Ties in the sort key are broken
    by id, so the order (and the pair set) is deterministic.

    `compare_col` (default: the sort column) is the column the edit
    distance verifies — multi-pass merge/purge sorts on different blocking
    keys per pass while matching on one record representation
    (snm_pairs_multi below).

    Cost: one census agg, one broadcast of the tiny prefix->bucket map,
    one shuffle on bucket id, per-bucket windows; Levenshtein runs only on
    the O(n * window) neighbor pairs, never a cross product.
    """
    spark = df.sparkSession
    # a null sort key has no position in the total order (and would fall
    # out of the bucket join silently) — exclude it explicitly
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(sort_col).alias("_k"),
        F.col(compare_col or sort_col).alias("_c"),
    ).filter(F.col("_k").isNotNull())

    census = _snm_census(keyed, prefix_len, window)
    if not census:
        # the empty frame's id columns must match the non-empty path's
        # types (whatever id_col is — long, string, ...), not a hardcoded
        # long, or callers get an input-dependent schema
        id_t = df.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            T.StructType([
                T.StructField("id_a", id_t),
                T.StructField("id_b", id_t),
                T.StructField("edit_dist", T.IntegerType()),
                T.StructField("max_len", T.IntegerType()),
            ]),
        )
    # driver fold over the (bounded) prefix list: a bucket absorbs the next
    # prefix until it holds > window rows, so carries never need to hop twice
    buckets: list = []  # (prefixes, rowcount)
    for pfx, cnt in census:
        if buckets and buckets[-1][1] <= window:
            ps, n = buckets[-1]
            buckets[-1] = (ps + [pfx], n + cnt)
        else:
            buckets.append(([pfx], cnt))
    if len(buckets) > 1 and buckets[-1][1] <= window:
        ps_last, n_last = buckets.pop()
        ps, n = buckets[-1]
        buckets[-1] = (ps + ps_last, n + n_last)
    n_buckets = len(buckets)
    # longest-prefix-wins bucket mapping: the refined census partitions the
    # key space (a split parent is fully replaced by its children), so each
    # row matches EXACTLY ONE census prefix; one chained broadcast left
    # join per distinct prefix length (<= 1 + SNM_MAX_REFINE of them) keeps
    # this a single corpus scan. With no refinement (every gate sf) this
    # degenerates to the r12 plan: one broadcast join on the base prefix.
    by_len: dict = {}
    for i, (ps, _) in enumerate(buckets):
        for p in ps:
            by_len.setdefault(len(p), []).append((p, i))
    bcol = None
    for L in sorted(by_len, reverse=True):
        bmap = spark.createDataFrame(by_len[L], f"_bp{L} string, _b{L} int")
        keyed = keyed.join(
            F.broadcast(bmap),
            F.substring("_k", 1, L) == F.col(f"_bp{L}"), "left",
        ).drop(f"_bp{L}")
        c = F.col(f"_b{L}")
        bcol = c if bcol is None else F.coalesce(bcol, c)
    keyed = keyed.withColumn("_b", bcol).select("_b", "id", "_k", "_c")

    wdesc = Window.partitionBy("_b").orderBy(F.desc("_k"), F.desc("id"))
    carries = (
        keyed.withColumn("_rn", F.row_number().over(wdesc))
        .filter((F.col("_rn") <= window) & (F.col("_b") < n_buckets - 1))
        .select((F.col("_b") + 1).alias("_b"), "id", "_k", "_c")
        .withColumn("_carry", F.lit(True))
    )
    allr = keyed.withColumn("_carry", F.lit(False)).unionByName(carries)

    wasc = Window.partitionBy("_b").orderBy("_k", "id")
    nbr = F.array(*[
        F.lead(
            F.struct(
                F.col("id").alias("oid"),
                F.col("_c").alias("ok"),
                F.col("_carry").alias("oc"),
            ),
            i,
        ).over(wasc)
        for i in range(1, window + 1)
    ])
    pairs = (
        allr.withColumn("_nbrs", nbr)
        .select("id", F.col("_c").alias("_k"), "_carry", F.explode("_nbrs").alias("_o"))
        .filter(F.col("_o").isNotNull())
        .filter(~(F.col("_carry") & F.col("_o.oc")))
    )
    # edit distance is the hot loop: a pair passes iff dist <= thr where
    # thr = floor(pct * max_len / 100). Two lossless prunes before the
    # O(n*m) work: (a) dist >= |len_a - len_b|, so a length gap beyond thr
    # skips the computation entirely; (b) the banded levenshtein (threshold
    # arg, O(thr * n) instead of O(n * m)) returns -1 past thr — and the
    # true distance at or under it, so kept rows are exact. Measured 25s ->
    # ~3s at sf0.1 (5k docs, 20k candidate pairs).
    ml = F.greatest(F.length("_k"), F.length(F.col("_o.ok"))).cast("int")
    thr = F.floor(ml * max_edit_pct / 100).cast("int")
    return (
        pairs.select(
            F.col("id").alias("id_a"),
            F.col("_o.oid").alias("id_b"),
            F.col("_k"),
            F.col("_o.ok").alias("_ok"),
            ml.alias("max_len"),
            thr.alias("_thr"),
        )
        .filter(F.abs(F.length("_k") - F.length("_ok")) <= F.col("_thr"))
        # per-pair Column threshold: the SQL function accepts it, the
        # PySpark wrapper insists on a literal int — go through expr
        .withColumn("edit_dist", F.expr("cast(levenshtein(_k, _ok, _thr) as int)"))
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "edit_dist", "max_len")
    )


def snm_pairs_multi(
    df: DataFrame,
    sort_cols: Sequence[str],
    compare_col: str = "text",
    id_col: str = "doc_id",
    window: int = 4,
    max_edit_pct: int = 20,
    prefix_len: int = 2,
) -> DataFrame:
    """Multi-pass sorted-neighborhood pairs — the standard merge/purge
    configuration (Hernandez & Stolfo SIGMOD'95 §3: "several independent
    runs ... each time using a different key"): one SNM pass per sort key,
    matching every pass on the same `compare_col`, pair sets unioned.

    A single sort key misses near-duplicates whose differences fall in the
    key's prefix (two records differing in the first word sort far apart);
    a second pass keyed on, e.g., the reversed text or a different field
    recovers them. Output schema matches snm_pairs, with pairs
    canonicalized to (least, greatest) id order so the same pair found by
    two passes dedups — edit_dist and max_len are orientation-invariant,
    so distinct() is exact, not heuristic.

    Scale: N independent passes of the single-pass plan (each fully
    parallel, no global sort), one distinct shuffle on the (small) pair
    set. Union-of-windows coverage is pinned against the naive
    sort-and-scan oracle in tests/test_spans.py.
    """
    if not sort_cols:
        raise ValueError("snm_pairs_multi needs at least one sort column")
    # each pass's construction runs its own census action(s) (collect);
    # the passes are independent pipelines, so build them in concurrent
    # driver threads — construct wall-clock is max(pass), not sum(pass)
    from concurrent.futures import ThreadPoolExecutor

    def build(sc):
        return snm_pairs(
            df, sort_col=sc, id_col=id_col, window=window,
            max_edit_pct=max_edit_pct, prefix_len=prefix_len,
            compare_col=compare_col,
        )

    with ThreadPoolExecutor(max_workers=len(sort_cols)) as ex:
        passes = list(ex.map(build, sort_cols))
    out = None
    for p in passes:
        canon = p.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "edit_dist",
            "max_len",
        )
        out = canon if out is None else out.unionByName(canon)
    return out.distinct()
