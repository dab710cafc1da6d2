"""Count-based n-gram language model: training + perplexity filtering.

The CCNet recipe (public: Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data") scores every document
with a language model and keeps the low-perplexity tail — the single
most load-bearing quality filter in web-corpus pipelines after dedup.
At corpus scale the model of choice is Stupid Backoff (Brants et al.
2007, "Large Language Models in Machine Translation"): relative
frequencies with a fixed backoff multiplier, no discounting — designed
exactly so the model is a bag of counts that distributed joins can
serve, with no smoothing pass that needs global coordination.

    S(w | w_{i-n+1..i-1}) =
        count(ngram) / count(prefix)        if count(ngram) > 0
        alpha * S(w | shorter context)      otherwise  (alpha = 0.4)
    unigram base case: count(w) / N   (OOV -> floor 1/N)

Spark-first shape:

  train_ngram_lm     one pass: explode 1..n-grams with map-side-combined
                     counts -> ONE long (order, gram, count) frame. The
                     model IS a DataFrame; persist/parquet it like data.
  score_documents    joins each document's n-gram stream against the
                     model at every order (explicitly broadcast when the
                     model fits LM_BROADCAST_MAX_ROWS, shuffled
                     otherwise), resolves the backoff chain with
                     coalesce() in codegen, and aggregates per-doc
                     log-prob / perplexity.
  perplexity_filter  keep docs under a perplexity ceiling.

Scoring never leaves the JVM: the backoff chain is a coalesce over the
joined count columns — no UDF, no model object on the driver. Parity is
pinned against an independent pure-Python implementation in
tests/test_lm.py (log-domain doubles; same IEEE ops in both).
"""

from __future__ import annotations

import math
from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_diff_spark.functions.text import tokens
from data_diff_spark.planutil import (
    explode_nonnull,
    posexplode_nonnull,
    project_barrier,
)

ALPHA = 0.4  # Brants et al.'s backoff multiplier
BOS = "<s>"

# Broadcast the model side of every scoring join when the full 1..n-gram
# frame is at most this many rows. A gram row is ~60 B in executor memory
# (short gram string + order + count), so the bound caps the broadcast at
# ~60 MB — inside Spark's comfortable envelope, far under the 8 GB hard
# limit, and small enough that 1000 executors holding a copy is cheaper
# than 2n-1 shuffles of the corpus' gram stream. Above the bound the
# joins stay shuffled (a web-scale unpruned model can exceed any single
# executor); AQE may still locally convert. Measured: the sf1.0 clean_docs
# scoring stage is join-bound without this (SURVEY 6.8 — 16 exchanges,
# 4 SMJ; 3.5x wall for 10x data), and the count-floor-pruned models real
# pipelines score with sit orders of magnitude under the bound.
LM_BROADCAST_MAX_ROWS = 1_000_000


def _doc_ngrams(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, g1..gn): for every token position, the token plus its
    n-1 predecessors (BOS-padded), i.e. all the context slices scoring
    needs, in one explode.

    Shape (two measured rules, sf1.0 numbers):
      - the BOS-padded token ARRAY is staged in its own projection —
        a tokenize captured inside any downstream lambda re-evaluates
        per position, a doc-length-QUADRATIC regex pass (28x here);
      - the per-position slices come from arrays_zip over n shifted
        slice() views of that attribute — all codegen'd built-ins.
        The previous transform(idx, i -> slice(...)) + posexplode +
        element_at chain ran the higher-order lambda INTERPRETED and
        generated over array-of-arrays: 5.5s vs 0.8s for the zip shape
        on the same 2.7M-position corpus."""
    t = F.concat(F.array(*[F.lit(BOS)] * (n - 1)), tokens(F.col(text_col)))
    padded = project_barrier(
        df.select(F.col(id_col).alias("id"), t.alias("_t"))
    )
    ta = F.col("_t")
    # number of scored positions; an empty/short doc (padded size < n)
    # must short-circuit to [] — slice() rejects non-positive lengths
    L = F.size(ta) - (n - 1)
    struct_t = f"array<struct<{','.join(f'g{j + 1}:string' for j in range(n))}>>"
    zipped = F.when(
        F.size(ta) >= n,
        F.arrays_zip(*[F.slice(ta, j + 1, L).alias(f"g{j + 1}") for j in range(n)]),
    ).otherwise(F.array().cast(struct_t))
    # posexplode_nonnull: a plain Generate's inferred filters would
    # inline the whole tokenize+zip pipeline into a per-row Filter and
    # evaluate it twice (see planutil.explode_nonnull). Shape pinned in
    # tests/test_plans.py::test_lm_ngram_slices_stay_staged.
    staged = padded.select("id", zipped.alias("_z"))
    return (
        posexplode_nonnull(staged, ["id"], F.col("_z"), "pos", "_g")
        .select(
            "id", "pos",
            *[F.col(f"_g.g{j + 1}").alias(f"g{j + 1}") for j in range(n)],
        )
    )


def train_ngram_lm(
    df: DataFrame, n: int = 3, text_col: str = "text"
) -> Tuple[DataFrame, int]:
    """All 1..n-gram counts in one long frame (order, gram, cnt) plus the
    total token count N. One tokenize pass; each order is a map-side-
    combined count over space-joined grams (the gram string is the join
    key scoring uses)."""
    t = tokens(F.col(text_col))
    toks = df.select(t.alias("_toks")).persist()
    try:
        total = toks.select(
            F.sum(F.size("_toks")).alias("n")
        ).collect()[0]["n"] or 0
        parts = []
        for k in range(1, n + 1):
            # stage the BOS-padded array as its own projection before the
            # gram transform: a concat captured inside the lambda copies
            # the whole token array once PER POSITION (doc-length-
            # quadratic); a staged attribute is a row-buffer read
            if k > 1:
                src = project_barrier(toks.select(
                    F.concat(F.array(*[F.lit(BOS)] * (k - 1)),
                             F.col("_toks")).alias("_p")))
                padded = F.col("_p")
            else:
                src, padded = toks, F.col("_toks")
            # sequence(a, b) DESCENDS when a > b, so an empty/short doc
            # (padded size < k) must short-circuit to [] — same guard as
            # _doc_ngrams; without it slice() gets start 0 and raises
            idx = F.when(
                F.size(padded) >= k,
                F.sequence(F.lit(1), F.size(padded) - (k - 1)),
            ).otherwise(F.array().cast("array<int>"))
            grams = F.transform(
                idx, lambda i: F.concat_ws(" ", F.slice(padded, i, k))
            )
            parts.append(
                explode_nonnull(src, [], grams, "gram")
                .groupBy("gram")
                .count()
                .select(F.lit(k).alias("order"), "gram", F.col("count").alias("cnt"))
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out = out.persist()
        rows = out.count()  # materialize before the source cache drops
        # action-free sizing hint for score_documents' broadcast rule —
        # rides the materializing count this function already pays
        out._dds_model_rows = rows
        return out, int(total)
    finally:
        toks.unpersist()


def score_documents(
    df: DataFrame,
    model: DataFrame,
    total_tokens: int,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = ALPHA,
    model_rows: int | None = None,
) -> DataFrame:
    """Per-document Stupid Backoff log10-prob and perplexity:
    (id_col, n_scored, logprob, perplexity). Every scored position joins
    the model once per order (left joins on the gram string); the backoff
    chain is a single coalesce over the joined ratios — pure codegen.

    The model side of each join is broadcast when the full model frame
    holds at most LM_BROADCAST_MAX_ROWS rows (the common case: a
    count-floor-pruned model), turning all 2n-1 joins map-side — the
    corpus' gram stream, the scale axis, never shuffles. `model_rows`
    is the action-free size hint; defaults to the count train_ngram_lm
    stamped on the frame, else unknown -> shuffled joins (safe for
    models that exceed executor memory)."""
    g = _doc_ngrams(df, n, text_col, id_col)
    if model_rows is None:
        model_rows = getattr(model, "_dds_model_rows", None)
    small = model_rows is not None and model_rows <= LM_BROADCAST_MAX_ROWS

    def side(mdl: DataFrame) -> DataFrame:
        return F.broadcast(mdl) if small else mdl

    m = model
    joined = g
    for k in range(n, 0, -1):
        gram_k = F.concat_ws(" ", *[F.col(f"g{j}") for j in range(n - k + 1, n + 1)])
        mk = m.filter(F.col("order") == k).select(
            F.col("gram").alias(f"_g{k}"), F.col("cnt").alias(f"_c{k}")
        )
        joined = joined.join(
            side(mk), F.col(f"_g{k}") == gram_k, "left"
        ).drop(f"_g{k}")
        if k > 1:
            prefix_k = F.concat_ws(
                " ", *[F.col(f"g{j}") for j in range(n - k + 1, n)]
            )
            pk = m.filter(F.col("order") == k - 1).select(
                F.col("gram").alias(f"_p{k}"), F.col("cnt").alias(f"_d{k}")
            )
            joined = joined.join(
                side(pk), F.col(f"_p{k}") == prefix_k, "left"
            ).drop(f"_p{k}")
    # backoff chain: highest order whose count exists wins, each level
    # down multiplies by alpha; unigram base count(w)/N, OOV floor 1/N
    chain = []
    for k in range(n, 1, -1):
        ratio = F.col(f"_c{k}").cast("double") / F.col(f"_d{k}").cast("double")
        chain.append(
            F.when(
                F.col(f"_c{k}").isNotNull() & F.col(f"_d{k}").isNotNull(),
                F.lit(alpha ** (n - k)) * ratio,
            )
        )
    uni = (
        F.coalesce(F.col("_c1").cast("double"), F.lit(1.0))
        / F.lit(float(total_tokens))
    )
    chain.append(F.lit(alpha ** (n - 1)) * uni)
    score = F.coalesce(*chain)
    return (
        joined.withColumn("_s", F.log10(score))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum("_s").alias("logprob"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_scored",
            "logprob",
            F.pow(F.lit(10.0), -F.col("logprob") / F.col("n_scored")).alias(
                "perplexity"
            ),
        )
    )


def perplexity_filter(
    df: DataFrame,
    model: DataFrame,
    total_tokens: int,
    max_perplexity: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_rows: int | None = None,
) -> DataFrame:
    """CCNet-style keep/drop: documents scoring under the perplexity
    ceiling survive (empty docs drop — they carry no evidence)."""
    scores = score_documents(df, model, total_tokens, n, text_col, id_col,
                             model_rows=model_rows)
    keep = scores.filter(
        (F.col("perplexity") <= max_perplexity) & (F.col("n_scored") > 0)
    ).select(id_col)
    return df.join(keep, id_col, "left_semi")


def reference_stupid_backoff(
    texts: List[str], queries: List[str], n: int = 3, alpha: float = ALPHA
) -> List[Tuple[int, float]]:
    """Independent pure-Python Stupid Backoff (training + scoring) used
    as the test oracle: returns (n_scored, log10prob) per query doc."""
    from collections import Counter

    def toks(s):
        return [w for w in s.split() if w]

    counts: Counter = Counter()
    total = 0
    for t in texts:
        ws = toks(t)
        total += len(ws)
        for k in range(1, n + 1):
            padded = [BOS] * (k - 1) + ws
            for i in range(len(padded) - k + 1):
                counts[" ".join(padded[i:i + k])] += 1
    out = []
    for q in queries:
        ws = [BOS] * (n - 1) + toks(q)
        lp, m = 0.0, 0
        for i in range(n - 1, len(ws)):
            m += 1
            s = None
            for k in range(n, 1, -1):
                gram = " ".join(ws[i - k + 1:i + 1])
                prefix = " ".join(ws[i - k + 1:i])
                if counts.get(gram) and counts.get(prefix):
                    s = (alpha ** (n - k)) * counts[gram] / counts[prefix]
                    break
            if s is None:
                c1 = counts.get(ws[i], None)
                base = (c1 if c1 is not None else 1.0) / float(total)
                s = (alpha ** (n - 1)) * base
            lp += math.log10(s)
        out.append((m, lp))
    return out
