"""Distributed BPE vocabulary induction (first-N merges) over a corpus.

Training a byte-pair-encoding vocabulary is the canonical corpus-level
preprocessing job an LLM data pipeline runs after cleaning/dedup. The
classic algorithm (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units") is inherently iterative — count adjacent
symbol pairs, merge the most frequent, repeat — so the Spark expression
is a driver loop of fully-distributed rounds:

    round:  explode adjacent pairs of every word's symbol array
            -> map-side-combined groupBy count
            -> ONE driver row: the argmax pair (deterministic tiebreak:
               count desc, then pair lexicographic)
            -> apply the merge to every word with a codegen'd
               aggregate() fold (no UDF)

Per round: one shuffle of (pair, partial count) rows + one map-only
transform. N merges = N rounds; production vocabularies (30-50k merges)
train on a SAMPLE (the standard practice — tokenizer quality saturates
far below full-corpus counts), so pass `sample_fraction` and keep the
looped rounds over a frame that fits the cluster's scratch comfortably.
`word_counts` pre-aggregation means rounds run over DISTINCT words
weighted by count — corpus size only affects the one-time aggregation.

Determinism: counts are exact integers, the tiebreak is total, so the
merge sequence is reproducible anywhere — the test pins the distributed
result against an independent pure-Python reference implementation.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_diff_spark.planutil import explode_nonnull, posexplode_nonnull

END = "</w>"  # end-of-word marker (Sennrich-style)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over whitespace-split lowercased text — the weighted
    distinct-word frame every BPE round runs over."""
    return (
        explode_nonnull(df, [], F.split(F.lower(F.col(text_col)), r"\s+"), "word")
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .withColumnRenamed("count", "n")
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word -> array of single-character symbols + end-of-word marker."""
    return words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("syms"),
        "n",
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word count: explode
    zip(syms, syms[1:]) — arrays_zip + slice, no UDF."""
    staged = (
        syms.filter(F.size("syms") >= 2)
        .select(
            F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("l"),
            F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("r"),
            "n",
        )
    )
    return (
        explode_nonnull(staged, ["n"], F.arrays_zip("l", "r"), "p")
        .select(F.col("p.l").alias("a"), F.col("p.r").alias("b"), "n")
        .groupBy("a", "b")
        .agg(F.sum("n").alias("cnt"))
    )


def _apply_merge(syms: DataFrame, a: str, b: str) -> DataFrame:
    """Replace every adjacent (a, b) with a+b in one codegen'd fold:
    left-to-right, non-overlapping (matching the reference algorithm —
    after merging positions (i, i+1), position i+1 cannot start a merge)."""
    la, lb = F.lit(a), F.lit(b)
    merged = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb)
            # guard: the trailing `a` must not itself be the product of a
            # merge this round — impossible here because a+b != a (b
            # non-empty), so element_at(acc,-1)==a means it was a raw copy
            ,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(la, lb))),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return syms.select(merged.alias("syms"), "n")


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    sample_fraction: Optional[float] = None,
    seed: int = 7,
) -> List[Tuple[str, str]]:
    """Learn the first `n_merges` BPE merge rules from a corpus; returns
    them in order. Each round is one distributed pair-count + one map-only
    merge application; the per-round driver transfer is ONE row."""
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    syms = _initial_symbols(word_counts(df, text_col)).persist()
    prev = None
    merges: List[Tuple[str, str]] = []
    try:
        for i in range(n_merges):
            # this collect computes the pair counts over `syms` in full,
            # which populates syms' cache as a side effect — so the parent
            # frame can be dropped right after it, with no separate
            # materializing count() action per round (the r7 shape paid
            # one extra job per merge)
            top = (
                _pair_counts(syms)
                .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .collect()
            )
            if prev is not None:
                prev.unpersist()
                prev = None
            if not top:
                break
            a, b = top[0]["a"], top[0]["b"]
            merges.append((a, b))
            if i < n_merges - 1:  # the post-final-merge state is never read
                nxt = _apply_merge(syms, a, b).persist()
                prev, syms = syms, nxt
        return merges
    finally:
        syms.unpersist()
        if prev is not None:
            prev.unpersist()


def reference_bpe(texts: List[str], n_merges: int) -> List[Tuple[str, str]]:
    """Independent pure-Python implementation (Sennrich alg. 1) used as
    the test oracle — same tiebreak, same non-overlapping merge rule."""
    from collections import Counter

    words: Counter = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + [END]): n for w, n in words.items()}
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        out = {}
        for syms, n in vocab.items():
            new = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            out[tuple(new)] = out.get(tuple(new), 0) + n
        vocab = out
    return merges


# --- applying a trained vocabulary (corpus tokenization) --------------------


def bpe_encode_words(
    words: DataFrame,
    merges: List[Tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Add `bpe` (array<string>) — each word segmented with the trained
    merge table by the standard greedy rule (subword-nmt / GPT-2 style):
    repeatedly merge the LOWEST-RANK adjacent pair present, rescan. (This
    is not the same as replaying merges in rank order once: a later merge
    can create an earlier merge's pair, and the greedy rule — the one
    every production tokenizer implements — catches it.)

    The data-dependent merge loop is genuine control flow Catalyst cannot
    express, so this is one of the repo's few Pandas UDFs: Arrow-batched,
    merge table broadcast once per executor via closure capture, LRU memo
    per batch (natural-language corpora repeat words heavily even within
    the distinct-word frame's batches... the memo is for the callers that
    skip deduplication)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def enc(col: pd.Series) -> pd.Series:
        memo = {}

        def one(w):
            if w is None:
                return None
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w) + [END]
            while len(syms) > 1:
                best_rank, best_pair = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, (syms[i], syms[i + 1])
                if best_pair is None:
                    break
                a, b = best_pair
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[w] = syms
            return syms

        return col.map(one)

    return words.withColumn("bpe", enc(F.col(word_col)))


def bpe_tokenize(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus with a trained merge table: adds `bpe_tokens`
    (array<string>, word order preserved) and `bpe_len`.

    Scale shape: the expensive per-word merge loop runs ONCE PER DISTINCT
    WORD (the corpus vocabulary, millions at 100 TB, not trillions of
    running words), then a shuffle join on the word string carries the
    segmentations back to (doc, position) and a sort-regroup reassembles
    documents. Zipf makes the dedup the whole ballgame: the UDF touches
    |vocab| rows however large the corpus."""
    words_pos = posexplode_nonnull(
        df,
        [F.col(id_col)],
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""),
        "pos", "word",
    )
    vocab = bpe_encode_words(words_pos.select("word").distinct(), merges)
    joined = words_pos.join(vocab, "word")
    per_doc = (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "bpe"))),
                    lambda x: x["bpe"],
                )
            ).alias("bpe_tokens")
        )
        .withColumn("bpe_len", F.size("bpe_tokens"))
    )
    return df.join(per_doc, id_col, "left").withColumn(
        "bpe_tokens",
        F.coalesce(F.col("bpe_tokens"), F.array().cast("array<string>")),
    ).withColumn("bpe_len", F.coalesce(F.col("bpe_len"), F.lit(0)))
