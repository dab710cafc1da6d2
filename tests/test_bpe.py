"""Distributed BPE induction vs an independent pure-Python reference
(functions/bpe.py) — identical merge sequences, deterministic tiebreaks,
and on the driver's documents corpus."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.functions.bpe import reference_bpe, train_bpe, word_counts


def test_bpe_matches_reference_handcrafted(spark):
    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest wide wide wide",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe(df, n_merges=12)
    want = reference_bpe(texts, 12)
    assert got == want
    assert len(got) == 12
    # multi-character merges appear (merged symbols keep merging)
    assert any(len(a) > 1 or len(b) > 1 for a, b in got)


def test_bpe_exhausts_gracefully(spark):
    df = spark.createDataFrame([("ab ab",)], "text string")
    got = train_bpe(df, n_merges=50)
    # 'a'+'b' -> 'ab', 'ab'+'</w>' -> word fully merged, then nothing at
    # size>=2... final single-symbol words stop producing pairs
    assert got == reference_bpe(["ab ab"], 50)
    assert len(got) < 50


def test_bpe_on_documents_corpus(spark, sf_dir):
    """sf0.001 documents: the distributed merge sequence equals the
    reference implementation run on the same collected texts."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = train_bpe(docs, text_col="text", n_merges=8)
    want = reference_bpe(texts, 8)
    assert got == want


def test_word_counts_weighting(spark):
    df = spark.createDataFrame([("a a b",), ("A  b",)], "text string")
    wc = {r["word"]: r["n"] for r in word_counts(df).collect()}
    assert wc == {"a": 3, "b": 2}  # lowercased, multi-space tolerated
