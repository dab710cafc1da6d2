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


def _greedy_reference(word, merges):
    """Independent greedy apply (subword-nmt rule): merge the lowest-rank
    adjacent pair present, rescan until none applies."""
    from data_diff_spark.functions.bpe import END

    ranks = {m: i for i, m in enumerate(merges)}
    syms = list(word) + [END]
    while len(syms) > 1:
        cands = [(ranks[(syms[i], syms[i + 1])], (syms[i], syms[i + 1]))
                 for i in range(len(syms) - 1)
                 if (syms[i], syms[i + 1]) in ranks]
        if not cands:
            break
        a, b = min(cands)[1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b); i += 2
            else:
                out.append(syms[i]); i += 1
        syms = out
    return syms


def test_bpe_encode_matches_greedy_reference(spark, sf_dir):
    from data_diff_spark.functions.bpe import bpe_encode_words, train_bpe, word_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=12)
    words = word_counts(docs).select("word")
    got = {r.word: list(r.bpe) for r in bpe_encode_words(words, merges).collect()}
    assert len(got) > 10
    for w, toks in got.items():
        assert toks == _greedy_reference(w, merges), w


def test_bpe_encode_roundtrip_lossless(spark, sf_dir):
    """Concatenating a word's tokens (modulo the end marker) recovers the
    word exactly — segmentation never loses characters."""
    from data_diff_spark.functions.bpe import END, bpe_encode_words, train_bpe, word_counts

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = train_bpe(docs, n_merges=6)
    for r in bpe_encode_words(word_counts(docs).select("word"), merges).collect():
        assert "".join(r.bpe).removesuffix(END) == r.word


def test_bpe_tokenize_preserves_word_order(spark):
    from data_diff_spark.functions.bpe import END, bpe_tokenize

    df = spark.createDataFrame(
        [(1, "low lower lowest"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    merges = [("l", "o"), ("lo", "w"), ("low", END)]
    out = {r.doc_id: (list(r.bpe_tokens), r.bpe_len)
           for r in bpe_tokenize(df, merges).collect()}
    toks, n = out[1]
    assert toks[0] == "low</w>"                  # 'low' fully merged with END
    assert n == len(toks)
    # word order: 'low' tokens strictly before 'lower' before 'lowest'
    joined = "".join(toks)
    assert joined == f"low{END}lower{END}lowest{END}".replace(f"low{END}lower", f"low{END}lower")
    assert joined == "low</w>lower</w>lowest</w>"
    assert out[2] == ([], 0) and out[3] == ([], 0)


def test_bpe_tokenize_dedups_the_udf_work(spark):
    """The merge loop runs once per DISTINCT word: the plan applies the
    UDF above a Distinct/Aggregate, never over the exploded corpus."""
    from data_diff_spark.functions.bpe import bpe_tokenize

    df = spark.createDataFrame([(1, "x y x y x y")], "doc_id long, text string")
    plan = bpe_tokenize(df, [("x", "</w>")])._jdf.queryExecution().optimizedPlan().toString()
    import re
    assert re.search(r"(?i)(deduplicate|aggregate)", plan)


def test_clean_docs_oracle_bpe_fold_matches_train_bpe(spark):
    """Regression for the clean_docs oracle's merge replay: a single SQL
    replace() is NOT _apply_merge's fold when adjacent occurrences share
    the boundary space (' b a n a n a ' + (a,n) merges only the first
    under replace). The oracle now folds with list_reduce; this corpus
    makes (a,a) the first merge over odd runs of 'a', where the replayed
    merge sequence diverges from train_bpe by round 2 under replace()."""
    import duckdb

    from data_diff_spark.functions.bpe import bpe_tokenize
    from data_diff_spark.workload import _clean_bpe_ctes

    texts = {0: "aaaa aaaa aaaa banana banana",
             20: "banana bananas cabana",
             40: "aa aaa aaaa aaaaa"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    merges = train_bpe(df, n_merges=6)

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from (values "
        + ", ".join(f"({k}, '{v}')" for k, v in texts.items())
        + ") t(doc_id, text)")
    rows = con.execute(
        "with " + _clean_bpe_ctes()
        + " " + " union all ".join(
            f"select {t} as rnd, a, b from bm{t}" for t in range(1, 7))
        + " order by rnd").fetchall()
    assert [(a, b) for _, a, b in rows] == merges

    # blen replay (the gv fold path): all three doc_ids are %20 == 0
    blen = dict(con.execute(
        "with " + _clean_bpe_ctes()
        + " select doc_id, bpe_len from blen order by doc_id").fetchall())
    got = {r.doc_id: r.bpe_len for r in bpe_tokenize(df, merges).collect()}
    assert blen == got
