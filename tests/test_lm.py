"""Stupid-Backoff n-gram LM (functions/lm.py) vs an independent
pure-Python implementation, plus filter semantics."""

import math

import pytest
from pyspark.sql import functions as F

from data_diff_spark.functions.lm import (
    perplexity_filter,
    reference_stupid_backoff,
    score_documents,
    train_ngram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").persist()


@pytest.fixture(scope="module")
def model(corpus):
    m, total = train_ngram_lm(corpus, n=3)
    return m, total


def test_counts_are_exact(spark, model, corpus):
    m, total = model
    texts = [r.text for r in corpus.select("text").collect()]
    want_total = sum(len([w for w in t.split() if w]) for t in texts)
    assert total == want_total
    got_uni = {
        r.gram: r.cnt for r in m.filter("order = 1").collect()
    }
    from collections import Counter
    want_uni = Counter(w for t in texts for w in t.split() if w)
    assert got_uni == dict(want_uni)


def test_train_tolerates_empty_and_short_docs(spark):
    """Empty / whitespace-only / shorter-than-n docs must not crash
    training (sequence(1, 0) DESCENDS in Spark; r4 advice, medium) and
    must contribute exactly their real grams."""
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("a b c d",)], "text string"
    )
    m, total = train_ngram_lm(df, n=3)
    assert total == 5  # "one" + 4 words
    uni = {r.gram: r.cnt for r in m.filter("order = 1").collect()}
    assert uni == {"one": 1, "a": 1, "b": 1, "c": 1, "d": 1}
    tri = {r.gram: r.cnt for r in m.filter("order = 3").collect()}
    # BOS-padded trigrams: every doc with >=1 token yields size tokens
    assert sum(tri.values()) == 5
    m.unpersist()


def test_scores_match_reference(spark, model, corpus):
    m, total = model
    texts = [r.text for r in corpus.select("text").collect()]
    sample = corpus.limit(40)
    got = {
        r.doc_id: (r.n_scored, r.logprob)
        for r in score_documents(sample, m, total, n=3).collect()
    }
    ids = [r.doc_id for r in sample.select("doc_id").collect()]
    queries = [r.text for r in sample.select("text").collect()]
    want = reference_stupid_backoff(texts, queries, n=3)
    assert set(got) == set(ids)
    for i, (wm, wlp) in zip(ids, want):
        gm, glp = got[i]
        assert gm == wm
        # log10/division run on different libms: 1-ulp class agreement
        assert glp == pytest.approx(wlp, rel=1e-12), i


def test_in_corpus_docs_score_better_than_scrambled(spark, model, corpus):
    """A document drawn from the corpus must have lower perplexity than
    the same tokens in scrambled order — the property the filter rides."""
    m, total = model
    real = corpus.limit(20)
    scrambled = real.select(
        "doc_id",
        F.concat_ws(" ", F.shuffle(F.split(F.col("text"), r"\s+"))).alias("text"),
    )
    pr = {r.doc_id: r.perplexity for r in score_documents(real, m, total).collect()}
    ps = {r.doc_id: r.perplexity
          for r in score_documents(scrambled, m, total).collect()}
    better = sum(1 for k in pr if pr[k] < ps[k])
    assert better >= int(0.9 * len(pr))


def test_oov_floor_and_empty_docs(spark, model):
    m, total = model
    df = spark.createDataFrame(
        [(1, "zzzqqq wwwvvv"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in score_documents(df, m, total).collect()}
    # fully-OOV doc: every token scores alpha^2 / N exactly
    r = out[1]
    assert r.n_scored == 2
    want = 2 * math.log10(0.4 ** 2 / total)
    assert r.logprob == pytest.approx(want, rel=1e-12)
    assert 2 not in out and 3 not in out  # no tokens -> no score row


def test_perplexity_filter_keeps_low_tail(spark, model, corpus):
    m, total = model
    scores = score_documents(corpus, m, total)
    cut = scores.agg(
        F.expr("percentile_approx(perplexity, 0.5)").alias("p")
    ).collect()[0]["p"]
    kept = perplexity_filter(corpus, m, total, max_perplexity=cut)
    n_kept = kept.count()
    assert 0 < n_kept < corpus.count()
    # every kept doc is under the ceiling
    joined = kept.join(scores, "doc_id").filter(F.col("perplexity") > cut)
    assert joined.count() == 0


def test_scoring_joins_broadcast_when_model_small(spark, model, corpus):
    """The size rule: a model under LM_BROADCAST_MAX_ROWS turns all 2n-1
    scoring joins into BroadcastHashJoin (the corpus gram stream never
    shuffles); a model the hint declares too big keeps shuffled joins.
    Auto-broadcast is disabled for the check so only the explicit hint
    can broadcast — the scenario that matters at scale, where the
    model's stats exceed autoBroadcastJoinThreshold and the rule is the
    only thing keeping the gram stream map-side. train_ngram_lm stamps
    the hint on the frame, so the default path broadcasts with no extra
    action."""
    m, total = model
    assert isinstance(getattr(m, "_dds_model_rows", None), int)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan_small = score_documents(
            corpus, m, total
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_small
        assert "SortMergeJoin" not in plan_small

        plan_big = score_documents(
            corpus, m, total, model_rows=10**9
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_big
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_scores_unchanged_by_broadcast_rule(spark, model, corpus):
    """Broadcast is a physical hint only: identical (n_scored, logprob)
    either way."""
    m, total = model
    a = {r.doc_id: (r.n_scored, r.logprob)
         for r in score_documents(corpus, m, total).collect()}
    b = {r.doc_id: (r.n_scored, r.logprob)
         for r in score_documents(corpus, m, total, model_rows=10**9).collect()}
    assert a == b
