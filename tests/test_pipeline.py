"""clean_corpus (pipeline.py): the full cleaning chain composes the
individually-verified operators with the documented semantics."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.pipeline import clean_corpus


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").persist()


def test_full_chain_on_corpus(spark, docs):
    bench = docs.filter("doc_id % 97 = 0")
    cleaned, counts = clean_corpus(
        docs,
        min_tokens=5,
        near_dup_threshold=0.8,
        strip_spans_k=8,
        benchmark=bench,
        redact=True,
    )
    n = cleaned.count()
    order = list(counts)
    assert order[0] == "input"
    assert counts["input"] == docs.count()
    # survivors never grow stage-to-stage (strip/redact rewrite in place)
    prev = counts["input"]
    for stage in order[1:]:
        assert counts[stage] <= prev, (stage, counts)
        prev = counts[stage]
    assert n == prev
    assert 0 < n < counts["input"]
    # near-dup stage actually removed the known duplicate clusters
    assert counts["near_dup_resolve"] < counts["exact_dedup"]
    # schema preserved
    assert cleaned.columns == docs.columns


def test_decontaminate_drops_benchmark_docs(spark, docs):
    bench = docs.filter("doc_id % 97 = 0")
    cleaned, counts = clean_corpus(
        docs,
        near_dup_threshold=None,
        benchmark=bench,
        redact=False,
    )
    # every surviving doc shares no 5-gram with the benchmark: the
    # benchmark docs themselves (which trivially self-overlap) are gone
    # unless they were already dropped by earlier stages
    survivors = {r.doc_id for r in cleaned.select("doc_id").collect()}
    bench_ids = {r.doc_id for r in bench.select("doc_id").collect()}
    assert not (survivors & bench_ids)


def test_perplexity_stage(spark, docs):
    from data_diff_spark.functions.lm import score_documents, train_ngram_lm

    model, total = train_ngram_lm(docs, n=2)
    cut = score_documents(docs, model, total, n=2).agg(
        F.expr("percentile_approx(perplexity, 0.7)")
    ).collect()[0][0]
    cleaned, counts = clean_corpus(
        docs,
        near_dup_threshold=None,
        redact=False,
        lm_model=(model, total),
        max_perplexity=float(cut),
    )
    assert counts["perplexity_filter"] < counts["exact_dedup"]
    assert cleaned.count() == counts["perplexity_filter"]


def test_audit_off_returns_empty_counts(spark, docs):
    cleaned, counts = clean_corpus(
        docs.limit(50), near_dup_threshold=None, redact=False, audit=False
    )
    assert counts == {}
    assert cleaned.count() > 0
