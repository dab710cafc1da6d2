"""Streaming set-similarity join vs a static corpus
(streaming/similarity_stream.py): bounded streaming == batch == an
independent brute-force cross-join."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.streaming.events_stream import run_to_completion
from data_diff_spark.streaming.similarity_stream import (
    corpus_index,
    streaming_neardup_vs_corpus,
)

N = 3
THRESHOLD = 0.5


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    # yield-and-unpersist so the cache can't leak into other tests' scans
    # of the same parquet path (CacheManager plan substitution)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def arriving(corpus):
    # arriving docs = a slice of the corpus with shifted ids (guaranteed
    # hits) plus their originals' neighbours
    df = corpus.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    ).persist()
    yield df
    df.unpersist()


def _brute(spark, arriving, corpus):
    from data_diff_spark.operators.dedup import shingle_sets

    a = shingle_sets(arriving, N).select(
        F.col("id").alias("doc_id"), F.col("shingles").alias("sa")
    )
    b = shingle_sets(corpus, N).select(
        F.col("id").alias("ref_id"), F.col("shingles").alias("sb")
    )
    j = a.crossJoin(b).withColumn(
        "inter", F.size(F.array_intersect("sa", "sb"))
    ).filter(F.col("inter") > 0)
    return (
        j.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sa") + F.size("sb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= THRESHOLD)
        .select("doc_id", "ref_id", "jaccard")
    )


def test_stream_equals_batch_equals_bruteforce(spark, corpus, arriving, tmp_path):
    # viral pruning off for the brute-force comparison (exact space)
    index, viral = corpus_index(corpus, n=N, max_shingle_freq=None)
    assert viral == []

    batch = streaming_neardup_vs_corpus(arriving, index, viral, n=N, threshold=THRESHOLD)

    src = str(tmp_path / "arrivals")
    arriving.repartition(2).write.parquet(src)  # >=2 files -> >=2 triggers
    stream = (
        spark.readStream.schema(arriving.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    streamed = run_to_completion(
        streaming_neardup_vs_corpus(stream, index, viral, n=N, threshold=THRESHOLD),
        mode="complete",
    )

    want = sorted(map(tuple, _brute(spark, arriving, corpus).collect()))
    assert sorted(map(tuple, batch.collect())) == want
    assert sorted(map(tuple, streamed.collect())) == want
    # every arriving doc finds its shifted original at jaccard 1.0
    exact = [t for t in want if t[2] == 1.0 and t[0] - 1_000_000 == t[1]]
    assert len(exact) == arriving.count()
    index.unpersist()


def test_viral_pruning_consistent_both_sides(spark):
    # 4 docs share a viral shingle; similarity over the PRUNED space is
    # still exact and symmetric between index and arrivals
    rows = [(i, f"common common common unique{i} tail{i} end{i}") for i in range(4)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    index, viral = corpus_index(corpus, n=2, max_shingle_freq=2)
    assert len(viral) > 0
    arriving = corpus.select((F.col("doc_id") + 100).alias("doc_id"), "text")
    out = streaming_neardup_vs_corpus(arriving, index, viral, n=2, threshold=0.99)
    got = {(r["doc_id"], r["ref_id"]) for r in out.collect()}
    # each arrival matches ONLY its own original (shared viral shingles
    # pruned identically on both sides -> unique shingles dominate)
    assert got == {(i + 100, i) for i in range(4)}
    index.unpersist()
