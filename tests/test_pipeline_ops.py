"""Round-3 training-pipeline operators: decontamination, sequence packing,
PII redaction."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.functions.packing import PACKS_PER_SHARD, pack_sequences
from data_diff_spark.functions.text import redact_pii
from data_diff_spark.operators.dedup import decontaminate


# --- decontaminate ----------------------------------------------------------


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "an entirely different document about spark execution plans"),
        (3, "xx quick brown fox jumps over the lazy yy zz"),  # shares a 5-gram with 1
        (4, "short doc"),  # < n tokens: can never be contaminated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_overlapping_docs(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 1)
    out = {r["doc_id"]: r.asDict() for r in decontaminate(corpus, bench, n=5).collect()}
    # doc 1 matches itself fully; doc 3 shares "quick brown fox jumps over"
    # and the following shifted grams; docs 2 and 4 are clean
    assert set(out) == {1, 3}
    assert out[1]["n_hits"] == out[1]["n_grams"]
    assert 0 < out[3]["n_hits"] < out[3]["n_grams"]
    assert out[3]["n_bench_docs"] == 1


def test_decontaminate_broadcast_equals_shuffle(spark, corpus):
    bench = corpus.filter(F.col("doc_id") == 1)
    a = sorted(map(tuple, decontaminate(corpus, bench, broadcast_benchmark=True).collect()))
    b = sorted(map(tuple, decontaminate(corpus, bench, broadcast_benchmark=False).collect()))
    assert a == b


def test_decontaminate_broadcasts_benchmark_side(spark, corpus):
    from tests.test_plans import plan_of

    bench = corpus.filter(F.col("doc_id") == 1)
    plan = plan_of(decontaminate(corpus, bench))
    assert "BroadcastHashJoin" in plan


# --- pack_sequences ---------------------------------------------------------


def test_pack_sequences_chunk_semantics(spark):
    # one shard so the stream order is just ascending doc_id
    rows = [(i, "w " * 10) for i in range(100)]  # 10 tokens each
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(docs, budget=64, n_shards=1).orderBy("doc_id").collect()
    # stream of 10-token docs chunked at 64: doc k starts at 10k
    for r in out:
        assert r["shard"] == 0
        assert r["pack_id"] == (10 * r["doc_id"]) // 64
        assert r["pack_offset"] == (10 * r["doc_id"]) % 64
        assert 0 <= r["pack_offset"] < 64


def test_pack_sequences_stable_under_repartition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = sorted(map(tuple, pack_sequences(docs, budget=512, n_shards=8).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(17), budget=512, n_shards=8).collect())
    )
    assert a == b


def test_pack_sequences_precomputed_tokens_and_validation(spark):
    docs = spark.createDataFrame([(1, 5), (2, 700)], "doc_id long, ntok long")
    out = {
        r["doc_id"]: r
        for r in pack_sequences(
            docs, budget=512, tokens_col="ntok", n_shards=1
        ).collect()
    }
    assert out[1]["n_tokens"] == 5 and out[1]["pack_id"] == 0
    # doc 2 starts at offset 5 in pack 0 and straddles into pack 1
    assert out[2]["pack_offset"] == 5 and out[2]["pack_id"] == 0
    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_pack_sequences_global_id_disjoint_across_shards(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_sequences(docs, budget=512, n_shards=8)
    bad = out.filter(
        (F.col("pack_id") < F.col("shard") * PACKS_PER_SHARD)
        | (F.col("pack_id") >= (F.col("shard") + 1) * PACKS_PER_SHARD)
    ).count()
    assert bad == 0


# --- chunk_documents --------------------------------------------------------


def test_chunk_documents_windows(spark):
    import hashlib

    words = [f"w{i}" for i in range(150)]
    docs = spark.createDataFrame([(1, " ".join(words)), (2, "a b"), (3, "")],
                                 "doc_id long, text string")
    from data_diff_spark.functions.packing import chunk_documents

    out = chunk_documents(docs, chunk_tokens=64, overlap=8)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: 150 tokens, step 56 -> starts 0,56,112 -> 3 chunks of 64,64,38
    assert [rows[(1, i)]["n_tokens"] for i in range(3)] == [64, 64, 38]
    want = hashlib.md5(" ".join(words[56:120]).encode()).hexdigest()
    assert rows[(1, 1)]["chunk_md5"] == want
    # short doc: one partial chunk; empty doc: no chunks
    assert rows[(2, 0)]["n_tokens"] == 2
    assert not any(d == 3 for d, _ in rows)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    from data_diff_spark.functions.packing import chunk_documents
    from data_diff_spark.functions.text import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = chunk_documents(docs, chunk_tokens=64, overlap=8)
    # sum of chunk tokens >= total tokens (overlap duplicates some)
    got = out.groupBy("doc_id").agg(F.sum("n_tokens").alias("s"))
    tot = docs.select("doc_id", token_count(F.col("text")).alias("t"))
    bad = got.join(tot, "doc_id").filter(F.col("s") < F.col("t")).count()
    assert bad == 0


def test_chunk_and_repetition_are_map_only(spark, sf_dir):
    """Both hygiene ops must stay shuffle-free: at 100 TB an Exchange here
    would be the whole job."""
    from tests.test_plans import plan_of
    from data_diff_spark.functions.packing import chunk_documents
    from data_diff_spark.functions.text import with_repetition_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert "Exchange" not in plan_of(chunk_documents(docs))
    assert "Exchange" not in plan_of(with_repetition_stats(docs))


# --- repetition stats -------------------------------------------------------


def test_repetition_stats_values(spark):
    from data_diff_spark.functions.text import with_repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "aa bb\naa bb\ncc dd"),       # 3 lines, one dup pair
            (2, "x y z w"),                    # 1 line, no dups
            (3, "t t t t t"),                  # bigram 't t' repeated 4x
            (4, ""),                           # empty
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in with_repetition_stats(docs).collect()}
    assert out[1]["n_lines"] == 3 and out[1]["dup_line_frac"] == pytest.approx(1 / 3)
    assert out[1]["dup_line_char_frac"] == pytest.approx(5 / 15)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[3]["top_bigram_frac"] == 1.0  # all 4 bigrams are 't t'
    assert out[4]["n_lines"] == 0 and out[4]["top_bigram_frac"] == 0.0


# --- redact_pii -------------------------------------------------------------


def test_redact_pii_planted(spark):
    txt = (
        "reach me at alice.smith+x@corp.example.org or bob@ex.io, "
        "ssn 123-45-6789, phone +1 (415) 555-0199 end"
    )
    df = spark.createDataFrame([(txt,)], "text string")
    r = df.select(redact_pii(F.col("text")).alias("r")).select("r.*").collect()[0]
    assert r["n_email"] == 2 and r["n_ssn"] == 1 and r["n_phone"] == 1
    out = r["text"]
    assert "<EMAIL>" in out and "<SSN>" in out and "<PHONE>" in out
    assert "alice" not in out and "123-45-6789" not in out and "555-0199" not in out


def test_redact_pii_ssn_not_double_counted_as_phone(spark):
    df = spark.createDataFrame([("only an ssn 123-45-6789 here",)], "text string")
    r = df.select(redact_pii(F.col("text")).alias("r")).select("r.*").collect()[0]
    assert r["n_ssn"] == 1 and r["n_phone"] == 0


def test_redact_pii_clean_text_untouched(spark):
    df = spark.createDataFrame([("no pii in this sentence at all",)], "text string")
    r = df.select(redact_pii(F.col("text")).alias("r")).select("r.*").collect()[0]
    assert r["text"] == "no pii in this sentence at all"
    assert r["n_email"] == r["n_ssn"] == r["n_phone"] == 0


def test_decontaminate_normalize_catches_case_evasion(spark):
    corpus = spark.createDataFrame(
        [(1, "The QUICK brown FOX jumps over the lazy dog!")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    plain = decontaminate(corpus, bench, n=5).count()
    normed = decontaminate(corpus, bench, n=5, normalize=True).count()
    assert plain == 0 and normed == 1
