"""Multimodal plumbing + structured-streaming tests."""

import pytest
from pyspark.sql import Row, functions as F

from data_diff_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_attach_media_schema(docs):
    m = MM.attach_fake_media(docs)
    assert dict(m.dtypes)["media"] == "binary"
    got_meta = [(f.name, f.dataType) for f in m.schema["media_meta"].dataType.fields]
    assert got_meta == [(f.name, f.dataType) for f in MM.MEDIA_META.fields]
    row = m.orderBy("doc_id").first()
    assert bytes(row.media).decode("utf-8") == docs.orderBy("doc_id").first().text
    assert row.media_meta.format in ("png", "jpeg", "webp")


def test_extract_features_matches_python(docs):
    m = MM.attach_fake_media(docs.limit(20))
    feats = {r.doc_id: r for r in MM.extract_features(m).collect()}
    for src in docs.limit(20).collect():
        data = src.text.encode("utf-8")
        want = MM.fake_decode(data)
        got = feats[src.doc_id]
        assert got.n_bytes == want["n_bytes"]
        assert got.content_md5 == want["content_md5"]
        assert got.byte_mean == want["byte_mean"]


def test_extract_features_null_and_empty(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text=None)]
    )
    out = {r.doc_id: r for r in MM.extract_features(MM.attach_fake_media(df)).collect()}
    assert out[1].n_bytes == 0 and out[1].byte_mean == 0.0
    assert out[2].n_bytes == 0  # null media treated as empty bytes


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        MM.sample_frames(b"", 10)
    with pytest.raises(NotImplementedError):
        MM.resize_image(b"", 64, 64)


def test_streaming_rollup_equals_batch(spark, sf_dir):
    """Bounded-input streaming result must equal the batch GROUP BY."""
    from data_diff_spark.streaming.events_stream import hourly_rollup_batch_equivalent

    got = hourly_rollup_batch_equivalent(spark, sf_dir)
    from data_diff_spark.sources.connect import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    want = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,4)")).cast("double").alias("total_value"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
