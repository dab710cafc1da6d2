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


def test_compressed_formats_are_explicit_stubs():
    # webp decodes natively now (functions/webp.py); a truncated container
    # is malformed, not unsupported
    with pytest.raises((ValueError, NotImplementedError)):
        MM.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    # a bare PNG signature without chunks is malformed, not unsupported
    with pytest.raises(ValueError):
        MM.decode_image(b"\x89PNG\r\n\x1a\n")
    # a truncated JPEG marker stream is malformed, not unsupported
    with pytest.raises(Exception):
        MM.decode_image(b"\xff\xd8\xff\xe0")


def test_netpbm_roundtrip_rgb_and_gray():
    import numpy as np

    rgb = (np.arange(4 * 6 * 3, dtype=np.uint8) % 251).reshape(4, 6, 3)
    assert (MM.decode_image(MM.encode_image(rgb)) == rgb).all()
    gray = (np.arange(5 * 7, dtype=np.uint8) * 3 % 256).astype("uint8").reshape(5, 7)
    assert (MM.decode_image(MM.encode_image(gray)) == gray).all()


def test_netpbm_header_comments_and_errors():
    import numpy as np

    img = MM.encode_image(np.zeros((2, 2), dtype=np.uint8))
    with_comment = img.replace(b"P5\n", b"P5\n# a comment\n", 1)
    assert MM.decode_image(with_comment).shape == (2, 2)
    with pytest.raises((ValueError, NotImplementedError)):
        MM.decode_image(b"")  # not a recognizable image at all
    with pytest.raises(ValueError):
        MM.decode_image(b"P6\nnot-a-number\n")
    with pytest.raises(NotImplementedError):
        # 16-bit maxval
        MM.decode_image(b"P5\n2 2\n65535\n" + b"\x00" * 8)


def test_resize_nearest_neighbor_matches_index_formula():
    import numpy as np

    arr = (np.arange(8 * 8 * 3, dtype=np.int64) % 256).astype("uint8").reshape(8, 8, 3)
    small = MM.decode_image(MM.resize_image(MM.encode_image(arr), 3, 5))
    rows = (np.arange(5) * 8) // 5
    cols = (np.arange(3) * 8) // 3
    assert (small == arr[rows][:, cols]).all()
    # upscale too
    big = MM.decode_image(MM.resize_image(MM.encode_image(arr), 16, 16))
    assert big.shape == (16, 16, 3)


def test_sample_frames_concatenated_stream():
    import numpy as np

    frames = [np.full((2, 3, 3), i, dtype=np.uint8) for i in range(10)]
    video = b"".join(MM.encode_image(f) for f in frames)
    every3 = MM.sample_frames(video, every_n=3)
    assert [int(f[0, 0, 0]) for f in every3] == [0, 3, 6, 9]
    assert all(f.shape == (2, 3, 3) for f in every3)


def test_extract_image_features_matches_local_decode(spark):
    import numpy as np

    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    media = MM.attach_ppm_media(df)
    out = {r["doc_id"]: r for r in MM.extract_image_features(media).collect()}
    for i in range(20):
        arr = MM.decode_image(MM._synth_ppm(i))
        h, w = arr.shape[:2]
        assert (out[i]["width"], out[i]["height"]) == (w, h)
        assert out[i]["mean_r"] == arr[:, :, 0].astype("int64").sum() / (h * w)


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


def test_wav_roundtrip_and_chunk_walking():
    import numpy as np
    import struct

    s = (np.arange(300, dtype=np.int64) * 37 % 2001 - 1000).astype("int16")
    blob = MM.encode_wav(s, 8000)
    rate, back = MM.decode_audio(blob)
    assert rate == 8000 and (back == s).all()
    # an extra chunk between fmt and data must be skipped (word-aligned)
    extra = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    rate2, back2 = MM.decode_audio(b"RIFF" + blob[4:8] + b"WAVE" + blob[12:36] + extra + blob[36:])
    assert rate2 == 8000 and (back2 == s).all()


def test_wav_rejects_compressed_and_stereo():
    import numpy as np
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        MM.decode_audio(b"ID3\x04mp3data")
    # stereo: patch channels=2 in the fmt chunk
    blob = bytearray(MM.encode_wav(np.zeros(4, dtype=np.int16)))
    blob[22] = 2
    with _pt.raises(NotImplementedError):
        MM.decode_audio(bytes(blob))


def test_extract_audio_features_matches_local(spark):
    import numpy as np

    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = {r["doc_id"]: r for r in MM.extract_audio_features(MM.attach_wav_media(df)).collect()}
    for i in range(12):
        rate, s = MM.decode_audio(MM._synth_wav(i))
        x = s.astype("int64")
        assert out[i]["n_samples"] == len(x)
        assert out[i]["rms"] == float(np.sqrt((x * x).sum() / len(x)))
        assert out[i]["n_zero_cross"] == int(((x[:-1] * x[1:]) < 0).sum())
