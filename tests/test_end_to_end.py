"""Cross-module composition: the operators work AS A PIPELINE, not just
alone — clean -> pack -> export for text; encode -> export -> decode for
media. These are the user journeys the README sells."""

import glob
import tarfile

import numpy as np
import pyarrow.ipc as ipc
import pytest
from pyspark.sql import functions as F


def test_text_pipeline_to_arrow_shards(spark, sf_dir, tmp_path):
    """documents -> clean_corpus -> pack_sequences -> Arrow shards: the
    packed token budget survives the full chain and the shards carry
    exactly the packed rows."""
    from data_diff_spark.functions.packing import pack_sequences
    from data_diff_spark.pipeline import clean_corpus
    from data_diff_spark.sources.export import write_arrow_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cleaned, audit = clean_corpus(docs, min_tokens=5, redact=False)
    packed = pack_sequences(cleaned, budget=256, n_shards=8)
    n_packed = packed.count()
    assert n_packed > 0

    out = str(tmp_path / "shards")
    manifest = write_arrow_shards(packed, out, rows_per_shard=50).collect()
    assert sum(m.rows for m in manifest) == n_packed
    total = 0
    for f in glob.glob(out + "/*.arrow"):
        t = ipc.open_file(f).read_all()
        total += t.num_rows
    assert total == n_packed
    cleaned.unpersist()


def test_media_roundtrip_through_webdataset(spark, tmp_path):
    """Our own JPEG encoder -> WebDataset tar -> read members back ->
    our own decoder: the codec and the export format compose."""
    from data_diff_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from data_diff_spark.sources.export import write_webdataset

    rng = np.random.default_rng(5)
    imgs = {f"im{i}": rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
            for i in range(6)}
    rows = [
        (k, bytearray(encode_jpeg(v, quant=1, progressive=(i % 2 == 0))), "grey")
        for i, (k, v) in enumerate(imgs.items())
    ]
    df = spark.createDataFrame(rows, "key string, jpg binary, kind string")
    out = str(tmp_path / "wds")
    manifest = write_webdataset(
        df, out, key_col="key",
        extensions={"jpg": "jpg", "kind": "cls"}, rows_per_shard=4,
    ).collect()
    assert sum(m.rows for m in manifest) == 6
    seen = 0
    for f in glob.glob(out + "/*.tar"):
        with tarfile.open(f) as tar:
            for mem in tar.getmembers():
                if not mem.name.endswith(".jpg"):
                    continue
                key = mem.name[:-4]
                got = decode_jpeg(tar.extractfile(mem).read())
                src = imgs[key]
                assert got.shape == src.shape
                assert int(np.abs(got.astype(int) - src.astype(int)).max()) <= 2
                seen += 1
    assert seen == 6


def test_warc_to_clean_corpus(spark, tmp_path):
    """WARC bytes -> html_to_text -> quality stats: the web front door
    feeds the text operators directly."""
    import gzip

    from data_diff_spark.functions.text import token_count
    from data_diff_spark.functions.web import html_to_text
    from data_diff_spark.sources.warc import read_warc

    body = ("<html><body>" + "<p>spark filter join " * 30 + "</p></body></html>").encode()
    rec = (
        b"WARC/1.0\r\nWARC-Record-ID: <urn:uuid:7>\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.example/\r\n"
        b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body + b"\r\n\r\n"
    )
    d = tmp_path / "w"
    d.mkdir()
    (d / "x.warc.gz").write_bytes(gzip.compress(rec))
    docs = read_warc(spark, str(d), warc_types=["response"]).select(
        F.col("target_uri").alias("url"),
        html_to_text(F.decode("content", "utf-8")).alias("text"),
    )
    row = docs.select("url", token_count(F.col("text")).alias("n")).collect()[0]
    assert row.url == "http://x.example/" and row.n == 90
