"""Streaming shard export (streaming/export_stream.py): the bounded-stream
shard set must carry exactly the rows the batch writer exports, with
deterministic batch-qualified names, and replay must not duplicate files."""

import glob
import json
import os

import pyarrow.ipc as ipc
import pytest
from pyspark.sql import functions as F

from data_diff_spark.sources.export import write_arrow_shards
from data_diff_spark.streaming.export_stream import (
    arrow_shard_stream_sink, webdataset_stream_sink,
)


@pytest.fixture()
def doc_source(spark, documents, tmp_path):
    """A bounded file stream: documents written as several parquet files."""
    src = str(tmp_path / "src")
    documents.select("doc_id", "text", "lang").repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", "2")  # force multiple micro-batches
        .parquet(src)
    )
    return stream


def _read_arrow_rows(out):
    rows = set()
    for p in glob.glob(out + "/*.arrow"):
        t = ipc.open_file(p).read_all()
        rows |= set(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    return rows


def test_stream_shards_equal_batch_export(spark, documents, doc_source, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = arrow_shard_stream_sink(
        doc_source, out, ckpt, rows_per_shard=200, trigger_once=True
    )
    q.awaitTermination(120)

    batch_out = str(tmp_path / "batch_out")
    write_arrow_shards(
        documents.select("doc_id", "text", "lang"), batch_out, rows_per_shard=200
    ).collect()
    assert _read_arrow_rows(out) == _read_arrow_rows(batch_out)

    # names are batch-qualified and deterministic; manifests are commit markers
    names = sorted(os.path.basename(p) for p in glob.glob(out + "/*.arrow"))
    assert all(n.startswith("batch-") for n in names)
    manifests = sorted(glob.glob(out + "/_manifests/batch-*.jsonl"))
    assert len(manifests) >= 2  # maxFilesPerTrigger forced multiple batches
    listed = [json.loads(l)["path"] for m in manifests for l in open(m)]
    assert sorted(os.path.basename(p) for p in listed) == names


def test_stream_restart_is_exactly_once(spark, doc_source, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = arrow_shard_stream_sink(doc_source, out, ckpt, rows_per_shard=200,
                                trigger_once=True)
    q.awaitTermination(120)
    files = {p: os.path.getmtime(p) for p in glob.glob(out + "/*.arrow")}
    # restart against the SAME checkpoint: source is exhausted, no new
    # batches, no new or rewritten files
    q2 = arrow_shard_stream_sink(doc_source, out, ckpt, rows_per_shard=200,
                                 trigger_once=True)
    q2.awaitTermination(120)
    assert {p: os.path.getmtime(p) for p in glob.glob(out + "/*.arrow")} == files


def test_replay_overwrites_not_duplicates(spark, doc_source, tmp_path):
    """A FRESH checkpoint replays the whole source with the same batch ids:
    the file set must be identical (overwritten in place), never doubled."""
    out = str(tmp_path / "out")
    q = arrow_shard_stream_sink(doc_source, out, str(tmp_path / "ck1"),
                                rows_per_shard=200, trigger_once=True)
    q.awaitTermination(120)
    first = sorted(glob.glob(out + "/*.arrow"))
    rows_first = _read_arrow_rows(out)
    q2 = arrow_shard_stream_sink(doc_source, out, str(tmp_path / "ck2"),
                                 rows_per_shard=200, trigger_once=True)
    q2.awaitTermination(120)
    assert sorted(glob.glob(out + "/*.arrow")) == first
    assert _read_arrow_rows(out) == rows_first
    assert not glob.glob(out + "/*.tmp")


def test_webdataset_stream_members(spark, documents, doc_source, tmp_path):
    import tarfile

    out, ckpt = str(tmp_path / "wds"), str(tmp_path / "ckpt")
    q = webdataset_stream_sink(
        doc_source, out, "doc_id", {"text": "txt", "lang": "json"},
        ckpt, rows_per_shard=200, trigger_once=True,
    )
    q.awaitTermination(120)
    keys = set()
    for p in glob.glob(out + "/*.tar"):
        with tarfile.open(p) as tar:
            for m in tar.getmembers():
                if m.name.endswith(".txt"):
                    keys.add(int(m.name[:-4]))
    want = {r.doc_id for r in documents.select("doc_id").collect()}
    assert keys == want
