"""Training-export shards (sources/export.py): Arrow IPC and WebDataset
tars round-trip, manifests match the files, shard sizing honored."""

import glob
import json
import tarfile

import pyarrow.ipc as ipc
import pytest
from pyspark.sql import functions as F

from data_diff_spark.sources.export import write_arrow_shards, write_webdataset


def test_arrow_shards_roundtrip(spark, tmp_path):
    out = str(tmp_path / "arrow")
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2).alias("v"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    ).repartition(4)
    manifest = write_arrow_shards(df, out, rows_per_shard=150).collect()
    files = sorted(glob.glob(out + "/*.arrow"))
    assert sorted(m.path for m in manifest) == files
    assert sum(m.rows for m in manifest) == 1000
    # every shard <= 150 rows, readable by stock pyarrow, schema intact
    got = []
    for f in files:
        t = ipc.open_file(f).read_all()
        assert t.num_rows <= 150
        assert t.schema.names == ["id", "v", "text"]
        got += t.column("id").to_pylist()
    assert sorted(got) == list(range(1000))
    # manifests report real file sizes
    import os
    for m in manifest:
        assert m.bytes == os.path.getsize(m.path) > 0


def test_webdataset_roundtrip(spark, tmp_path):
    out = str(tmp_path / "wds")
    df = spark.createDataFrame(
        [(f"s{i:03d}", f"text {i}", bytes([i % 256, 1, 2]), i) for i in range(40)],
        "key string, text string, img binary, label long",
    ).repartition(2)
    manifest = write_webdataset(
        df, out, key_col="key",
        extensions={"text": "txt", "img": "jpg", "label": "cls"},
        rows_per_shard=16,
    ).collect()
    assert sum(m.rows for m in manifest) == 40
    samples = {}
    for f in glob.glob(out + "/*.tar"):
        with tarfile.open(f) as tar:
            for mem in tar.getmembers():
                key, ext = mem.name.rsplit(".", 1)
                samples.setdefault(key, {})[ext] = tar.extractfile(mem).read()
    assert len(samples) == 40
    s = samples["s007"]
    assert s["txt"] == b"text 7"
    assert s["jpg"] == bytes([7, 1, 2])
    assert json.loads(s["cls"]) == 7
    # sample fields grouped: every sample carries all three members
    assert all(set(v) == {"txt", "jpg", "cls"} for v in samples.values())


def test_shard_names_deterministic_per_partition(spark, tmp_path):
    out = str(tmp_path / "det")
    df = spark.range(100).repartition(3)
    write_arrow_shards(df, out, rows_per_shard=1000).collect()
    names = sorted(p.split("/")[-1] for p in glob.glob(out + "/*.arrow"))
    assert names == [f"shard-{p:05d}-0000.arrow" for p in range(3)]
    # re-running overwrites in place (retry semantics), no duplicates
    write_arrow_shards(df, out, rows_per_shard=1000).collect()
    assert len(glob.glob(out + "/*")) == 3


def test_arrow_shards_read_back(spark, tmp_path):
    """Write -> read_arrow_shards -> identical rows and schema (the export
    format as a first-class SOURCE, sources/export.py read side)."""
    from data_diff_spark.sources.connect import read_uri
    from data_diff_spark.sources.export import read_arrow_shards

    out = str(tmp_path / "rb")
    df = spark.createDataFrame(
        [(i, f"doc {i}", float(i) / 3, bytes([i % 256])) for i in range(500)],
        "id long, text string, score double, blob binary",
    ).repartition(3)
    write_arrow_shards(df, out, rows_per_shard=100).collect()
    back = read_arrow_shards(spark, out)
    assert back.schema == df.schema
    a = sorted(tuple(r) for r in df.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
    # and via the URI registry
    uri = sorted(tuple(r) for r in read_uri(spark, f"arrowshards://{out}").collect())
    assert uri == a


def test_webdataset_read_back(spark, tmp_path):
    from data_diff_spark.sources.connect import read_uri

    out = str(tmp_path / "wdsrb")
    df = spark.createDataFrame(
        [(f"s{i:03d}", f"text {i}", bytes([i % 256, 9])) for i in range(40)],
        "key string, text string, img binary",
    ).repartition(2)
    write_webdataset(
        df, out, key_col="key", extensions={"text": "txt", "img": "jpg"},
        rows_per_shard=16,
    ).collect()
    back = read_uri(
        spark, f"webdataset://{out}",
        key_col="key", extensions={"text": "txt", "img": "jpg"},
        text_cols={"text"},
    )
    a = sorted((r.key, r.text, bytes(r.img)) for r in back.collect())
    b = sorted((r.key, r.text, bytes(r.img)) for r in df.collect())
    assert a == b


def test_diff_two_exports(spark, tmp_path):
    """The product story closed end-to-end: two training exports diffed
    directly via the arrowshards:// source — a user can answer 'what
    changed between yesterday's and today's shard set' with the same
    diff operators used on tables."""
    from data_diff_spark.diff import diff_tables
    from data_diff_spark.sources.connect import connect_to_table

    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    base = spark.createDataFrame(
        [(i, f"doc {i}", float(i)) for i in range(300)],
        "id long, text string, score double",
    ).repartition(2)
    write_arrow_shards(base, a_dir, rows_per_shard=100).collect()
    changed = base.withColumn(
        "score",
        F.when(F.col("id") % 50 == 3, F.col("score") + 1.0).otherwise(F.col("score")),
    ).filter("id % 100 != 7")
    write_arrow_shards(changed, b_dir, rows_per_shard=100).collect()

    t1 = connect_to_table(
        spark, f"arrowshards://{a_dir}", ["id"], extra_columns=["text", "score"]
    )
    t2 = connect_to_table(
        spark, f"arrowshards://{b_dir}", ["id"], extra_columns=["text", "score"]
    )
    rows = diff_tables(t1, t2).df.collect()
    minus = {r.id for r in rows if r.sign == "-"}
    plus = {r.id for r in rows if r.sign == "+"}
    assert {i for i in range(300) if i % 100 == 7} <= minus
    assert plus == {i for i in range(300) if i % 50 == 3 and i % 100 != 7}


def test_webdataset_dotted_keys_roundtrip(spark, tmp_path):
    """Keys containing dots must survive: member matching goes by known
    extension SUFFIX, not first-dot split (review finding r5)."""
    from data_diff_spark.sources.export import read_webdataset

    out = str(tmp_path / "wdsdot")
    df = spark.createDataFrame(
        [("img.001", "a", b"\x01"), ("img.002", "b", b"\x02"),
         ("v2.final.3", "c", b"\x03")],
        "key string, text string, img binary",
    )
    write_webdataset(df, out, key_col="key",
                     extensions={"text": "txt", "img": "jpg"},
                     rows_per_shard=10).collect()
    back = read_webdataset(spark, out, "key", {"text": "txt", "img": "jpg"},
                           text_cols={"text"})
    a = sorted((r.key, r.text, bytes(r.img)) for r in back.collect())
    b = sorted((r.key, r.text, bytes(r.img)) for r in df.collect())
    assert a == b


def test_fused_export_matches_single_writers(spark, tmp_path):
    """write_arrow_and_webdataset (one pass, both formats) must produce
    byte-identical shard files to the two single-format writers at the
    same rows_per_shard — the r13 fused gate write depends on it."""
    import glob
    import os

    from data_diff_spark.sources.export import (
        write_arrow_and_webdataset,
        write_arrow_shards,
    )

    df = spark.createDataFrame(
        [(i, f"t{i}", float(i)) for i in range(57)],
        "id long, text string, score double",
    ).repartition(3, "id")
    exts = {"text": "txt", "score": "score"}
    sa, sw = str(tmp_path / "sa"), str(tmp_path / "sw")
    fa, fw = str(tmp_path / "fa"), str(tmp_path / "fw")
    write_arrow_shards(df, sa, rows_per_shard=10).collect()
    write_webdataset(df, sw, key_col="id", extensions=exts,
                     rows_per_shard=10).collect()
    mani = write_arrow_and_webdataset(df, fa, fw, key_col="id",
                                      extensions=exts,
                                      rows_per_shard=10).collect()
    # manifest covers every file of both formats
    assert sorted(r.path for r in mani) == sorted(
        glob.glob(os.path.join(fa, "*.arrow")) + glob.glob(os.path.join(fw, "*.tar")))

    def bytes_by_name(d):
        return {os.path.basename(p): open(p, "rb").read()
                for p in glob.glob(os.path.join(d, "*"))}

    assert bytes_by_name(fa) == bytes_by_name(sa)
    assert bytes_by_name(fw) == bytes_by_name(sw)
