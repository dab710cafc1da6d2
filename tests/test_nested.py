"""Schema flattening (functions/nested.py)."""

import pytest
from pyspark.sql import Row

from data_diff_spark.functions.nested import flatten


def test_flatten_nested_structs(spark):
    df = spark.createDataFrame([
        Row(id=1, meta=Row(a=Row(x=10, y="u"), b=2.5), tags=["t1", "t2"]),
    ])
    out = flatten(df)
    assert set(out.columns) == {"id", "meta.a.x", "meta.a.y", "meta.b", "tags"}
    r = out.collect()[0]
    assert r["meta.a.x"] == 10 and r["meta.b"] == 2.5
    assert r["tags"] == ["t1", "t2"]  # arrays untouched -> row count stable


def test_flatten_with_explode_outer(spark):
    df = spark.createDataFrame(
        [(1, [Row(k="a", v=1), Row(k="b", v=2)]), (2, []), (3, None)],
        "id int, items array<struct<k string, v int>>",
    )
    out = flatten(df, explode=["items"])
    rows = sorted((r["id"], r["items.k"], r["items.v"]) for r in out.collect())
    # empty and NULL arrays survive as one NULL row each — nothing dropped
    assert rows == [(1, "a", 1), (1, "b", 2), (2, None, None), (3, None, None)]


def test_flatten_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, Row(b=2), 3)], "a int, x struct<b int>, `x.b` int"
    )
    with pytest.raises(ValueError, match="collision"):
        flatten(df)


def test_write_sized_targets_file_size(spark, sf_dir, tmp_path):
    """write_sized measures encoded bytes/row and picks a file count near
    the target; tiny target -> multiple files, huge target -> one."""
    import os as _os

    from data_diff_spark.sources.connect import write_sized

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out1 = str(tmp_path / "one")
    n1 = write_sized(li, out1, target_file_mb=10_000)
    assert n1 == 1
    out2 = str(tmp_path / "many")
    # ~0.1 MB target on a ~1 MB-encoded table -> several files
    n2 = write_sized(li, out2, target_file_mb=1)
    files = [f for f in _os.listdir(out2) if f.endswith(".parquet")]
    assert n2 == len(files) >= 1
    sizes = [_os.path.getsize(_os.path.join(out2, f)) for f in files]
    # every file within ~3x of the 1 MB target (compression variance)
    assert all(s < 3 * 1024 * 1024 for s in sizes)
    # row fidelity
    assert spark.read.parquet(out2).count() == li.count()
