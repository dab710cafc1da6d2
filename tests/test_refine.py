"""Sampling-based schema refinement (UUID/JSON/alphanum-in-string
detection, reference _refine_coltypes base.py:1113-1160)."""

import pytest
from pyspark.sql import Row

from data_diff_spark import table_segment
from data_diff_spark.operators.joindiff import join_diff
from data_diff_spark.refine import refine_string_kinds, refined

UUIDS = [
    "8b6c6e8a-3d0a-4f6e-9c1a-6f1e2d3c4b5a",
    "00000000-0000-0000-0000-000000000001",
    "DEADBEEF-0000-4444-8888-CAFEBABE0000",
]


@pytest.fixture()
def frames(spark):
    a = spark.createDataFrame(
        [Row(id=i, uid=u, props='{"a": %d}' % i, note=f"plain {i}")
         for i, u in enumerate(UUIDS)]
    )
    # same logical values, but uuids carry trailing whitespace and the JSON
    # uses different spacing — physically different, logically equal
    b = spark.createDataFrame(
        [Row(id=i, uid=u + "  ", props='{ "a" : %d }' % i, note=f"plain {i}")
         for i, u in enumerate(UUIDS)]
    )
    return a, b


def test_detects_kinds(spark, frames):
    a, _ = frames
    kinds = refine_string_kinds(a)
    # 'note' values ("plain 0") live in the reference's base-66 alphabet
    # (letters, digits, space) -> String_Alphanum parity
    assert kinds == {"uid": "uuid", "props": "json", "note": "alphanum"}


def test_null_only_column_unrefined(spark):
    df = spark.createDataFrame([Row(id=1, s=None), Row(id=2, s=None)],
                               "id int, s string")
    assert refine_string_kinds(df) == {}


def test_alphanum_detection_rules(spark):
    """Alphabet = space/dash/digits/letters/underscore (utils.py:122);
    uuid wins over alphanum; punctuation outside the alphabet disables;
    mixed uuid/non-uuid warns and stays unrefined."""
    df = spark.createDataFrame(
        [
            Row(id=1, key="ABC-123 x_y", text="hello, world!", u=UUIDS[0]),
            Row(id=2, key="zz 9", text="plain", u=UUIDS[1]),
        ]
    )
    kinds = refine_string_kinds(df)
    assert kinds == {"key": "alphanum", "u": "uuid"}  # text has a comma

    mixed = spark.createDataFrame(
        [Row(id=1, u=UUIDS[0]), Row(id=2, u="not-a-uuid")]
    )
    assert refine_string_kinds(mixed) == {}  # mixed uuid -> disabled


def test_alphanum_kind_is_comparison_neutral(spark):
    a = spark.createDataFrame([Row(id=1, k="AB 1"), Row(id=2, k="CD_2")])
    b = spark.createDataFrame([Row(id=1, k="AB 1"), Row(id=2, k="CD_3")])
    t1, t2 = refined(table_segment(a, ["id"])), refined(table_segment(b, ["id"]))
    assert t1.kind_overrides.get("k") == "alphanum"
    d = join_diff(t1, t2)
    assert d.count() == 2  # the real change still diffs; id=1 doesn't


def test_refined_diff_ignores_physical_encoding(spark, frames):
    a, b = frames
    t1, t2 = table_segment(a, ["id"]), table_segment(b, ["id"])
    # unrefined: whitespace differences are real diffs
    assert join_diff(t1, t2).count() > 0
    # refined: uuid trim + json canonicalization -> zero diff
    assert join_diff(refined(t1), refined(t2)).count() == 0


def test_refined_checksums_align(spark, frames):
    a, b = frames
    t1, t2 = refined(table_segment(a, ["id"])), refined(table_segment(b, ["id"]))
    assert t1.count_and_checksum() == t2.count_and_checksum()
