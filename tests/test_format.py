"""Typed JSON diff format + case-insensitive column resolution."""

import json

from data_diff_spark import diff_tables, table_segment
from data_diff_spark.format import jsonify


def test_jsonify_statuses(spark):
    a = spark.createDataFrame(
        [(1, "keep", 10), (2, "old", 20), (3, "gone", 30)], "id int, name string, v int"
    )
    b = spark.createDataFrame(
        [(1, "keep", 10), (2, "new", 20), (4, "born", 40)], "id int, name string, v int"
    )
    result = diff_tables(table_segment(a, ["id"]), table_segment(b, ["id"]))
    recs = {tuple(r["key"]): r for r in map(json.loads, jsonify(result).toJSON().collect())}
    assert recs[("2",)]["status"] == "changed"
    assert recs[("2",)]["values"]["name"] == {"old": "old", "new": "new"}
    assert recs[("2",)]["values"]["v"] == {"old": "20", "new": "20"}
    assert recs[("3",)]["status"] == "removed" and recs[("3",)]["n_new"] == 0
    assert recs[("4",)]["status"] == "added" and recs[("4",)]["n_old"] == 0
    assert ("1",) not in recs  # unchanged rows never appear


def test_case_insensitive_column_resolution(spark):
    df = spark.createDataFrame([(1, 5)], "OrderKey int, TotalPrice int")
    t = table_segment(df, ["orderkey"], extra_columns=["TOTALPRICE"], case_sensitive=False)
    assert t.key_columns == ("OrderKey",)
    assert t.relevant_columns == ("OrderKey", "TotalPrice")
    assert t.count() == 1
