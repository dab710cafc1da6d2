"""Snapshot diff: digest snapshots vs live tables (operators/snapshot.py)."""

import os

import pytest
from pyspark.sql import functions as F

from data_diff_spark import table_segment
from data_diff_spark.operators import snapshot as SN

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def test_snapshot_roundtrip_no_changes(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = table_segment(orders, ["o_orderkey"])
    path = os.path.join(SCRATCH, "snap_orders_same")
    SN.write_snapshot(t, path)
    assert SN.diff_against_snapshot(t, SN.load_snapshot(spark, path)).count() == 0


def test_snapshot_detects_insert_delete_update(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, s string, v double"
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 99.0), (4, "d", 4.0)], "id long, s string, v double"
    )
    path = os.path.join(SCRATCH, "snap_small")
    SN.write_snapshot(table_segment(old, ["id"]), path)
    out = {
        r["id"]: r["sign"]
        for r in SN.diff_against_snapshot(
            table_segment(new, ["id"]), SN.load_snapshot(spark, path)
        ).collect()
    }
    assert out == {1: "-", 3: "!", 4: "+"}


def test_snapshot_compound_and_null_keys(spark):
    old = spark.createDataFrame(
        [(1, None, "x"), (1, 2, "y")], "a long, b long, s string"
    )
    new = spark.createDataFrame(
        [(1, None, "CHANGED"), (1, 2, "y")], "a long, b long, s string"
    )
    path = os.path.join(SCRATCH, "snap_nullkey")
    SN.write_snapshot(table_segment(old, ["a", "b"]), path)
    rows = SN.diff_against_snapshot(
        table_segment(new, ["a", "b"]), SN.load_snapshot(spark, path)
    ).collect()
    # null-safe key join: the (1, NULL) row matches itself and reports '!'
    assert [(r["a"], r["b"], r["sign"]) for r in rows] == [(1, None, "!")]


def test_snapshot_is_narrow(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = table_segment(orders, ["o_orderkey"])
    assert SN.snapshot_frame(t).columns == ["o_orderkey", SN.CKS_COL]
