"""Incremental aggregate maintenance (operators/incremental.py): the
refreshed rollup must be bit-identical to a from-scratch recompute over
the patched table — on the driver's orders diff and on adversarial
group churn (emptied groups, brand-new groups, NULL keys)."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.diff import apply_diff, diff_tables
from data_diff_spark.operators.incremental import aggregate_table, refresh_aggregate
from data_diff_spark.table import table_segment


def _assert_same(a, b):
    key = lambda t: tuple((v is None, v) for v in t)  # None-safe ordering
    assert sorted(map(tuple, a.collect()), key=key) == \
        sorted(map(tuple, b.collect()), key=key)


def test_orders_rollup_refresh(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    modified = (
        orders.filter(F.col("o_orderkey") % 100 != 1)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") % 100 == 2, F.col("o_totalprice") + 100.0)
            .otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 100 == 3)
            .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        )
    )
    keys, sums = ["o_orderstatus"], {"total": "o_totalprice"}
    old = aggregate_table(orders, keys, sums)
    res = diff_tables(
        table_segment(orders, ["o_orderkey"]),
        table_segment(modified, ["o_orderkey"]),
    )
    refreshed = refresh_aggregate(old, res.df, keys, sums)
    scratch = aggregate_table(modified, keys, sums)
    _assert_same(refreshed, scratch)
    # and the closure: patching the base then aggregating agrees too
    patched = apply_diff(orders, res.df, ["o_orderkey"])
    _assert_same(aggregate_table(patched, keys, sums), scratch)
    res.unpersist()


def test_group_churn_and_null_keys(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 1.0), (4, None, 2.0)],
        "id int, g string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),            # unchanged
         (2, "c", 5.0),             # moved a -> c (new group)
         (4, None, 7.0),            # NULL-key group updated
         (5, "d", 3.0)],            # brand-new group; b emptied (id=3 gone)
        "id int, g string, v double",
    )
    res = diff_tables(table_segment(base, ["id"]), table_segment(new, ["id"]))
    keys, sums = ["g"], {"sv": "v"}
    refreshed = refresh_aggregate(aggregate_table(base, keys, sums), res.df, keys, sums)
    _assert_same(refreshed, aggregate_table(new, keys, sums))
    got = {r["g"]: (r["n"], float(r["sv"])) for r in refreshed.collect()}
    assert "b" not in got                 # emptied group dropped
    assert got["d"] == (1, 3.0)           # new group appears
    assert got[None] == (1, 7.0)          # null-safe group key
    res.unpersist()
