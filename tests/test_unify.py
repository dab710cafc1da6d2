"""Precision/type unification (unify.py) — the reference's zero-diff
invariant (test_database_types.py:747-761): the same logical values written
through two different physical types/precisions must diff EMPTY once both
sides are reduced to minimum mutual precision."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark import diff_tables, table_segment
from data_diff_spark.unify import column_precision, unify_precisions


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_timestamp_truncation_zero_diff(orders):
    """ts(6) side vs truncated-to-second side (declared precision 0):
    automatic unification -> zero spurious diffs; without it every row with
    sub-second digits would false-diff."""
    a = orders.select("o_orderkey", "o_orderdate",
                      (F.col("o_orderdate") + F.expr("INTERVAL 123456 MICROSECOND")).alias("t"))
    b = a.withColumn("t", F.date_trunc("second", "t"))
    t1 = table_segment(a, ["o_orderkey"])
    t2 = table_segment(b, ["o_orderkey"], precision_overrides={"t": 0})
    assert diff_tables(t1, t2).df.count() == 0
    # and the un-unified comparison really does differ (guard against a
    # vacuous test): manual diff without the override
    t2_raw = table_segment(b, ["o_orderkey"])
    assert diff_tables(t1, t2_raw).df.count() > 0


def test_decimal_scale_pair_zero_diff(orders):
    """decimal(15,4) vs decimal(15,2) of the same 2-digit values: scales
    unify to 2 automatically (type-derived, no manual override)."""
    base = orders.select("o_orderkey", F.col("o_totalprice").cast("decimal(15,2)").alias("p"))
    a = base.withColumn("p", F.col("p").cast("decimal(15,4)"))
    t1 = table_segment(a, ["o_orderkey"])
    t2 = table_segment(base, ["o_orderkey"])
    assert diff_tables(t1, t2).df.count() == 0


def test_float_vs_decimal_zero_diff(orders):
    """double (precision 6 default) vs decimal(12,2): unified at scale 2,
    equal after rounding -> empty diff."""
    a = orders.select("o_orderkey", F.col("o_totalprice").alias("p"))
    b = orders.select("o_orderkey", F.col("o_totalprice").cast("decimal(12,2)").alias("p"))
    t1 = table_segment(a, ["o_orderkey"])
    t2 = table_segment(b, ["o_orderkey"])
    assert diff_tables(t1, t2).df.count() == 0


def test_unify_hashdiff_path(orders):
    """The unified precisions flow into hashdiff digests too."""
    a = orders.select("o_orderkey", (F.col("o_orderdate") + F.expr("INTERVAL 999999 MICROSECOND")).alias("t"))
    b = a.withColumn("t", F.date_trunc("second", "t"))
    t1 = table_segment(a, ["o_orderkey"])
    t2 = table_segment(b, ["o_orderkey"], precision_overrides={"t": 0})
    r = diff_tables(t1, t2, algorithm="hashdiff")
    assert r.df.count() == 0
    r.unpersist()


def test_unify_reports_and_strict(orders):
    a = orders.select("o_orderkey", F.col("o_totalprice").alias("x"))
    b = orders.select("o_orderkey", F.col("o_orderdate").alias("x"))
    t1 = table_segment(a, ["o_orderkey"])
    t2 = table_segment(b, ["o_orderkey"])
    with pytest.raises(TypeError, match="Incompatible"):
        unify_precisions(t1, t2, strict=True)
    # non-strict warns and leaves overrides alone
    u1, u2 = unify_precisions(t1, t2, strict=False)
    assert not u1.precision_overrides and not u2.precision_overrides


def test_column_precision_defaults(spark):
    from pyspark.sql import types as T

    assert column_precision(T.TimestampType()) == 6
    assert column_precision(T.DecimalType(15, 3)) == 3
    assert column_precision(T.DoubleType()) == 6
    assert column_precision(T.LongType()) == 0
    assert column_precision(T.StringType()) is None
    assert column_precision(T.TimestampType(), override=2) == 2
