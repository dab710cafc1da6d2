"""Salted aggregation / join equivalence tests (heavily skewed key)."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0
    return spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") * 3 % 1000).alias("v"),
    )


def test_salted_agg_equals_plain(skewed):
    plain = {
        tuple(r)[:1] + tuple(r)[1:]
        for r in skewed.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sv"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        ).collect()
    }
    salted = {
        tuple(r)
        for r in salted_agg(
            skewed, ["k"],
            [("v", "count", "n"), ("v", "sum", "sv"), ("v", "min", "mn"), ("v", "max", "mx")],
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame([(k, f"name{k}") for k in range(7)], "k int, name string")
    plain = sorted(map(tuple, skewed.join(dim, ["k"]).collect()))
    salted = sorted(map(tuple, salted_join(skewed, dim, ["k"]).collect()))
    assert salted == plain


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([(0, "zero")], "k int, name string")
    plain = sorted(map(tuple, skewed.join(dim, ["k"], "left").collect()))
    salted = sorted(map(tuple, salted_join(skewed, dim, ["k"], how="left").collect()))
    assert salted == plain


def test_salted_agg_rejects_non_algebraic(skewed):
    with pytest.raises(ValueError, match="algebraic"):
        salted_agg(skewed, ["k"], [("v", "avg", "a")])
