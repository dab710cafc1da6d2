"""Validation rules + profiler (operators/validate.py) against known
testdata facts and a DuckDB recomputation."""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.validate import (
    accepted_values,
    in_range,
    matches,
    not_null,
    profile,
    relationship,
    unique,
    validate,
)


def test_rules_on_orders(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    report = validate(orders, [
        not_null("o_orderkey"),
        unique("o_orderkey"),
        not_null("o_totalprice"),
        accepted_values("o_orderstatus", ["O", "F", "P"]),
        in_range("o_totalprice", 0, 1e9),
        matches("o_orderpriority", r"\d-[A-Z ]+"),
        relationship("o_custkey", customer, "c_custkey"),
    ])
    rows = {r["rule"]: r for r in report.collect()}
    assert all(r["passed"] for r in rows.values()), rows
    # cross-check two counts against DuckDB directly
    con = duckdb.connect()
    dup = con.execute(
        f"select count(*) - count(distinct o_orderkey) from "
        f"read_parquet('{sf_dir}/orders.parquet')").fetchone()[0]
    assert rows["unique(o_orderkey)"]["n_failed"] == dup == 0


def test_rules_catch_failures(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (1, "b", -2), (None, "zz", 3), (4, None, 100)],
        "k int, s string, v int",
    )
    ref = spark.createDataFrame([(1,), (4,)], "rk int")
    rows = {r["rule"]: r for r in validate(df, [
        not_null("k"),                      # 1 null
        unique("k"),                        # one duplicated k=1 -> 1
        accepted_values("s", ["a", "b"]),   # 'zz' -> 1 (NULL ignored)
        in_range("v", 0, 10),               # -2 and 100 -> 2
        matches("s", "[ab]"),               # 'zz' -> 1 (NULL ignored)
        relationship("k", ref, "rk"),       # all non-null k in ref -> 0
    ]).collect()}
    want = {
        "not_null(k)": 1, "unique(k)": 1, "accepted_values(s)": 1,
        "in_range(v)": 2, "matches(s)": 1, "relationship(k -> rk)": 0,
    }
    for rule, n in want.items():
        assert rows[rule]["n_failed"] == n, rule
        assert rows[rule]["passed"] == (n == 0)


def test_profile_matches_duckdb(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    prof = {r["column"]: r for r in
            profile(orders, ["o_orderkey", "o_totalprice", "o_orderstatus"],
                    exact=True).collect()}
    con = duckdb.connect()
    want = con.execute(f"""
        select count(o_orderkey), count(distinct o_orderkey),
               min(o_totalprice), max(o_totalprice), avg(o_totalprice),
               count(distinct o_orderstatus)
        from read_parquet('{sf_dir}/orders.parquet')
    """).fetchone()
    assert prof["o_orderkey"]["count"] == want[0]
    assert prof["o_orderkey"]["distinct"] == want[1]
    assert float(prof["o_totalprice"]["min"]) == pytest.approx(want[2])
    assert float(prof["o_totalprice"]["max"]) == pytest.approx(want[3])
    assert prof["o_totalprice"]["mean"] == pytest.approx(want[4])
    assert prof["o_orderstatus"]["distinct"] == want[5]
    assert prof["o_orderkey"]["nulls"] == 0
