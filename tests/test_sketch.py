"""HLL distinct-count sketches (operators/sketch.py): error bounds vs
exact NDV, lossless mergeability, incremental refresh semantics."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.sketch import (
    distinct_rollup,
    estimate_union,
    refresh_distinct_rollup,
)


@pytest.fixture(scope="module")
def orders_rollup(spark, orders):
    return distinct_rollup(
        orders, by=["o_orderstatus"], cols=["o_custkey", "o_orderpriority"]
    ).persist()


def test_estimates_within_bounds(spark, orders, orders_rollup):
    exact = {
        r.o_orderstatus: (r.nd_cust, r.nd_prio)
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("nd_cust"),
            F.countDistinct("o_orderpriority").alias("nd_prio"),
        )
        .collect()
    }
    got = {
        r.o_orderstatus: (r.o_custkey__ndv, r.o_orderpriority__ndv, r.n_rows)
        for r in orders_rollup.collect()
    }
    assert set(got) == set(exact)
    total = orders.count()
    assert sum(g[2] for g in got.values()) == total
    for k, (ec, ep) in exact.items():
        gc, gp, _ = got[k]
        # lg_k=12 -> ~1.6% RSE; allow 5% (3*RSE) — and tiny-cardinality
        # columns (5 priorities) must be EXACT (HLL sparse mode)
        assert abs(gc - ec) <= max(2, 0.05 * ec)
        assert gp == ep


def test_merge_is_lossless(spark, orders):
    """estimate(sketch(A) ∪ sketch(B)) == estimate(sketch(A ∪ B)): merging
    sketches is algebraically exact, not a second approximation."""
    a = orders.filter("o_orderkey % 2 = 0")
    b = orders.filter("o_orderkey % 2 = 1")
    whole = distinct_rollup(orders, ["o_orderstatus"], ["o_custkey"])
    ra = distinct_rollup(a, ["o_orderstatus"], ["o_custkey"])
    merged = refresh_distinct_rollup(ra, b, ["o_orderstatus"], ["o_custkey"])
    want = {(r.o_orderstatus, r.o_custkey__ndv, r.n_rows) for r in whole.collect()}
    got = {(r.o_orderstatus, r.o_custkey__ndv, r.n_rows) for r in merged.collect()}
    assert got == want


def test_refresh_new_group_appears_untouched_passthrough(spark):
    base = spark.createDataFrame(
        [(d, u) for d in ("d1", "d2") for u in range(50)], "day string, uid long"
    )
    roll = distinct_rollup(base, ["day"], ["uid"]).persist()
    batch = spark.createDataFrame(
        [("d2", u) for u in range(40, 90)] + [("d3", u) for u in range(10)],
        "day string, uid long",
    )
    out = {r.day: (r.uid__ndv, r.n_rows)
           for r in refresh_distinct_rollup(roll, batch, ["day"], ["uid"]).collect()}
    assert out["d1"] == (50, 50)          # untouched group unchanged
    assert out["d2"] == (90, 100)         # 0..89 distinct, 50+50 rows
    assert out["d3"] == (10, 10)          # new group appears
    # sequential refreshes == one-shot (associativity over real data)
    two_step = refresh_distinct_rollup(
        refresh_distinct_rollup(roll, batch.filter("day = 'd3'"), ["day"], ["uid"]),
        batch.filter("day = 'd2'"), ["day"], ["uid"],
    )
    assert {r.day: (r.uid__ndv, r.n_rows) for r in two_step.collect()} == out


def test_deletes_refused(spark):
    df = spark.createDataFrame([("d1", 1)], "day string, uid long")
    roll = distinct_rollup(df, ["day"], ["uid"])
    with pytest.raises(ValueError, match="insert-only"):
        refresh_distinct_rollup(roll, df, ["day"], ["uid"], deletes=df)


def test_estimate_union_range_query(spark):
    """Per-day sketches answer an arbitrary day-range NDV without the
    fact table: overlapping user sets must not double-count."""
    rows = [(f"d{d}", u) for d in range(5) for u in range(d * 50, d * 50 + 100)]
    df = spark.createDataFrame(rows, "day string, uid long")
    roll = distinct_rollup(df, ["day"], ["uid"]).persist()
    out = estimate_union(roll, ["uid"], where=F.col("day").isin("d1", "d2")).collect()[0]
    # d1 = 50..149, d2 = 100..199 -> 150 distinct, 200 rows
    assert out.n_rows == 200
    assert abs(out.uid__ndv - 150) <= max(2, 0.05 * 150)
    allr = estimate_union(roll, ["uid"]).collect()[0]
    assert allr.n_rows == 500
    assert abs(allr.uid__ndv - 300) <= max(2, 0.05 * 300)
