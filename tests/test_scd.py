"""SCD2 merge (operators/scd.py): semantics units, a DuckDB SQL replay
oracle over orders-scale data, and plan shape."""

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.scd import merge_scd2

TS = datetime.datetime


@pytest.fixture()
def dim(spark):
    rows = [
        # k, v, valid_from, valid_to, is_current
        (1, "a", TS(2020, 1, 1), None, True),           # will change
        (1, "a0", TS(2019, 1, 1), TS(2020, 1, 1), False),  # history
        (2, "b", TS(2020, 1, 1), None, True),           # unchanged observation
        (3, "c", TS(2020, 1, 1), None, True),           # no observation
    ]
    return spark.createDataFrame(
        rows, "k int, v string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


@pytest.fixture()
def changes(spark):
    rows = [
        (1, "a1", TS(2021, 6, 1)),   # real change
        (1, "aX", TS(2021, 1, 1)),   # superseded by the later observation
        (2, "b", TS(2021, 6, 1)),    # equal attributes -> no-op
        (9, "new", TS(2021, 6, 1)),  # brand-new key
    ]
    return spark.createDataFrame(rows, "k int, v string, effective_ts timestamp")


def test_scd2_semantics(dim, changes):
    out = merge_scd2(dim, changes, keys=["k"]).collect()
    by = {}
    for r in out:
        by.setdefault(r["k"], []).append(r)
    # k=1: history row + closed old-current + new current version
    k1 = sorted(by[1], key=lambda r: r["valid_from"])
    assert [(r["v"], r["valid_to"], r["is_current"]) for r in k1] == [
        ("a0", TS(2020, 1, 1), False),
        ("a", TS(2021, 6, 1), False),   # closed at the LATEST observation
        ("a1", None, True),             # aX (earlier) lost the dedupe
    ]
    # k=2: unchanged -> single untouched current row
    assert [(r["v"], r["is_current"]) for r in by[2]] == [("b", True)]
    # k=3: no observation -> untouched
    assert [(r["v"], r["is_current"]) for r in by[3]] == [("c", True)]
    # k=9: first version, open-ended
    assert [(r["v"], r["valid_from"], r["valid_to"], r["is_current"]) for r in by[9]] == [
        ("new", TS(2021, 6, 1), None, True)
    ]


def test_scd2_null_attribute_transitions(spark):
    """NULL -> value and value -> NULL are real changes (null-safe
    compare); NULL -> NULL is not."""
    dim = spark.createDataFrame(
        [(1, None, TS(2020, 1, 1), None, True),
         (2, None, TS(2020, 1, 1), None, True),
         (3, "x", TS(2020, 1, 1), None, True)],
        "k int, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    ch = spark.createDataFrame(
        [(1, "v", TS(2021, 1, 1)), (2, None, TS(2021, 1, 1)), (3, None, TS(2021, 1, 1))],
        "k int, v string, effective_ts timestamp",
    )
    out = merge_scd2(dim, ch, keys=["k"])
    cur = {r["k"]: r["v"] for r in out.filter("is_current").collect()}
    assert cur == {1: "v", 2: None, 3: None}
    closed = {r["k"] for r in out.filter("not is_current").collect()}
    assert closed == {1, 3}  # k=2 NULL->NULL was a no-op


ORACLE_SQL = """
with latest as (
  select k, v, effective_ts from (
    select c.*, row_number() over (partition by k order by effective_ts desc) rn
    from changes c) t where rn = 1
),
cur as (select * from dim where is_current),
hist as (select * from dim where not is_current),
j as (select cur.k as dk, cur.v as dv, cur.valid_from, l.k as ck, l.v as cv, l.effective_ts
      from cur full outer join latest l on cur.k = l.k)
select * from hist
union all
select dk, dv, valid_from, cast(null as timestamp), true
from j where dk is not null and (ck is null or not (dv is distinct from cv))
union all
select dk, dv, valid_from, effective_ts, false
from j where dk is not null and ck is not null and (dv is distinct from cv)
union all
select ck, cv, effective_ts, cast(null as timestamp), true
from j where ck is not null and (dk is null or (dv is distinct from cv))
"""


def test_scd2_oracle_replay_orders_scale(spark, sf_dir):
    """merge_scd2 over an orders-derived dimension hash-matches an
    independent DuckDB SQL replay of the same semantics."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    dim = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("v"),
        F.lit(TS(2020, 1, 1)).cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = orders.select(
        F.col("o_orderkey").alias("k"),
        # ~half the keys flip status; the rest observe the same value
        F.when(F.col("o_orderkey") % 2 == 0, F.lit("Z"))
        .otherwise(F.col("o_orderstatus")).alias("v"),
        F.lit(TS(2021, 6, 1)).cast("timestamp").alias("effective_ts"),
    ).unionByName(
        spark.createDataFrame(
            [(10_000_001, "N", TS(2021, 6, 1))], "k long, v string, effective_ts timestamp"
        )
    )
    got = sorted(
        map(tuple, merge_scd2(dim, changes, keys=["k"]).collect())
    )
    con = duckdb.connect()
    con.register("dim", dim.toPandas())
    con.register("changes", changes.toPandas())
    want = sorted(map(tuple, con.execute(ORACLE_SQL).fetchall()))
    assert got == want


def test_scd2_single_join_no_cartesian(dim, changes):
    from tests.test_plans import plan_of

    plan = plan_of(merge_scd2(dim, changes, keys=["k"]))
    # formatted explain lists each operator in the tree AND as a detail
    # heading ") SortMergeJoin" — count headings: exactly ONE join, not one
    # per union branch (the naive 3-branch union re-executes the join 3x)
    joins = plan.count(") SortMergeJoin") + plan.count(") BroadcastHashJoin")
    assert joins == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


from hypothesis import HealthCheck, given, settings, strategies as st

_KV = st.lists(
    st.tuples(st.integers(0, 6), st.sampled_from(["a", "b", "c", None])),
    min_size=0, max_size=8,
)


@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(obs=_KV)
def test_scd2_invariants_fuzz(spark, obs):
    """Random observation batches preserve the SCD2 invariants: at most
    one current row per key; every closed row's valid_to equals some later
    version's valid_from for that key; current rows have null valid_to."""
    dim = spark.createDataFrame(
        [(k, "init", TS(2019, 1, 1), None, True) for k in range(3)],
        "k int, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    # one batch: effective_ts varies per row index so dedupe-latest engages
    rows = [(k, v, TS(2021, 1, 1 + i % 27)) for i, (k, v) in enumerate(obs)]
    if rows:
        ch = spark.createDataFrame(rows, "k int, v string, effective_ts timestamp")
        dim = merge_scd2(dim, ch, keys=["k"])
    out = dim.collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, rs in by_key.items():
        currents = [r for r in rs if r["is_current"]]
        assert len(currents) == 1, (k, rs)
        assert currents[0]["valid_to"] is None
        closed_to = sorted(r["valid_to"] for r in rs if not r["is_current"])
        froms = sorted(r["valid_from"] for r in rs)
        for vt in closed_to:
            assert vt in froms, (k, rs)  # every close hands off to a version
