"""Diff operator behavior — mirrors the reference's test strategy
(/root/reference/tests/test_diff_tables.py, tests/test_joindiff.py;
fixture shapes from FIXTURES.md F1-F7)."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark import diff_tables, table_segment
from data_diff_spark.operators.joindiff import (
    check_duplicate_keys,
    check_null_keys,
    count_diff_per_column,
    join_diff,
)
from data_diff_spark.operators.hashdiff import hash_diff

ALGOS = ["joindiff", "hashdiff"]


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def make_ratings(spark, rows):
    return spark.createDataFrame(
        rows, "id bigint, userid bigint, movieid bigint, rating double"
    )


BASE = [(1, 1, 1, 9.0), (2, 2, 2, 9.0), (3, 3, 3, 9.0), (4, 4, 4, 9.0)]


@pytest.mark.parametrize("algo", ALGOS)
def test_basic_diff(spark, algo):
    a = make_ratings(spark, BASE)
    b = make_ratings(spark, BASE[:-1] + [(4, 4, 4, 8.5)])  # one update
    b = b.union(make_ratings(spark, [(5, 5, 5, 9.0)]))     # one insert
    r = diff_tables(table_segment(a, ["id"]), table_segment(b, ["id"]), algorithm=algo)
    got = _sorted_rows(r.df)
    assert got == sorted(
        [("-", 4, 4, 4, 9.0), ("+", 4, 4, 4, 8.5), ("+", 5, 5, 5, 9.0)]
    )


@pytest.mark.parametrize("algo", ALGOS)
def test_empty_tables(spark, algo):
    a = make_ratings(spark, BASE)
    empty = make_ratings(spark, []).filter("id < 0")
    r = diff_tables(table_segment(a, ["id"]), table_segment(empty, ["id"]), algorithm=algo)
    assert r.df.count() == len(BASE)
    assert set(x[0] for x in r.df.collect()) == {"-"}
    r2 = diff_tables(table_segment(empty, ["id"]), table_segment(empty, ["id"]), algorithm=algo)
    assert r2.df.count() == 0


@pytest.mark.parametrize("algo", ALGOS)
def test_no_diff_is_empty(spark, algo):
    a = make_ratings(spark, BASE)
    b = make_ratings(spark, BASE)
    r = diff_tables(table_segment(a, ["id"]), table_segment(b, ["id"]), algorithm=algo)
    assert r.df.count() == 0


@pytest.mark.parametrize("algo", ALGOS)
def test_nulls_in_values(spark, algo):
    # FIXTURES F5: NULL vs value must register as a diff; NULL==NULL must not.
    a = spark.createDataFrame([(1, None), (2, "x"), (3, None)], "id int, c1 string")
    b = spark.createDataFrame([(1, None), (2, None), (3, "y")], "id int, c1 string")
    r = diff_tables(table_segment(a, ["id"]), table_segment(b, ["id"]), algorithm=algo)
    got = _sorted_rows(r.df)
    assert got == sorted(
        [("-", 2, "x"), ("+", 2, None), ("-", 3, None), ("+", 3, "y")]
    )


@pytest.mark.parametrize("algo", ALGOS)
def test_null_adjacent_concat(spark, algo):
    # ('a', NULL) vs ('a|<null>'-style collision trap): a row ("a", None)
    # and a row ("a|<null>", ...) must not collide because the NULL literal
    # is injected after normalization per-column.
    a = spark.createDataFrame([(1, "x", None)], "id int, c1 string, c2 string")
    b = spark.createDataFrame([(1, "x|<null>", None)], "id int, c1 string, c2 string")
    r = diff_tables(table_segment(a, ["id"]), table_segment(b, ["id"]), algorithm=algo)
    assert r.df.count() == 2  # they differ


@pytest.mark.parametrize("algo", ALGOS)
def test_compound_keys(spark, algo):
    # FIXTURES F7: compound PK; changing part of the key = exclusive rows.
    rows = [(i, i * 2, f"c{i}") for i in range(100)]
    a = spark.createDataFrame(rows, "id bigint, id2 bigint, comment string")
    rows2 = list(rows)
    rows2[50] = (50, 9000, "c50")
    b = spark.createDataFrame(rows2, "id bigint, id2 bigint, comment string")
    r = diff_tables(
        table_segment(a, ["id", "id2"]), table_segment(b, ["id", "id2"]), algorithm=algo
    )
    got = _sorted_rows(r.df)
    assert got == sorted([("-", 50, 100, "c50"), ("+", 50, 9000, "c50")])


def test_duplicate_pk_semantics_hashdiff(spark):
    # FIXTURES F6 / reference diff_sets (hashdiff_tables.py:62-69):
    # src [(12,'ABCDE')×2]; dst [(4,'ABCDEF'),(4,'ABCDE')×2,(6,'ABCDE')×3]
    a = spark.createDataFrame([(12, "ABCDE"), (12, "ABCDE")], "id int, data string")
    b = spark.createDataFrame(
        [(4, "ABCDEF"), (4, "ABCDE"), (4, "ABCDE"), (6, "ABCDE"), (6, "ABCDE"), (6, "ABCDE")],
        "id int, data string",
    )
    d = hash_diff(table_segment(a, ["id"]), table_segment(b, ["id"]))
    got = _sorted_rows(d)
    # every PK has dup/exclusive rows on some side → everything is emitted
    assert got == sorted(
        [("-", 12, "ABCDE"), ("-", 12, "ABCDE"),
         ("+", 4, "ABCDEF"), ("+", 4, "ABCDE"), ("+", 4, "ABCDE"),
         ("+", 6, "ABCDE"), ("+", 6, "ABCDE"), ("+", 6, "ABCDE")]
    )


def test_emit_equal_duplicates_compat_mode(spark):
    # Reference diff_sets: "Either side has 2+ rows → yield it all regardless
    # of values" — reproduced when the PK's segment (bucket) is downloaded.
    # n_buckets=1 puts the real diff and the equal-dup PK in one bucket.
    a = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")], "id int, data string")
    b = spark.createDataFrame([(1, "x"), (1, "x"), (2, "z")], "id int, data string")
    d = hash_diff(table_segment(a, ["id"]), table_segment(b, ["id"]),
                  n_buckets=1, emit_equal_duplicates=True)
    got = _sorted_rows(d)
    assert got == sorted(
        [("-", 1, "x"), ("-", 1, "x"), ("+", 1, "x"), ("+", 1, "x"),
         ("-", 2, "y"), ("+", 2, "z")]
    )
    # default mode: only the truly-differing PK
    d2 = hash_diff(table_segment(a, ["id"]), table_segment(b, ["id"]), n_buckets=1)
    assert _sorted_rows(d2) == sorted([("-", 2, "y"), ("+", 2, "z")])


def test_duplicate_pk_equal_multisets_pruned(spark):
    # In the reference, a segment whose count+checksum digests match is
    # pruned BEFORE diff_sets runs (hashdiff_tables.py:210-212), so equal
    # duplicate multisets are never emitted. Same here: the bucket digest
    # (count, sum) matches → pruned.
    a = spark.createDataFrame([(1, "x"), (1, "x")], "id int, data string")
    b = spark.createDataFrame([(1, "x"), (1, "x")], "id int, data string")
    d = hash_diff(table_segment(a, ["id"]), table_segment(b, ["id"]))
    assert d.count() == 0


def test_differing_column_names(spark):
    # reference test_diff_tables.py:306-348 — columns matched by position.
    a = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id int, rating double")
    b = spark.createDataFrame([(1, 10.0), (2, 21.0)], "id int, rating_new double")
    t1 = table_segment(a, ["id"], extra_columns=["rating"])
    t2 = table_segment(b, ["id"], extra_columns=["rating_new"])
    d = join_diff(t1, t2)
    got = _sorted_rows(d)
    assert got == sorted([("-", 2, 20.0), ("+", 2, 21.0)])
    assert d.columns == ["sign", "id", "rating"]


def test_cross_type_comparison(spark):
    # decimal vs double with same logical values → zero diff (FIXTURES F8).
    a = spark.createDataFrame([(1, 1.5), (2, 0.1)], "id int, v double")
    b = spark.sql("select * from values (1, 1.5BD), (2, 0.1BD) as t(id, v)") \
        .select("id", F.col("v").cast("decimal(10,2)").alias("v"))
    t1 = table_segment(a, ["id"], precision_overrides={"v": 2})
    t2 = table_segment(b, ["id"], precision_overrides={"v": 2})
    assert join_diff(t1, t2).count() == 0


def test_validate_unique_and_null_keys(spark):
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "id int, v string")
    with pytest.raises(ValueError, match="duplicate"):
        check_duplicate_keys(table_segment(dup, ["id"]))
    withnull = spark.createDataFrame([(None, "a"), (2, "b")], "id int, v string")
    with pytest.raises(ValueError, match="NULL"):
        check_null_keys(table_segment(withnull, ["id"]))
    cleaned = check_null_keys(table_segment(withnull, ["id"]), skip=True)
    assert cleaned.count() == 1


def test_update_column_window(spark):
    # FIXTURES F2: min_update/max_update restriction.
    import datetime as dt

    rows = [
        (1, dt.datetime(2022, 1, 1), "a"),
        (2, dt.datetime(2022, 6, 1), "b"),
        (3, dt.datetime(2023, 1, 1), "c"),
    ]
    a = spark.createDataFrame(rows, "id int, updated timestamp, v string")
    b = spark.createDataFrame(rows[:-1], "id int, updated timestamp, v string")
    t1 = table_segment(a, ["id"], update_column="updated",
                       min_update=dt.datetime(2022, 3, 1))
    t2 = table_segment(b, ["id"], update_column="updated",
                       min_update=dt.datetime(2022, 3, 1))
    d = join_diff(t1, t2)
    got = _sorted_rows(d)
    assert got == [("-", 3, dt.datetime(2023, 1, 1), "c")]


def test_key_range_restriction(spark):
    a = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id int, v string")
    t = table_segment(a, ["id"], min_key=(3,), max_key=(7,))
    assert t.count() == 4  # [3, 7)
    lo, hi = t.query_key_range()
    assert lo == (3,) and hi == (6,)


def test_per_column_diff_counts(spark):
    a = spark.createDataFrame([(1, "x", 1.0), (2, "y", 2.0)], "id int, s string, v double")
    b = spark.createDataFrame([(1, "x", 1.5), (2, "z", 2.0)], "id int, s string, v double")
    row = count_diff_per_column(table_segment(a, ["id"]), table_segment(b, ["id"])).collect()[0]
    assert row["diff_s"] == 1 and row["diff_v"] == 1
    assert row["exclusive_a"] == 0 and row["exclusive_b"] == 0


def test_hashdiff_narrow_persist_equals_wide(spark, sf_dir):
    """persist='narrow' (keys+checksums cached, emitted keys re-read via
    semi-join) must emit the exact multiset the wide path emits — exercised
    on the dup-key compound-key lineitem workload."""
    from data_diff_spark.workload import _lineitem_segments

    t1, t2 = _lineitem_segments(spark, sf_dir)
    wide = hash_diff(t1, t2, n_buckets=256, persist="wide")
    narrow = hash_diff(t1, t2, n_buckets=256, persist="narrow")
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, wide.collect())) == sorted(map(key, narrow.collect()))
    with pytest.raises(ValueError, match="persist"):
        hash_diff(t1, t2, persist="bogus")
    # r13: the narrow path's phase-2 key decision is a hash AGGREGATION
    # (map-side partial agg, no sort), never the wide path's
    # window-over-union — pin the plan shape so it cannot silently
    # regress to the window form
    narrow_plan = narrow._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in narrow_plan
    wide_plan = wide._jdf.queryExecution().executedPlan().toString()
    assert "Window" in wide_plan


def test_stats_dict(spark):
    a = make_ratings(spark, BASE)
    b = make_ratings(spark, BASE[1:] + [(4, 4, 4, 8.5)][:0] + [(9, 9, 9, 1.0)])
    r = diff_tables(table_segment(a, ["id"]), table_segment(b, ["id"]))
    s = r.get_stats_dict()
    assert s["rows_A"] == 4 and s["rows_B"] == 4
    assert s["exclusive_A"] == 1 and s["exclusive_B"] == 1
    assert s["updated"] == 0
    assert s["unchanged"] == 3
    r.unpersist()


def test_stats_dict_updated_pairs(spark):
    """A changed value is an update (a PK-matched -/+ pair), not two
    exclusives."""
    a = make_ratings(spark, BASE)
    changed = [BASE[0][:3] + (99.0,)] + BASE[1:]
    b = make_ratings(spark, changed)
    r = diff_tables(table_segment(a, ["id"]), table_segment(b, ["id"]))
    s = r.get_stats_dict()
    assert s["updated"] == 1
    assert s["exclusive_A"] == 0 and s["exclusive_B"] == 0
    assert s["total"] == 2
    r.unpersist()


def test_stats_dict_single_diff_aggregation(spark):
    """The stats path must run the diff plan ONCE: one fused aggregation
    job over the persisted diff + the two base-table counts (VERDICT r1:
    the old path recomputed the full outer join up to 4x)."""
    a = make_ratings(spark, BASE)
    b = make_ratings(spark, BASE[1:])
    r = diff_tables(table_segment(a, ["id"]), table_segment(b, ["id"]))
    sc = spark.sparkContext
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # 1 job per action
    sc.setJobGroup("stats-path", "stats job counting")
    try:
        r.get_stats_dict()
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    ids = sc.statusTracker().getJobIdsForGroup("stats-path")
    assert 0 < len(ids) <= 3, f"stats ran {len(ids)} jobs"
    r.unpersist()


def test_apply_diff_roundtrip_both_algorithms(spark, sf_dir):
    """apply_diff(A, diff(A, B)) == B, for joindiff and hashdiff output."""
    from data_diff_spark import diff_tables, table_segment
    from data_diff_spark.diff import apply_diff
    from data_diff_spark.workload import MODIFIED_ORDERS_SQL, ORDERS_COLS, load_views

    load_views(spark, sf_dir)
    a = spark.table("orders").select(*ORDERS_COLS)
    b = spark.sql(MODIFIED_ORDERS_SQL)
    for algo in ("joindiff", "hashdiff"):
        t1 = table_segment(a, ["o_orderkey"], extra_columns=ORDERS_COLS[1:])
        t2 = table_segment(b, ["o_orderkey"], extra_columns=ORDERS_COLS[1:])
        d = diff_tables(t1, t2, algorithm=algo).df
        applied = apply_diff(a, d, ["o_orderkey"])
        assert applied.exceptAll(b).count() == 0
        assert b.exceptAll(applied).count() == 0


def test_fine_level_large_id_set_stays_jvm_side(spark, monkeypatch):
    """r12 sf10 finding: with a ~2% uniform diff rate the fine level's
    mismatched-bucket set reaches millions of ids, and the old
    collect() + createDataFrame ping-pong serialized them through py4j
    twice (flagged SUPERLINEAR at 60M rows/side). Large sets now
    broadcast-join the id FRAME JVM-side. Force every branch on a small
    corpus by shrinking the thresholds and pin identical output:
    literal-InSet path, broadcast-join path, plain-join path, and the
    fully-dirty skip."""
    from data_diff_spark.operators import hashdiff as H
    from data_diff_spark.table import table_segment

    a = spark.range(0, 4000).selectExpr("id", "cast(id * 7 as string) as data")
    b = spark.range(0, 4000).selectExpr(
        "id", "cast(id * 7 + cast(id % 50 = 3 as int) as string) as data")
    t1, t2 = table_segment(a, ["id"]), table_segment(b, ["id"])
    expect = _sorted_rows(hash_diff(t1, t2))  # default path (no fine level)
    assert len(expect) == 2 * 80  # 80 keys differ, both sides emitted

    monkeypatch.setattr(H, "_FINE_LEVEL_MIN_ROWS", 0)
    for isin_limit, bkeys_limit in (
        (8192, 2_000_000),  # small set: literal InSet probe
        (1, 2_000_000),     # large set: broadcast the id frame
        (1, 1),             # too big to broadcast: plain left-semi (AQE)
    ):
        monkeypatch.setattr(H, "_ISIN_LIMIT", isin_limit)
        monkeypatch.setattr(H, "_BROADCAST_KEYS_LIMIT", bkeys_limit)
        d = hash_diff(t1, t2)
        assert _sorted_rows(d) == expect, (isin_limit, bkeys_limit)
        for h in d._ddspark_persisted:
            h.unpersist(True)
    # fully-dirty fine set prunes nothing and is skipped: every row
    # differs, so with tiny buckets every fine bucket mismatches
    monkeypatch.setattr(H, "_ISIN_LIMIT", 1)
    monkeypatch.setattr(H, "_AUTO_ROWS_PER_BUCKET", 1 << 40)
    c = spark.range(0, 100).selectExpr("id", "cast(id + 1 as string) as data")
    d2 = hash_diff(table_segment(a.limit(100), ["id"]), table_segment(c, ["id"]))
    assert d2.count() == 200
