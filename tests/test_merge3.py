"""Three-way diff/merge (operators/merge3.py): full classification
matrix, conflict policies, equivalence with sequential apply_diff on
disjoint changes at orders scale, and versioned-table branch merge."""

import pytest
from pyspark.sql import functions as F

from data_diff_spark.diff import apply_diff, diff_tables
from data_diff_spark.operators.merge3 import diff3, merge3, merge_versions
from data_diff_spark.table import table_segment


@pytest.fixture()
def trio(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"), (6, "f"), (7, "g")],
        "k int, v string",
    )
    ours = spark.createDataFrame(
        [(1, "a"),            # unchanged
         (2, "B_ours"),       # ours-only update
         (3, "c"),            # theirs will update
         # 4 deleted by ours
         (5, "E_same"),       # both same update
         (6, "F_ours"),       # conflict: both update differently
         (7, "g"),            # theirs deletes -> theirs-only
         (8, "new_ours"),     # ours-only insert
         (10, "dup")],        # both insert SAME row
        "k int, v string",
    )
    theirs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "C_theirs"), (4, "d"),
         (5, "E_same"), (6, "F_theirs"),
         (9, "new_theirs"), (10, "dup")],
        "k int, v string",
    )
    seg = lambda df: table_segment(df, ["k"])
    return seg(base), seg(ours), seg(theirs)


def test_diff3_classification(trio):
    d = {r["k"]: r["merge_status"] for r in diff3(*trio).collect()}
    assert d == {
        1: "unchanged", 2: "ours", 3: "theirs", 4: "ours", 5: "both_same",
        6: "conflict", 7: "theirs", 8: "ours", 9: "theirs", 10: "both_same",
    }


def test_merge3_raises_then_prefers(trio):
    with pytest.raises(ValueError, match="1 conflicting"):
        merge3(*trio)
    merged = {r["k"]: r["v"] for r in merge3(*trio, prefer="theirs").collect()}
    assert merged == {
        1: "a", 2: "B_ours", 3: "C_theirs", 5: "E_same",
        6: "F_theirs", 8: "new_ours", 9: "new_theirs", 10: "dup",
    }  # 4 deleted by ours, 7 deleted by theirs
    assert merge3(*trio, prefer="ours").filter("k = 6").collect()[0]["v"] == "F_ours"


def test_disjoint_merge_equals_sequential_apply(spark, sf_dir):
    """When the two sides touch DISJOINT key sets, merge3 must equal
    applying both pairwise diffs in sequence — cross-checked against the
    already-verified diff_tables/apply_diff machinery."""
    base = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    ours = base.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 == 1, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice")),
    )
    theirs = base.filter(F.col("o_orderkey") % 10 != 2)  # deletes, disjoint
    seg = lambda df: table_segment(df, ["o_orderkey"])
    merged = merge3(seg(base), seg(ours), seg(theirs))

    d1 = diff_tables(seg(base), seg(ours))
    step1 = apply_diff(base, d1.df, ["o_orderkey"])
    d2 = diff_tables(seg(base), seg(theirs))
    # disjoint key sets -> the second diff applies cleanly to the first result
    want = apply_diff(step1, d2.df, ["o_orderkey"])
    assert merged.exceptAll(want).count() == 0
    assert want.exceptAll(merged).count() == 0
    d1.unpersist(); d2.unpersist()


def test_merge_versions_branches(spark, tmp_path):
    """Two 'branches' = two versioned roots forked from the same v1;
    merge_versions reconciles a commit from each against the fork point."""
    from data_diff_spark.sources import versioned as V

    df = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    root = str(tmp_path / "t")
    V.create_table(df, root, ["k"])  # v1 = fork point
    V.commit(
        df.withColumn("v", F.when(F.col("k") == 1, "ours").otherwise(F.col("v"))),
        root,
    )  # v2 = ours
    V.commit(
        V.read_version(spark, root, 1)  # branch from the fork point again
        .withColumn("v", F.when(F.col("k") == 2, "theirs").otherwise(F.col("v"))),
        root,
        checkpoint_ratio=1.0,
    )  # v3 = theirs (committed on the same log; diff3 only needs the frames)
    merged = merge_versions(spark, root, 1, 2, 3)
    got = {r["k"]: r["v"] for r in merged.collect()}
    assert got[1] == "ours" and got[2] == "theirs" and got[3] == "x"
    assert len(got) == 10
