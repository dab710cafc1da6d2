"""Gate-machinery tests for workload._must_equal (r13 single sign-tagged
aggregate) and the checkpoint-block release shim.

The r13 gate replaces each verification arm's exceptAll PAIR
(p.exceptAll(a) ∪ a.exceptAll(p) — Spark rewrites each leg to its own
union + count-aggregate + ReplicateRows, i.e. two full-row-tuple shuffles
of both arms per arm) with ONE aggregate over the tagged union that emits
each distinct row n_p + Σ|n_p − n_aᵢ| times. These tests pin (a) the
multiset identity to the old shape on every divergence class, (b) the
one-Exchange plan, and (c) that checkpoint blocks ride the deterministic
release contract.
"""

import pytest
from pyspark.sql import Row, functions as F

from data_diff_spark.workload import _CkptRelease, _must_equal


def _old_gate(p, *others):
    out = p
    for a in others:
        a = a.select(*p.columns)
        out = out.unionAll(p.exceptAll(a)).unionAll(a.exceptAll(p))
    return out


def _ms(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def frames(spark):
    mk = lambda rows: spark.createDataFrame(rows, "k int, v string")
    p = mk([(1, "a"), (1, "a"), (2, "b"), (3, None)])
    return mk, p


@pytest.mark.parametrize("case", [
    "equal-dups", "subset", "spurious", "dupcount", "twoarms", "emptyarm",
])
def test_gate_multiset_identical_to_exceptall_pair(frames, case):
    """Every divergence class — missing rows (a silent subset must NOT
    pass), spurious rows, duplicate-count drift, multiple arms, empty
    arm — produces the exact multiset the old exceptAll pair did."""
    mk, p = frames
    arms = {
        "equal-dups": [mk([(2, "b"), (1, "a"), (3, None), (1, "a")])],
        "subset": [mk([(1, "a"), (2, "b"), (3, None)])],
        "spurious": [mk([(1, "a"), (1, "a"), (2, "b"), (3, None), (9, "z")])],
        "dupcount": [mk([(1, "a"), (1, "a"), (1, "a"), (2, "b"), (3, None)])],
        "twoarms": [mk([(2, "b"), (1, "a"), (3, None), (1, "a")]),
                    mk([(1, "a"), (2, "b")])],
        "emptyarm": [mk([(0, "x")]).filter("false")],
    }[case]
    assert _ms(_old_gate(p, *arms)) == _ms(_must_equal(p, *arms))


def test_gate_divergence_changes_row_count(frames):
    """The driver's correctness check is row-count + content hash: any arm
    divergence must CHANGE the gate's row count vs the all-equal case."""
    mk, p = frames
    equal = mk([(1, "a"), (1, "a"), (2, "b"), (3, None)])
    diverged = mk([(1, "a"), (2, "b"), (3, None)])  # silent subset
    assert _must_equal(p, equal).count() == p.count()
    assert _must_equal(p, diverged).count() > p.count()


def test_gate_plan_single_exchange(spark):
    """The gate compiles to ONE shuffle (partial+final count aggregate over
    the tagged union) regardless of arm count — the old shape paid two
    exceptAll aggregations (each with its own Exchange pair) per arm."""
    p = spark.range(100).select(F.col("id").cast("int").alias("k"))
    a = spark.range(100).select(F.col("id").cast("int").alias("k"))
    b = spark.range(100).select(F.col("id").cast("int").alias("k"))
    plan = _must_equal(p, a, b)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("HashAggregate") == 2, plan  # partial + final


def test_gate_single_arm_passthrough(spark):
    """No verification arms -> the primary is returned untouched (no
    aggregate, no shuffle)."""
    p = spark.range(10)
    assert _must_equal(p) is p


def test_ckpt_release_frees_blocks(spark):
    """_CkptRelease must free a localCheckpoint's MEMORY_AND_DISK blocks
    through the same .unpersist() contract persisted handles use — without
    it, checkpoint blocks accumulate for the whole 50-entry bench session
    (r12 ADVICE)."""
    df = spark.range(50000).withColumn("v", F.col("id") * 2)
    d = df.localCheckpoint(eager=False)
    h = _CkptRelease(d)
    d.count()
    sc = spark.sparkContext
    names_before = len(sc._jsc.sc().getRDDStorageInfo())
    assert names_before >= 1
    h.unpersist(True)
    assert len(sc._jsc.sc().getRDDStorageInfo()) < names_before


def test_merge3_entry_tracks_checkpoint_handle(spark, sf_dir):
    """q_merge3_orders' diff3 classification stays localCheckpoint'd (it is
    genuinely multi-referenced); its blocks must ride the entry's release
    handles so _with_cache_release frees them between bench entries."""
    from data_diff_spark.workload import q_merge3_orders

    out = q_merge3_orders(spark, sf_dir)
    handles = getattr(out, "_ddspark_persisted", [])
    assert any(isinstance(h, _CkptRelease) for h in handles), handles
