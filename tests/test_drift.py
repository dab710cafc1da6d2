"""Drift report (operators/drift.py): identical tables show ~0 drift, a
shifted numeric column and a re-weighted categorical column are flagged,
PSI cross-checked against a numpy recomputation."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_diff_spark.operators.drift import N_HASH_BUCKETS, _EPS, drift_report


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    # yield-and-unpersist: a leaked cache of this path makes Spark's
    # CacheManager substitute the InMemoryRelation into OTHER tests' scans
    # of the same file (observed: test_plans' PushedFilters pin)
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").persist()
    yield df
    df.unpersist()


def test_identical_tables_no_drift(orders):
    rep = drift_report(orders, orders).collect()
    assert len(rep) > 0
    for r in rep:
        assert not r["drifted"], r
        assert r["value"] == pytest.approx(0.0, abs=1e-9)


def test_shifted_and_reweighted_columns_flagged(orders):
    mutated = orders.withColumn(
        "o_totalprice", F.col("o_totalprice") * 3 + 100000
    ).withColumn(
        "o_orderstatus", F.lit("F")  # collapse the categorical to one value
    )
    rep = {r["column"]: r for r in drift_report(orders, mutated).collect()}
    assert rep["o_totalprice"]["drifted"] and rep["o_totalprice"]["metric"] == "psi"
    assert rep["o_orderstatus"]["drifted"] and rep["o_orderstatus"]["metric"] == "tvd_hash64"
    # untouched numeric key distribution: not drifted
    assert not rep["o_orderkey"]["drifted"]


def test_null_rate_shift_reported(spark):
    a = spark.createDataFrame([(i, float(i)) for i in range(100)], "id int, v double")
    b = spark.createDataFrame(
        [(i, float(i) if i % 2 else None) for i in range(100)], "id int, v double"
    )
    rep = {r["column"]: r for r in drift_report(a, b).collect()}
    assert rep["v"]["null_rate_a"] == 0.0
    assert rep["v"]["null_rate_b"] == pytest.approx(0.5)


def test_psi_matches_numpy(spark):
    rng = np.random.default_rng(3)
    x1 = rng.normal(0, 1, 4000)
    x2 = rng.normal(0.8, 1.3, 4000)  # genuinely shifted
    a = spark.createDataFrame([(float(v),) for v in x1], "v double")
    b = spark.createDataFrame([(float(v),) for v in x2], "v double")
    n_bins = 20
    got = drift_report(a, b, n_bins=n_bins).collect()[0]
    lo, hi = min(x1.min(), x2.min()), max(x1.max(), x2.max())
    w = (hi - lo) / n_bins
    bins = np.clip(((np.r_[x1, x2] - lo) / w).astype(int), 0, n_bins - 1)
    b1, b2 = bins[: len(x1)], bins[len(x1):]
    psi = 0.0
    for i in range(n_bins):
        p = (b1 == i).mean() + _EPS
        q = (b2 == i).mean() + _EPS
        psi += (p - q) * math.log(p / q)
    assert got["value"] == pytest.approx(psi, rel=1e-9)
    assert got["drifted"]
    assert N_HASH_BUCKETS == 64  # contract pinned for the hash-TVD metric
