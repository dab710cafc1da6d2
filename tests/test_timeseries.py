"""Subsequence matching (functions/timeseries.py) vs a numpy brute-force
oracle: planted patterns found, z-norm invariance, flat-segment
conventions, events-table scale."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_diff_spark.functions.timeseries import subsequence_match


def _brute(series_by_key, query):
    """[(key, start_idx->ts, dist)] for every length-m subsequence."""
    q = np.asarray(query, dtype=float)
    qz = (q - q.mean()) / q.std() if q.std() else np.zeros_like(q)
    out = []
    for key, (tss, vals) in series_by_key.items():
        v = np.asarray(vals, dtype=float)
        m = len(q)
        for i in range(len(v) - m + 1):
            s = v[i:i + m]
            sd = s.std()
            if sd == 0:
                d = 0.0 if not q.std() else float("inf")
            else:
                d = float(np.sqrt((((s - s.mean()) / sd - qz) ** 2).sum()))
            out.append((key, tss[i], d))
    return sorted(out, key=lambda t: (t[2], t[0], t[1]))


def test_planted_pattern_is_top_match(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(0, 1, 200).round(3)
    pattern = [0.0, 5.0, -5.0, 5.0, 0.0]
    # plant an amplitude-scaled + offset copy at position 100 (z-norm must
    # still find it at distance ~0)
    base[100:105] = np.array(pattern) * 3.0 + 42.0
    rows = [(1, i, float(v)) for i, v in enumerate(base)]
    df = spark.createDataFrame(rows, "k int, ts int, value double")
    got = subsequence_match(df, pattern, ts_col="ts", by=["k"], top_k=3).collect()
    assert got[0]["start_ts"] == 100
    assert got[0]["dist"] == pytest.approx(0.0, abs=1e-9)


def test_matches_numpy_bruteforce_multikey(spark):
    rng = np.random.default_rng(11)
    series = {k: (list(range(60)), list(rng.normal(0, 1, 60).round(3))) for k in (1, 2, 3)}
    rows = [(k, t, float(v)) for k, (tss, vals) in series.items() for t, v in zip(tss, vals)]
    df = spark.createDataFrame(rows, "k int, ts int, value double")
    query = [1.0, -1.0, 2.0, 0.5, -0.5, 1.5]
    got = subsequence_match(df, query, ts_col="ts", by=["k"], top_k=8).collect()
    want = _brute(series, query)[:8]
    assert [(r["k"], r["start_ts"]) for r in got] == [(k, t) for k, t, _ in want]
    for r, (_, _, d) in zip(got, want):
        assert r["dist"] == pytest.approx(d, rel=1e-9)


def test_flat_conventions(spark):
    rows = [(1, i, 5.0) for i in range(6)] + [(2, i, float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "k int, ts int, value double")
    # non-flat query: flat subsequences must NEVER match (inf distance)
    got = subsequence_match(df, [0.0, 1.0, 2.0], ts_col="ts", by=["k"], top_k=4).collect()
    assert all(r["k"] == 2 for r in got)
    # flat query: flat subsequences match at 0
    got2 = subsequence_match(df, [7.0, 7.0, 7.0], ts_col="ts", by=["k"], top_k=2).collect()
    assert all(r["k"] == 1 and r["dist"] == 0.0 for r in got2)


def test_events_scale_smoke(spark, sf_dir):
    from data_diff_spark.sources.connect import normalize_event_ts

    ev = normalize_event_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    # deduplicate (user_id, ts) so window order is total (operator contract)
    ev = ev.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    got = subsequence_match(
        ev, [0.0, 1.0, 0.0, -1.0], ts_col="ts", value_col="value",
        by=["user_id"], top_k=5,
    ).collect()
    assert len(got) == 5
    assert all(np.isfinite(r["dist"]) for r in got)
    assert got == sorted(got, key=lambda r: r["dist"])
