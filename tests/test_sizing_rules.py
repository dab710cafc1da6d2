"""Pure-function pins for the r8 sizing rules — no Spark session.

bounded_stream_sizing: the ONE rule replacing the stream-gate two-point
fits (VERDICT r7 Next #8); _auto_ann_bands: ann_topk_lsh's occupancy
rule; _auto_bands cap: ADVICE r7 (bands explosion at moderate
thresholds)."""

import logging

from data_diff_spark.operators.similarity import _auto_ann_bands, _auto_bands
from data_diff_spark.streaming.events_stream import (
    ROWS_PER_BATCH,
    ROWS_PER_STATE_TASK,
    bounded_stream_sizing,
)


def test_bounded_stream_sizing_known_points():
    # the three corpora that exist: driver sf0.01/sf0.1, the sf1.0 probe
    assert bounded_stream_sizing(60_000, 32) == (2, 8)
    assert bounded_stream_sizing(600_000, 32) == (2, 12)
    assert bounded_stream_sizing(6_000_000, 32) == (3, 32)


def test_bounded_stream_sizing_monotone_and_bounded():
    prev_b = prev_s = 0
    for n in (1, 10_000, 100_000, 1_000_000, 10_000_000, 100_000_000):
        b, s = bounded_stream_sizing(n, 32)
        assert 2 <= b <= 8          # floor: state crossing; ceiling: overhead
        assert 8 <= s <= 32         # floor: skew spread; ceiling: cores
        assert b >= prev_b and s >= prev_s
        prev_b, prev_s = b, s
    # per-batch payload never collapses below the target once data is big
    b, s = bounded_stream_sizing(100_000_000, 32)
    assert 100_000_000 / b >= ROWS_PER_BATCH
    assert (100_000_000 / b) / s >= ROWS_PER_STATE_TASK


def test_auto_ann_bands_occupancy_rule():
    # rows_per_band grows ~log2(n/occupancy): candidates per bucket stay
    # ~constant as the corpus grows (the r7 fixed 8x4 put 1/16 of ANY
    # corpus in every bucket)
    b1, r1 = _auto_ann_bands(2_000)
    b2, r2 = _auto_ann_bands(20_000)
    b3, r3 = _auto_ann_bands(20_000_000)
    assert b1 == b2 == b3 == 8
    assert (r1, r2) == (5, 9) and r3 > r2
    # expected bucket occupancy within 2x of target at each size
    for n, r in ((2_000, r1), (20_000, r2), (20_000_000, r3)):
        occ = n / 2 ** r
        assert 16 <= occ <= 128


def test_auto_bands_cap_binds_with_warning(caplog):
    # threshold 0.8 at 22k rows wants ~446 bands for miss<=1e-8 (ADVICE
    # r7) — the cap must bind, loudly, naming the achieved miss
    with caplog.at_level(logging.WARNING):
        bands, r = _auto_bands(22_000, 0.8)
    assert bands == 128
    assert any("capping" in rec.message for rec in caplog.records)
    # the high-threshold operating point the gate uses stays uncapped
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        bands99, _ = _auto_bands(2_200, 0.99)
    assert bands99 < 128
    assert not caplog.records
