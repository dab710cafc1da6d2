"""Hierarchical DIFFERENTIAL DCT frames (T.81 SOF5/SOF6 huffman,
SOF13/SOF14 arithmetic) — the last T.81 process family.

Fixture generator: functions/jpeg.py:encode_jpeg_hierarchical_dct (a
mirror coder — libjpeg never implemented Annex J, so no conforming
hierarchical encoder exists anywhere; same honesty status as the SOF11
and lossless-pyramid mirror coders). The pyramid's final stage is a
differential LOSSLESS correction frame, which Annex J's process mixing
permits and which makes the full roundtrip BIT-EXACT regardless of the
DCT stages' quantization — so these tests pin exact equality, not a
tolerance. The encoder computes every residual against the decoder's
own `_reconstruct_planes` output (closed loop), which is what makes the
final correction exact.

Normative behaviors under test: zero DC prediction in differential
frames (F.1.1.5.1 / G.1.2.1), no level shift in differential DCT frames
(A.3.1), the J.1.1.6 clamp of reference+difference, EXP expansion
between stages, and the SOF6 progressive scan kinds over difference
coefficients."""

import numpy as np
import pytest

from data_diff_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_hierarchical_dct,
)


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    # smooth gradient + structure + noise: exercises both big DC ranges
    # and dense AC coefficients in the residual frames
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * np.sin(yy / 9.0) + 48 * np.cos(xx / 7.0)
    img = base + rng.integers(-24, 25, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(32, 32), (40, 24), (17, 23)])
def test_roundtrip_sof5_sequential(shape):
    img = _img(*shape)
    data = encode_jpeg_hierarchical_dct(img, levels=2)
    assert b"\xff\xc5" in data  # differential sequential DCT frame
    assert b"\xff\xde" in data and b"\xff\xdf" in data  # DHP + EXP
    assert b"\xff\xc7" in data  # final lossless correction
    out = decode_jpeg(data)
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("shape", [(32, 32), (25, 33)])
def test_roundtrip_sof6_progressive(shape):
    img = _img(*shape, seed=11)
    data = encode_jpeg_hierarchical_dct(img, levels=2, progressive=True)
    assert b"\xff\xc6" in data  # differential progressive DCT frame
    out = decode_jpeg(data)
    np.testing.assert_array_equal(out, img)


def test_three_levels_and_coarse_quant():
    """Aggressive quantization in the DCT stages must not break
    exactness — the final lossless stage corrects whatever error the
    lossy stages leave (bigger corrections, same exact result)."""
    img = _img(48, 40, seed=3)
    for q in (1, 8, 32):
        data = encode_jpeg_hierarchical_dct(img, levels=3, quant=q)
        np.testing.assert_array_equal(decode_jpeg(data), img)
    # coarser quant -> DCT stages carry less -> correction carries more;
    # streams must still both decode exactly (sizes just differ)
    d1 = encode_jpeg_hierarchical_dct(img, levels=3, quant=1)
    d32 = encode_jpeg_hierarchical_dct(img, levels=3, quant=32)
    assert len(d1) != len(d32)


def test_single_level_is_base_plus_correction():
    img = _img(16, 16, seed=5)
    data = encode_jpeg_hierarchical_dct(img, levels=1)
    assert b"\xff\xc5" not in data  # no differential DCT stage at levels=1
    np.testing.assert_array_equal(decode_jpeg(data), img)


def test_differential_dct_requires_reference():
    """A bare SOF5 frame with no DHP/reference must be rejected loudly."""
    img = _img(16, 16)
    data = encode_jpeg_hierarchical_dct(img, levels=2)
    # find the SOF5 frame and splice it into a fresh stream without DHP
    i = data.index(b"\xff\xc5")
    spliced = b"\xff\xd8" + data[i:]
    with pytest.raises(ValueError, match="differential frame without"):
        decode_jpeg(spliced)


def test_subsampled_differential_dct_rejected():
    """The guard names the unsupported variant instead of mis-decoding."""
    img = _img(16, 16)
    data = bytearray(encode_jpeg_hierarchical_dct(img, levels=2))
    i = data.index(b"\xff\xc5")
    # frame payload: len(2) prec(1) H(2) W(2) nc(1) [cid hv tq] — set
    # hv to 2x2 sampling
    data[i + 2 + 2 + 5 + 2] = 0x22
    with pytest.raises(NotImplementedError, match="subsampled differential"):
        decode_jpeg(bytes(data))


def test_color_input_rejected():
    with pytest.raises(ValueError, match="greyscale"):
        encode_jpeg_hierarchical_dct(np.zeros((8, 8, 3), dtype=np.uint8))


def test_dqt_between_pyramid_frames_is_not_retroactive():
    """r10 ADVICE: frames latched the LIVE quant-table dict, but
    hierarchical DCT frames reconstruct lazily in _hier_apply at the NEXT
    frame's SOF — a DQT redefining a table between pyramid frames (legal,
    Annex J) retroactively dequantized the previous frame with the new
    table. Splice a garbage DQT for table 0 right before the final
    frame's SOF: every preceding DCT stage already latched its tables (at
    its first SOS), so the decode must stay bit-exact."""
    img = _img(32, 32, seed=13)
    data = encode_jpeg_hierarchical_dct(img, levels=2)
    sof7 = data.index(b"\xff\xc7")
    garbage_dqt = b"\xff\xdb\x00\x43\x00" + bytes([255] * 64)
    spliced = data[:sof7] + garbage_dqt + data[sof7:]
    np.testing.assert_array_equal(decode_jpeg(spliced), img)
    # and before the differential DCT stage: the BASE frame must likewise
    # keep the table it was scanned with
    sof5 = data.index(b"\xff\xc5")
    spliced2 = data[:sof5] + garbage_dqt + data[sof5:]
    # frame 2 (SOF5) references table 0 too — decoding it with the
    # garbage table is "correct" per the latch rule (the DQT precedes its
    # SOS), but the final lossless correction was computed against the
    # encoder's closed loop, so only the BASE frame's integrity is
    # observable: the stream must still parse and the base frame must not
    # have been re-dequantized (decode raises nothing and the result
    # differs from img only through the now-mismatched correction).
    out2 = decode_jpeg(spliced2)
    assert out2.shape == img.shape
