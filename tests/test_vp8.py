"""Native VP8 (lossy WebP) decoder conformance (functions/vp8.py).

The oracle is the system libwebp: fixtures are libwebp-ENCODED real VP8
key-frame bitstreams, and the pin is BIT-EXACT equality of the (Y, U, V)
planes against WebPDecodeYUV — the normative RFC 6386 decoder output. VP8
reconstruction is exact integer arithmetic, so any deviation is a decoder
bug, never rounding. The fixture families are chosen to force distinct
bitstream features through the decoder:

  noise             -> B_PRED sub-modes, dense tokens, all coefficient bands
  smooth gradients  -> 16x16 modes, Y2/WHT path, skip MBs
  mixed content     -> segmentation (libwebp enables segments on complex
                       images), per-segment quantizers + filter strengths
  quality sweep     -> every dequant regime incl. loop filter level 0..63
  odd sizes         -> cropping, right/bottom partial MBs, above-right
                       replication at the frame edge
"""

import numpy as np
import pytest

from data_diff_spark.functions import webp as W
from data_diff_spark.functions.vp8 import decode_vp8

pytestmark = pytest.mark.skipif(
    W.libwebp() is None, reason="libwebp.so not present (oracle + encoder)"
)


def payload(wb: bytes) -> bytes:
    i = 12
    while i < len(wb):
        tag, size = wb[i:i + 4], int.from_bytes(wb[i + 4:i + 8], "little")
        if tag == b"VP8 ":
            return wb[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def assert_conformant(img, q):
    data = W.encode_webp_lossy(img, q)
    yo, uo, vo = W.decode_webp_yuv_libwebp(data)
    y, u, v = decode_vp8(payload(data))
    assert np.array_equal(y, yo), f"Y plane differs (q={q}, {img.shape})"
    assert np.array_equal(u, uo), f"U plane differs (q={q}, {img.shape})"
    assert np.array_equal(v, vo), f"V plane differs (q={q}, {img.shape})"


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 16), (15, 16),
                                   (17, 19), (33, 31), (48, 64), (127, 129)])
def test_noise_sizes(shape):
    img = np.random.default_rng(sum(shape)).integers(
        0, 256, shape + (3,), dtype=np.uint8)
    assert_conformant(img, 60)


@pytest.mark.parametrize("q", [0, 5, 25, 50, 75, 95, 100])
def test_quality_sweep(q):
    img = np.random.default_rng(q).integers(0, 256, (40, 56, 3), dtype=np.uint8)
    assert_conformant(img, q)


def test_smooth_gradient_y2_and_skip():
    x, y = np.linspace(0, 255, 64), np.linspace(0, 255, 48)
    img = np.stack(np.meshgrid(x, y) + [np.add.outer(y, x) / 2],
                   axis=-1).astype(np.uint8)
    for q in (30, 75):
        assert_conformant(img, q)


def test_mixed_content_segmentation():
    """libwebp turns segmentation ON for this half-smooth/half-noise image
    (verified in the header) — exercises segment map decode, per-segment
    quantizers, and per-segment loop filter strengths."""
    rng = np.random.default_rng(11)
    img = np.zeros((96, 128, 3), np.uint8)
    img[:48] = (np.add.outer(np.linspace(0, 255, 48),
                             np.linspace(0, 255, 128)) / 2)[..., None].astype(np.uint8)
    img[48:] = rng.integers(0, 256, (48, 128, 3), dtype=np.uint8)
    for q in (20, 45, 75):
        data = W.encode_webp_lossy(img, q)
        pl = payload(data)
        from data_diff_spark.functions.vp8 import BoolDecoder
        bd = BoolDecoder(pl[10:])
        bd.bit(), bd.bit()
        assert bd.bit() == 1, "fixture no longer triggers segmentation"
        yo, uo, vo = W.decode_webp_yuv_libwebp(data)
        y, u, v = decode_vp8(pl)
        assert np.array_equal(y, yo) and np.array_equal(u, uo) and np.array_equal(v, vo)


def test_structured_content():
    checker = (np.add.outer(np.arange(64) // 4, np.arange(64) // 4) % 2 * 255
               ).astype(np.uint8)
    assert_conformant(np.stack([checker] * 3, axis=-1), 85)
    rng = np.random.default_rng(9)
    x, y = np.linspace(0, 255, 96), np.linspace(0, 255, 80)
    base = np.add.outer(y, x) / 2
    photo = np.clip(np.stack([base, 255 - base, (base + 77) % 256], axis=-1)
                    + rng.normal(0, 12, (80, 96, 3)), 0, 255).astype(np.uint8)
    assert_conformant(photo, 70)


def test_decode_webp_native_fallback(monkeypatch):
    """Without libwebp, decode_webp must decode lossy containers fully
    natively (VP8 + BT.601 conversion) with a stable RGBA contract."""
    img = np.random.default_rng(3).integers(0, 256, (24, 40, 3), dtype=np.uint8)
    data = W.encode_webp_lossy(img, 70)
    y, u, v = W.decode_webp_yuv(data)  # native, container-level entry
    monkeypatch.setattr(W, "_LIB", None)
    monkeypatch.setattr(W, "_LIB_TRIED", True)
    rgba = W.decode_webp(data)
    assert rgba.shape == (24, 40, 4) and rgba.dtype == np.uint8
    assert (rgba[:, :, 3] == 255).all()
    assert np.array_equal(rgba[:, :, :3], W.yuv420_to_rgb(y, u, v))


def test_error_paths():
    with pytest.raises(ValueError):
        decode_vp8(b"\x00" * 4)  # truncated
    img = np.zeros((16, 16, 3), np.uint8)
    pl = bytearray(payload(W.encode_webp_lossy(img, 75)))
    good = bytes(pl)
    pl[0] |= 1  # frame_type -> inter
    with pytest.raises(NotImplementedError, match="inter frame"):
        decode_vp8(bytes(pl))
    pl = bytearray(good)
    pl[3] = 0x00  # break the start code
    with pytest.raises(ValueError, match="start code"):
        decode_vp8(bytes(pl))


def test_tables_structural():
    """The RFC 6386 constant tables: shapes, probability ranges, and the
    quantizer tables' documented endpoints/monotonicity."""
    from data_diff_spark.functions import vp8_tables as T

    assert len(T.COEFF_PROBS) == 4 * 8 * 3 * 11
    assert len(T.COEFF_UPDATE_PROBS) == 4 * 8 * 3 * 11
    assert len(T.KF_BMODE_PROBS) == 10 * 10 * 9
    assert all(1 <= b <= 255 for b in T.COEFF_PROBS)
    assert all(1 <= b <= 255 for b in T.COEFF_UPDATE_PROBS)
    assert all(1 <= b <= 255 for b in T.KF_BMODE_PROBS)
    assert len(T.DC_QLOOKUP) == 128 and len(T.AC_QLOOKUP) == 128
    assert T.DC_QLOOKUP[0] == 4 and T.DC_QLOOKUP[127] == 157
    assert T.AC_QLOOKUP[0] == 4 and T.AC_QLOOKUP[127] == 284
    assert all(a <= b for a, b in zip(T.DC_QLOOKUP, T.DC_QLOOKUP[1:]))
    assert all(a <= b for a, b in zip(T.AC_QLOOKUP, T.AC_QLOOKUP[1:]))


@pytest.mark.parametrize("table,index", [
    ("COEFF_UPDATE_PROBS", 0), ("KF_BMODE_PROBS", 5), ("DC_QLOOKUP", 75),
])
def test_table_mutation_breaks_conformance(table, index, monkeypatch):
    """The conformance pins genuinely exercise the transcribed tables:
    corrupting one entry must break bit-exactness (same honesty contract
    as the VP8L distance-map mutation tests). COEFF_UPDATE_PROBS drives
    1056 header decisions per frame, so any entry is load-bearing;
    COEFF_PROBS defaults are partly overwritten by header updates, which
    is itself evidence the update path is exercised."""
    import data_diff_spark.functions.vp8 as vp8mod

    img = np.random.default_rng(1).integers(0, 256, (32, 32, 3), dtype=np.uint8)
    data = W.encode_webp_lossy(img, 60)
    ref = W.decode_webp_yuv_libwebp(data)
    orig = getattr(vp8mod, table)
    mutated = bytearray(orig)
    if table == "DC_QLOOKUP":
        # the stream's quantizer index is data-dependent; shift every
        # entry so the mutation is guaranteed on the decode path
        mutated = bytearray(min(b + 2, 157) for b in orig)
    else:
        mutated[index] = (mutated[index] % 254) + 1  # different, still valid
    monkeypatch.setattr(vp8mod, table, bytes(mutated))
    try:
        got = decode_vp8(payload(data))
        same = all(np.array_equal(a, b) for a, b in zip(got, ref))
    except Exception:
        same = False  # a crash is also "detected"
    assert not same, f"mutating {table}[{index}] went undetected"
