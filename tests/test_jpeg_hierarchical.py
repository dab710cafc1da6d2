"""Hierarchical JPEG (T.81 Annex J): DHP/EXP marker handling, the
J.1.1.2 expansion filter, differential lossless frames (SOF7), and the
multi-level pyramid reconstruction — pinned by round-trips through the
in-module mirror encoder (encode_jpeg_hierarchical; no conforming
hierarchical encoder exists anywhere — libjpeg never implemented
Annex J — so the encoder is the fixture generator, same status as the
SOF11 mirror coder in test_jpeg_lossless_arith.py).

No Spark session: pure codec tests, sub-second.
"""

import numpy as np
import pytest

from data_diff_spark.functions.jpeg import (
    _expand_plane,
    decode_jpeg,
    encode_jpeg_hierarchical,
)


def _img(h, w, channels=0, seed=0x9E3779B9):
    """Deterministic test image: gradient + hash noise, no RNG."""
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 7 + xx * 3) % 251
    noise = ((yy * 2654435761 + xx * 40503 + seed) >> 7) % 37
    img = ((base + noise) % 256).astype(np.uint8)
    if channels:
        return np.stack([(img + 31 * c) % 256 for c in range(channels)],
                        axis=-1).astype(np.uint8)
    return img


# --- expansion filter ---------------------------------------------------


def test_expand_plane_interpolation_and_edges():
    p = [[10, 20], [30, 40]]
    got = _expand_plane(p, 1, 1)
    # even samples copy; odd interpolate (a+b+1)>>1; edges replicate
    assert got[0] == [10, 15, 20, 20]
    assert got[2] == [30, 35, 40, 40]
    # vertical interpolation of the two surrounding expanded rows
    assert got[1] == [(10 + 30 + 1) >> 1, (15 + 35 + 1) >> 1,
                      (20 + 40 + 1) >> 1, (20 + 40 + 1) >> 1]
    assert got[3] == got[2]  # bottom edge replicates


def test_expand_plane_single_direction():
    p = [[1, 4]]
    assert _expand_plane(p, 1, 0) == [[1, 3, 4, 4]]
    assert _expand_plane(p, 0, 1) == [[1, 4], [1, 4]]


# --- round-trips ---------------------------------------------------------


@pytest.mark.parametrize("shape", [(16, 16), (15, 17), (8, 9), (1, 7)])
def test_roundtrip_grey_two_levels(shape):
    img = _img(*shape)
    data = encode_jpeg_hierarchical(img, levels=2)
    out = decode_jpeg(data)
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_roundtrip_rgb():
    img = _img(12, 14, channels=3)
    data = encode_jpeg_hierarchical(img, levels=2)
    out = decode_jpeg(data)
    assert np.array_equal(out, img)


def test_roundtrip_three_levels_and_single_level():
    img = _img(21, 19)
    for levels in (1, 2, 3):
        out = decode_jpeg(encode_jpeg_hierarchical(img, levels=levels))
        assert np.array_equal(out, img), f"levels={levels}"
    # predictor 2 (Rb) first-frame variant
    out = decode_jpeg(encode_jpeg_hierarchical(img, levels=2, predictor=2))
    assert np.array_equal(out, img)


def test_stream_structure():
    data = encode_jpeg_hierarchical(_img(16, 16), levels=3)
    assert b"\xff\xde" in data          # DHP
    assert data.count(b"\xff\xdf") == 2  # one EXP per differential frame
    assert b"\xff\xc3" in data          # non-differential lossless frame
    assert data.count(b"\xff\xc7") == 2  # two differential frames


def test_extreme_differences_hit_ssss16():
    """A black reduced level expanded against a white full level forces
    large difference magnitudes through the high SSSS categories."""
    img = np.zeros((8, 8), dtype=np.uint8)
    img[::2, ::2] = 255  # decimation keeps the white pixels
    out = decode_jpeg(encode_jpeg_hierarchical(img, levels=2))
    assert np.array_equal(out, img)


# --- malformed streams ---------------------------------------------------


def test_differential_frame_without_reference_rejected():
    good = encode_jpeg_hierarchical(_img(8, 8), levels=2)
    # strip everything between DHP and the EXP marker: the differential
    # frame then has no decoded reference
    dhp_end = good.index(b"\xff\xde")
    exp = good.index(b"\xff\xdf")
    bad = good[:dhp_end] + good[good.index(b"\xff\xde"):exp][:0] + good[exp:]
    # simpler: just drop the first frame entirely
    first_sof = good.index(b"\xff\xc3")
    bad = good[:first_sof] + good[exp:]
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_exp_without_frames_rejected():
    img = _img(8, 8)
    good = encode_jpeg_hierarchical(img, levels=2)
    exp = good.index(b"\xff\xdf")
    first_sof = good.index(b"\xff\xc3")
    bad = good[:first_sof] + good[exp:exp + 3] + good[first_sof:]
    with pytest.raises(ValueError):
        decode_jpeg(bad)


def test_plain_sof7_outside_hierarchy_rejected():
    good = encode_jpeg_hierarchical(_img(8, 8), levels=2)
    dhp = good.index(b"\xff\xde")
    dhp_len = int.from_bytes(good[dhp + 2:dhp + 4], "big")
    bad = good[:dhp] + good[dhp + 2 + dhp_len:]  # remove the DHP segment
    with pytest.raises(ValueError):
        decode_jpeg(bad)


# --- arithmetic differential frames (SOF15) -------------------------------


def _encode_hier_arith(img, predictor=1):
    """Hierarchical ARITHMETIC lossless pyramid fixture: DHP + SOF11
    non-differential reduced frame + EXP + SOF15 differential frame.
    Reuses the mirror QM coder pinned against libjpeg's DCT arithmetic
    path (test_jpeg_lossless_arith)."""
    import struct

    from test_jpeg_lossless_arith import _QMEnc, _encode_diff, _seg

    a = np.asarray(img).astype(np.int64)
    h, w = a.shape
    lo, hi = (1 << 0) >> 1, (1 << 1) >> 1  # default conditioning L=0, U=1

    def frame_payload(hh, ww):
        return bytes([8]) + struct.pack(">HH", hh, ww) + bytes([1, 1, 0x11, 0])

    def frame_segs(p, differential):
        hh, ww = p.shape
        out = _seg(0xCF if differential else 0xCB, frame_payload(hh, ww))
        out += _seg(0xDA, bytes([1, 1, 0x00])
                    + bytes([0 if differential else predictor, 0, 0]))
        enc = _QMEnc()
        stats = bytearray(158)
        cat_above = [0] * ww
        for y in range(hh):
            cat_left = 0
            for x in range(ww):
                if differential:
                    pred = 0
                elif y == 0 and x == 0:
                    pred = 128
                elif y == 0:
                    pred = p[y][x - 1]
                elif x == 0:
                    pred = p[y - 1][x]
                else:
                    pred = p[y][x - 1] if predictor == 1 else p[y - 1][x]
                diff = (int(p[y][x]) - int(pred)) & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                cat = _encode_diff(enc, stats, cat_left, cat_above[x],
                                   diff, lo, hi)
                cat_left = cat_above[x] = cat
        return out + enc.flush()

    reduced = a[::2, ::2]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDE, frame_payload(h, w))
    out += frame_segs(reduced, differential=False)
    out += _seg(0xDF, bytes([0x11]))
    expanded = np.array(_expand_plane(reduced.tolist(), 1, 1),
                        dtype=np.int64)[:h, :w]
    out += frame_segs(a - expanded, differential=True)
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("shape", [(16, 16), (13, 11)])
def test_roundtrip_arith_differential_sof15(shape):
    img = _img(*shape)
    out = decode_jpeg(_encode_hier_arith(img))
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_mixed_entropy_pyramid():
    """Annex J allows mixing entropy coders across frames: a huffman SOF3
    first frame with an arithmetic SOF15 differential stage (and the
    huffman pyramid already covers SOF3+SOF7). Build the mixed stream by
    splicing: huffman level-0 frame from encode_jpeg_hierarchical's
    1-level stream, then EXP + SOF15 from the arith fixture."""
    import struct

    img = _img(12, 10)
    reduced = img[::2, ::2]
    huff = encode_jpeg_hierarchical(reduced, levels=1)
    # strip SOI/EOI and the DHP of the 1-level stream, keep DHT+SOF3+SOS+data
    dhp = huff.index(b"\xff\xde")
    dhp_len = int.from_bytes(huff[dhp + 2:dhp + 4], "big")
    body = huff[dhp + 2 + dhp_len:-2]
    arith = _encode_hier_arith(img)
    exp = arith.index(b"\xff\xdf")
    h, w = img.shape
    out = (b"\xff\xd8"
           + b"\xff\xde" + struct.pack(">H", 11) + bytes([8])
           + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
           + body + arith[exp:])
    got = decode_jpeg(bytes(out))
    assert np.array_equal(got, img)
