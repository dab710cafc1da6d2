"""Arithmetic differential DCT frames (T.81 SOF13 sequential / SOF14
progressive) — the arithmetic twins of tests/test_jpeg_hier_dct.py,
completing the T.81 process matrix.

The G.1 DCT statistical models' DECODE side is pinned bit-exactly
against libjpeg on SOF9/SOF10 (tests/test_jpeg_arith.py); the QM
encoder below reuses tests/test_jpeg_lossless_arith._QMEnc (itself
pinned against the same decoder) and mirrors the decoder's
dc_decode/ac_decode_block control flow decision-for-decision — zero DC
prediction in differential frames per G.1.2.1. The pyramid's final
stage is a HUFFMAN differential lossless frame (mixing entropy coders
between stages is exercised by the r9 mixed-entropy pyramid test), so
roundtrips are BIT-EXACT."""

import struct

import numpy as np
import pytest

from data_diff_spark.functions import jpeg as J
from test_jpeg_lossless_arith import _QMEnc


def _enc_dc(enc, stats, dc_context, ci, v, L=0, U=1):
    """Mirror of _decode_scan_coeffs_arith.dc_decode (F.1.4.1/F.1.4.4.1),
    value-in instead of value-out; updates the conditioning context."""
    base = dc_context[ci]
    if v == 0:
        enc.encode(stats, base, 0)
        dc_context[ci] = 0
        return
    enc.encode(stats, base, 1)
    sign = 1 if v < 0 else 0
    enc.encode(stats, base + 1, sign)
    sz = (-v if sign else v) - 1
    stp = base + 2 + sign
    m = 0
    if sz == 0:
        enc.encode(stats, stp, 0)
    else:
        enc.encode(stats, stp, 1)
        m = 1
        stp = 20  # the DC chain moves to X1 immediately (Table F.4)
        while sz >= (m << 1):
            enc.encode(stats, stp, 1)
            m <<= 1
            stp += 1
        enc.encode(stats, stp, 0)
    if m < (1 << L) >> 1:
        dc_context[ci] = 0
    elif m > (1 << U) >> 1:
        dc_context[ci] = 12 + sign * 4
    else:
        dc_context[ci] = 4 + sign * 4
    stp += 14
    mm = m >> 1
    while mm:
        enc.encode(stats, stp, 1 if sz & mm else 0)
        mm >>= 1


def _enc_ac_band(enc, stats, fixed, zz, kmin=1, kmax=63, kx=5):
    """Mirror of ac_decode_block (G.1.3.2): EOB decision per index,
    zero-run decisions, fixed-bin sign, magnitude chain with the k<=kx
    low/high split."""
    nz = [k for k in range(kmin, kmax + 1) if zz[k] != 0]
    last = nz[-1] if nz else None
    k = kmin
    while last is not None and k <= last:
        stp = 3 * (k - 1)
        enc.encode(stats, stp, 0)  # not EOB at this index
        while zz[k] == 0:
            enc.encode(stats, stp + 1, 0)
            stp += 3
            k += 1
        enc.encode(stats, stp + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        stp += 2
        sz = abs(v) - 1
        m = 0
        if sz == 0:
            enc.encode(stats, stp, 0)
        else:
            enc.encode(stats, stp, 1)
            m = 1
            if sz >= 2:
                enc.encode(stats, stp, 1)
                m = 2
                stp = 189 if k <= kx else 217
                while sz >= (m << 1):
                    enc.encode(stats, stp, 1)
                    m <<= 1
                    stp += 1
                enc.encode(stats, stp, 0)
            else:
                enc.encode(stats, stp, 0)
        stp += 14
        mm = m >> 1
        while mm:
            enc.encode(stats, stp, 1 if sz & mm else 0)
            mm >>= 1
        k += 1
    if last is None or last < kmax:
        enc.encode(stats, 3 * (k - 1), 1)  # EOB


def encode_hier_dct_arith(arr, levels=2, quant=1, progressive=False):
    """SOF9 base + EXP + SOF13/SOF14 differential stages + a huffman SOF7
    lossless correction — the arithmetic container twin of
    jpeg.encode_jpeg_hierarchical_dct (same closed loop through the
    decoder's _reconstruct_planes)."""
    a = np.asarray(arr)
    assert a.dtype == np.uint8 and a.ndim == 2
    levels = max(1, int(levels))
    full = a.astype(np.int64)
    pyr = [full]
    for _ in range(levels - 1):
        pyr.append(pyr[-1][::2, ::2])
    pyr.reverse()

    out = bytearray(b"\xff\xd8")
    q = np.full(64, int(quant), dtype=np.int32)
    A = J._idct_matrix()

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    def frame_payload(hh, ww):
        return bytes([8]) + struct.pack(">HH", hh, ww) + bytes([1, 1, 0x11, 0])

    h, w = a.shape
    seg(0xDE, frame_payload(h, w))
    seg(0xDB, bytes([0]) + bytes(int(x) for x in q))

    def dct_blocks(plane, level_shift):
        hh, ww = plane.shape
        ph, pw = -(-hh // 8) * 8, -(-ww // 8) * 8
        p = np.pad(plane.astype(np.float64),
                   ((0, ph - hh), (0, pw - ww)), mode="edge")
        if level_shift:
            p = p - 128.0
        nby, nbx = ph // 8, pw // 8
        blocks = np.zeros((nby, nbx, 64), dtype=np.int32)
        for by in range(nby):
            for bx in range(nbx):
                coef = A @ p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] @ A.T
                blocks[by, bx] = np.round(coef.flat[J.ZIGZAG] / q).astype(np.int32)
        return blocks

    def decoder_recon(blocks, hh, ww, level_shift):
        fake = {"comps": [{"tq": 0, "h": 1, "v": 1}], "h": hh, "w": ww,
                "hmax": 1, "vmax": 1}
        (plane,) = J._reconstruct_planes(fake, [blocks], {0: q},
                                         level_shift=level_shift)
        if level_shift:
            return np.clip(np.round(plane), 0, 255).astype(np.int64)
        return np.round(plane).astype(np.int64)

    def emit_frame(blocks, hh, ww, differential):
        marker = (0xCE if progressive else 0xCD) if differential else 0xC9
        seg(marker, frame_payload(hh, ww))
        flat = blocks.reshape(-1, 64)
        if progressive and differential:
            # scan 1: DC only (Ss=Se=0, Al=0) — fresh stats + coder per
            # scan, exactly as the decoder allocates them
            seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
            enc, stats, ctx = _QMEnc(), bytearray(64), [0]
            for zz in flat:
                _enc_dc(enc, stats, ctx, 0, int(zz[0]))
            out.extend(enc.flush())
            # scan 2: AC band 1..63, Al=0
            seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0]))
            enc = _QMEnc()
            acs = bytearray(256)
            fixed = bytearray([J._FIXED_STATE])
            for zz in flat:
                _enc_ac_band(enc, acs, fixed, zz)
            out.extend(enc.flush())
        else:
            seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            enc = _QMEnc()
            dcs, acs = bytearray(64), bytearray(256)
            fixed = bytearray([J._FIXED_STATE])
            ctx, pred = [0], 0
            for zz in flat:
                dc = int(zz[0])
                _enc_dc(enc, dcs, ctx, 0, dc - (0 if differential else pred))
                pred = dc
                _enc_ac_band(enc, acs, fixed, zz)
            out.extend(enc.flush())

    def emit_lossless_diff(dplane):
        hh, ww = dplane.shape
        d = ((dplane + 32768) & 0xFFFF) - 32768
        syms = set()
        for v in np.unique(d):
            v = int(v)
            syms.add(16 if v == -32768 else J._category(v))
        counts, symlist, codes = J._canonical(syms)
        seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(symlist))
        seg(0xC7, frame_payload(hh, ww))
        seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
        wtr = J._ScanWriter(out)
        for y in range(hh):
            for x in range(ww):
                v = int(d[y, x])
                if v == -32768:
                    ln, code = codes[16]
                    wtr.bits(code, ln)
                    continue
                n = J._category(v)
                ln, code = codes[n]
                wtr.bits(code, ln)
                if n:
                    wtr.bits(v if v > 0 else v + (1 << n) - 1, n)
        wtr.close()

    hh, ww = pyr[0].shape
    blocks = dct_blocks(pyr[0], level_shift=True)
    emit_frame(blocks, hh, ww, differential=False)
    ref = decoder_recon(blocks, hh, ww, level_shift=True)
    for lvl in pyr[1:]:
        seg(0xDF, bytes([0x11]))
        hh, ww = lvl.shape
        e = np.array(J._expand_plane(ref.tolist(), 1, 1), dtype=np.int64)[:hh, :ww]
        blocks = dct_blocks(lvl - e, level_shift=False)
        emit_frame(blocks, hh, ww, differential=True)
        ref = np.clip(e + decoder_recon(blocks, hh, ww, level_shift=False),
                      0, 255)
    emit_lossless_diff(full - ref)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _img(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 96 + 64 * np.sin(yy / 9.0) + 48 * np.cos(xx / 7.0)
    return np.clip(base + rng.integers(-24, 25, size=(h, w)), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape", [(32, 32), (40, 24), (17, 23)])
def test_roundtrip_sof13_sequential(shape):
    img = _img(*shape)
    data = encode_hier_dct_arith(img, levels=2)
    assert b"\xff\xcd" in data
    np.testing.assert_array_equal(J.decode_jpeg(data), img)


@pytest.mark.parametrize("shape", [(32, 32), (25, 33)])
def test_roundtrip_sof14_progressive(shape):
    img = _img(*shape, seed=11)
    data = encode_hier_dct_arith(img, levels=2, progressive=True)
    assert b"\xff\xce" in data
    np.testing.assert_array_equal(J.decode_jpeg(data), img)


def test_three_levels_coarse_quant():
    img = _img(48, 40, seed=3)
    for q in (1, 16):
        data = encode_hier_dct_arith(img, levels=3, quant=q)
        np.testing.assert_array_equal(J.decode_jpeg(data), img)
