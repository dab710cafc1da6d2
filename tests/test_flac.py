"""FLAC decoder (functions/flac.py) pinned against an INDEPENDENT forward
encoder implemented here straight from the spec: its own bit-writer, its
own Rice/zigzag coder, its own CRC-8/CRC-16, its own header packing. FLAC
is lossless, so the decoder must recover exact sample values across every
subframe type, residual shape, and channel assignment."""

import struct

import numpy as np
import pytest

from data_diff_spark.functions.flac import crc8, crc16, decode_flac, parse_streaminfo

_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


class _W:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, value, bits):
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = self.n = 0

    def sw(self, value, bits):
        self.w(value & ((1 << bits) - 1), bits)

    def unary(self, q):
        for _ in range(q):
            self.w(0, 1)
        self.w(1, 1)

    def align(self):
        while self.n:
            self.w(0, 1)

    def bytes(self):
        assert self.n == 0
        return bytes(self.buf)


def _rice(w, residuals, param, order, po=0):
    """Partitioned Rice, method 0 (4-bit params), same param everywhere."""
    w.w(0, 2)          # method 0
    w.w(po, 4)
    nparts = 1 << po
    total = len(residuals) + order
    idx = 0
    for p in range(nparts):
        n = (total >> po) - (order if p == 0 else 0)
        w.w(param, 4)
        for _ in range(n):
            e = residuals[idx]; idx += 1
            z = (e << 1) if e >= 0 else ((-e) << 1) - 1
            w.unary(z >> param)
            if param:
                w.w(z & ((1 << param) - 1), param)
    assert idx == len(residuals)


def _raw_partition(w, residuals, rawbits, order):
    w.w(0, 2)
    w.w(0, 4)          # one partition
    w.w(0xF, 4)        # escape
    w.w(rawbits, 5)
    for e in residuals:
        w.sw(e, rawbits)


def _streaminfo(blocksize, rate, chans, bps, total):
    b = _W()
    b.w(blocksize, 16); b.w(blocksize, 16)
    b.w(0, 24); b.w(0, 24)
    b.w(rate, 20); b.w(chans - 1, 3); b.w(bps - 1, 5)
    b.w(total, 36)
    body = b.bytes() + bytes(16)
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body


def _frame_header(blocksize, ch_code, bps_code, frame_no):
    h = _W()
    h.w(0b11111111111110, 14)
    h.w(0, 1)          # reserved
    h.w(0, 1)          # fixed blocking
    h.w(6, 4)          # blocksize: 8 bits at end
    h.w(0, 4)          # sample rate: from STREAMINFO
    h.w(ch_code, 4)
    h.w(bps_code, 3)
    h.w(0, 1)
    h.w(frame_no, 8)   # UTF-8 single byte (frame_no < 128)
    h.w(blocksize - 1, 8)
    raw = h.bytes()
    return raw + bytes([crc8(raw)])


def _sub_constant(w, v, bps):
    w.w(0, 1); w.w(0, 6); w.w(0, 1)
    w.sw(v, bps)


def _sub_verbatim(w, samples, bps):
    w.w(0, 1); w.w(1, 6); w.w(0, 1)
    for v in samples:
        w.sw(v, bps)


def _sub_fixed(w, samples, order, bps, param=4, po=0, wasted=0):
    w.w(0, 1); w.w(8 + order, 6)
    if wasted:
        w.w(1, 1); w.unary(wasted - 1)
    else:
        w.w(0, 1)
    shifted = [v >> wasted for v in samples]
    for v in shifted[:order]:
        w.sw(v, bps - wasted)
    res = []
    for i in range(order, len(shifted)):
        pred = sum(c * shifted[i - j - 1] for j, c in enumerate(_FIXED[order]))
        res.append(shifted[i] - pred)
    _rice(w, res, param, order, po)


def _sub_lpc(w, samples, coefs, shift, prec, bps, param=4):
    order = len(coefs)
    w.w(0, 1); w.w(0b100000 | (order - 1), 6); w.w(0, 1)
    for v in samples[:order]:
        w.sw(v, bps)
    w.w(prec - 1, 4)
    w.sw(shift, 5)
    for c in coefs:
        w.sw(c, prec)
    res = []
    for i in range(order, len(samples)):
        acc = sum(c * samples[i - j - 1] for j, c in enumerate(coefs))
        res.append(samples[i] - (acc >> shift))
    _rice(w, res, param, order)
    return res


def _frame(blocksize, ch_code, frame_no, build_subs, bps_code=4):
    hdr = _frame_header(blocksize, ch_code, bps_code, frame_no)
    w = _W()
    build_subs(w)
    w.align()
    body = hdr + w.bytes()
    return body + struct.pack(">H", crc16(body))


def _lpc_playable(rng, n, bps=16):
    """Samples whose LPC residuals stay small: a smoothed random walk."""
    x = np.cumsum(rng.integers(-80, 81, n))
    return np.clip(x, -(1 << (bps - 1)), (1 << (bps - 1)) - 1).astype(int).tolist()


def test_streaminfo_and_constant_frame():
    data = _streaminfo(16, 44100, 1, 16, 16)
    data += _frame(16, 0, 0, lambda w: _sub_constant(w, -123, 16))
    info = parse_streaminfo(data)
    assert info["sample_rate"] == 44100 and info["channels"] == 1
    samples, rate = decode_flac(data)
    assert rate == 44100 and samples.shape == (16, 1)
    assert (samples == -123).all()


def test_verbatim_and_fixed_orders():
    rng = np.random.default_rng(1)
    vals = rng.integers(-3000, 3000, 32).astype(int).tolist()
    for order in range(5):
        data = _streaminfo(32, 8000, 1, 16, 32)
        data += _frame(32, 0, 0,
                       lambda w, o=order: _sub_fixed(w, vals, o, 16, param=6))
        got, _ = decode_flac(data)
        assert got[:, 0].tolist() == vals, f"fixed order {order}"
    data = _streaminfo(32, 8000, 1, 16, 32)
    data += _frame(32, 0, 0, lambda w: _sub_verbatim(w, vals, 16))
    got, _ = decode_flac(data)
    assert got[:, 0].tolist() == vals


def test_lpc_orders_and_shifts():
    rng = np.random.default_rng(2)
    vals = _lpc_playable(rng, 64)
    for coefs, shift, prec in (
        ([205, -102], 7, 9),
        ([3, -3, 1, 0, 1], 2, 4),
        (list(rng.integers(-2000, 2000, 12)), 12, 12),
    ):
        data = _streaminfo(64, 48000, 1, 16, 64)
        data += _frame(
            64, 0, 0,
            lambda w, c=coefs, s=shift, p=prec:
                _sub_lpc(w, vals, [int(x) for x in c], s, p, 16, param=9))
        got, _ = decode_flac(data)
        assert got[:, 0].tolist() == vals, (coefs, shift)


def test_partitioned_rice_and_escape():
    rng = np.random.default_rng(3)
    vals = rng.integers(-500, 500, 64).astype(int).tolist()
    data = _streaminfo(64, 8000, 1, 16, 64)
    data += _frame(64, 0, 0, lambda w: _sub_fixed(w, vals, 2, 16, param=7, po=2))
    got, _ = decode_flac(data)
    assert got[:, 0].tolist() == vals
    # escape partition: raw residuals
    data = _streaminfo(16, 8000, 1, 16, 16)

    def subs(w):
        w.w(0, 1); w.w(8 + 0, 6); w.w(0, 1)  # FIXED order 0
        _raw_partition(w, vals[:16], 12, 0)
    data += _frame(16, 0, 0, subs)
    got, _ = decode_flac(data)
    assert got[:, 0].tolist() == vals[:16]


def test_wasted_bits():
    vals = [v * 8 for v in range(-16, 16)]  # 3 trailing zero bits everywhere
    data = _streaminfo(32, 8000, 1, 16, 32)
    data += _frame(32, 0, 0, lambda w: _sub_fixed(w, vals, 1, 16, param=5, wasted=3))
    got, _ = decode_flac(data)
    assert got[:, 0].tolist() == vals


def test_stereo_assignments():
    rng = np.random.default_rng(4)
    left = rng.integers(-2000, 2000, 32).astype(int).tolist()
    right = rng.integers(-2000, 2000, 32).astype(int).tolist()

    def frame_for(ch_code):
        def subs(w):
            if ch_code == 1:      # independent stereo
                _sub_verbatim(w, left, 16)
                _sub_verbatim(w, right, 16)
            elif ch_code == 8:    # left/side
                side = [l - r for l, r in zip(left, right)]
                _sub_verbatim(w, left, 16)
                _sub_verbatim(w, side, 17)
            elif ch_code == 9:    # right/side
                side = [l - r for l, r in zip(left, right)]
                _sub_verbatim(w, side, 17)
                _sub_verbatim(w, right, 16)
            else:                 # mid/side
                side = [l - r for l, r in zip(left, right)]
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _sub_verbatim(w, mid, 16)
                _sub_verbatim(w, side, 17)
        return subs

    for ch_code in (1, 8, 9, 10):
        data = _streaminfo(32, 44100, 2, 16, 32)
        data += _frame(32, ch_code, 0, frame_for(ch_code))
        got, _ = decode_flac(data)
        assert got[:, 0].tolist() == left, f"ch {ch_code} left"
        assert got[:, 1].tolist() == right, f"ch {ch_code} right"


def test_multi_frame_stream_and_total_cut():
    rng = np.random.default_rng(5)
    a = rng.integers(-100, 100, 16).astype(int).tolist()
    b = rng.integers(-100, 100, 16).astype(int).tolist()
    data = _streaminfo(16, 8000, 1, 16, 28)  # total cuts the last frame
    data += _frame(16, 0, 0, lambda w: _sub_verbatim(w, a, 16))
    data += _frame(16, 0, 1, lambda w: _sub_verbatim(w, b, 16))
    got, _ = decode_flac(data)
    assert got[:, 0].tolist() == (a + b)[:28]


def test_crc_detection():
    data = _streaminfo(16, 8000, 1, 16, 16)
    frame = bytearray(_frame(16, 0, 0, lambda w: _sub_constant(w, 5, 16)))
    frame[-1] ^= 0xFF  # corrupt the CRC-16
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(data + bytes(frame))
    bad = bytearray(data + _frame(16, 0, 0, lambda w: _sub_constant(w, 5, 16)))
    with pytest.raises(ValueError):
        decode_flac(bad[:-3])  # truncated


def test_decode_audio_dispatches_flac():
    from data_diff_spark.functions.multimodal import decode_audio

    rng = np.random.default_rng(6)
    vals = rng.integers(-3000, 3000, 32).astype(int).tolist()
    data = _streaminfo(32, 22050, 1, 16, 32)
    data += _frame(32, 0, 0, lambda w: _sub_verbatim(w, vals, 16))
    rate, samples = decode_audio(data)
    assert rate == 22050 and samples.dtype == np.int16
    assert samples.tolist() == vals


def test_decode_audio_rejects_non16bit_flac():
    """ADVICE r6: a plain astype(int16) on a 24-bit FLAC silently WRAPS
    sample values. decode_audio must refuse non-16-bit streams loudly;
    decode_flac itself still returns the exact int32 samples."""
    from data_diff_spark.functions.multimodal import decode_audio

    vals = [1 << 20, -(1 << 20), 5000000, -5000000]  # out of int16 range
    data = _streaminfo(4, 44100, 1, 24, 4)
    data += _frame(4, 0, 0, lambda w: _sub_verbatim(w, vals, 24), bps_code=6)
    samples, rate = decode_flac(data)
    assert samples[:, 0].tolist() == vals  # exact at 24-bit
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_audio(data)
