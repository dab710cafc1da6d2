"""Lossless JPEG (SOF3, T.81 Annex H): the decoder pinned against an
independent forward encoder implemented here from the spec — its own
Huffman table construction, its own category/extend difference coding,
its own predictor arithmetic. Lossless means exact sample recovery."""

import struct

import numpy as np
import pytest

from data_diff_spark.functions.jpeg import decode_jpeg


class _BW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = self.n = 0

    def flush(self):
        while self.n:
            self.bits(1, 1)  # pad with 1s per spec
        out = bytes(self.buf)
        self.buf = bytearray()
        return out


def _cat(v):
    return 0 if v == 0 else int(abs(int(v))).bit_length()


def _extend_bits(v, t):
    return v if v >= 0 else v + (1 << t) - 1


# one shared 17-symbol table: every category at a fixed code length
_SYMS = list(range(17))
_LEN = 5
_CODES = {s: i for i, s in enumerate(_SYMS)}


def _dht():
    counts = [0] * 16
    counts[_LEN - 1] = len(_SYMS)
    return bytes([0xFF, 0xC4]) + struct.pack(">H", 2 + 17 + len(_SYMS)) \
        + bytes([0x00]) + bytes(counts) + bytes(_SYMS)


def _predict(plane, y, x, sel, default, origin_flat, w):
    n = y * w + x
    if n == origin_flat:
        return default
    if y == 0:
        return plane[y][x - 1]
    if x == 0:
        return plane[y - 1][x]
    ra, rb, rc = plane[y][x - 1], plane[y - 1][x], plane[y - 1][x - 1]
    return {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
            5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
            7: (ra + rb) >> 1}[sel]


def _encode_lossless(planes, prec, sel, pt=0, restart=0):
    """planes: list of (h, w) int arrays of prec-Pt-bit samples (already
    point-transformed). Emits a complete SOF3 stream."""
    h, w = planes[0].shape
    nc = len(planes)
    default = 1 << (prec - pt - 1)
    out = bytearray(b"\xff\xd8")
    out += _dht()
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, 0x11, 0])
    out += bytes([0xFF, 0xC3]) + struct.pack(">H", 2 + len(sof)) + sof
    if restart:
        out += bytes([0xFF, 0xDD]) + struct.pack(">HH", 4, restart)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([sel, 0, pt])
    out += bytes([0xFF, 0xDA]) + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BW()
    n = 0
    origin = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if restart and n and n % restart == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                origin = n
            for p in planes:
                pred = _predict(p, y, x, sel, default, origin, w)
                diff = (int(p[y][x]) - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000  # smallest-magnitude representative
                if diff == -32768 or diff == 32768:
                    bw.bits(_CODES[16], _LEN)
                else:
                    t = _cat(diff)
                    bw.bits(_CODES[t], _LEN)
                    if t:
                        bw.bits(_extend_bits(diff, t), t)
            n += 1
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("sel", [1, 2, 3, 4, 5, 6, 7])
def test_grey_all_predictors(sel):
    rng = np.random.default_rng(sel)
    img = rng.integers(0, 256, (13, 17), dtype=np.int64)
    data = _encode_lossless([img], 8, sel)
    got = decode_jpeg(data)
    assert got.dtype == np.uint8 and np.array_equal(got, img.astype(np.uint8))


def test_16bit_precision():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 1 << 16, (9, 11), dtype=np.int64)
    got = decode_jpeg(_encode_lossless([img], 16, 4))
    assert got.dtype == np.uint16 and np.array_equal(got, img.astype(np.uint16))


def test_12bit_precision():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 1 << 12, (8, 8), dtype=np.int64)
    got = decode_jpeg(_encode_lossless([img], 12, 7))
    assert got.dtype == np.uint16 and np.array_equal(got, img.astype(np.uint16))


def test_three_components_interleaved():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (10, 14, 3), dtype=np.int64)
    planes = [rgb[:, :, i] for i in range(3)]
    got = decode_jpeg(_encode_lossless(planes, 8, 5))
    assert got.shape == (10, 14, 3)
    assert np.array_equal(got, rgb.astype(np.uint8))


def test_point_transform():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 64, (6, 9), dtype=np.int64)  # 6-bit samples
    data = _encode_lossless([img], 8, 1, pt=2)
    got = decode_jpeg(data)
    assert np.array_equal(got, (img << 2).astype(np.uint8))


def test_restart_intervals():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 12), dtype=np.int64)
    for ri in (5, 16, 96):
        got = decode_jpeg(_encode_lossless([img], 8, 4, restart=ri))
        assert np.array_equal(got, img.astype(np.uint8)), f"restart {ri}"


def test_extreme_diff_category_16():
    """Alternating 0 / 65535 rows at 16-bit force the SSSS=16 difference
    (32768, no extra bits) through the codec."""
    img = np.zeros((4, 4), dtype=np.int64)
    img[1::2] = 0xFFFF
    img[:, 1::2] ^= 0x8000
    got = decode_jpeg(_encode_lossless([img], 16, 1))
    assert np.array_equal(got, img.astype(np.uint16))
