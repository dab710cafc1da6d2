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


def _predict(plane, y, x, sel, default, ry, rx):
    """Conformant H.1.2.1 prediction: the first sample after a restart
    (scan start = restart at (0,0)) takes the default; the REMAINDER of
    that line uses Ra (1-D horizontal); later lines start with Rb then
    use the selected predictor."""
    if y == ry and x == rx:
        return default
    if y == ry:
        return plane[y][x - 1]  # Ra for the restart interval's first line
    if x == 0:
        return plane[y - 1][x]
    ra, rb, rc = plane[y][x - 1], plane[y - 1][x], plane[y - 1][x - 1]
    return {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
            5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
            7: (ra + rb) >> 1}[sel]


def _emit_diff(bw, diff):
    diff &= 0xFFFF
    if diff >= 0x8000:
        diff -= 0x10000  # smallest-magnitude representative
    if diff == -32768 or diff == 32768:
        bw.bits(_CODES[16], _LEN)
    else:
        t = _cat(diff)
        bw.bits(_CODES[t], _LEN)
        if t:
            bw.bits(_extend_bits(diff, t), t)


def _scan_entropy(planes, sel, default, restart):
    """Entropy-coded body for one scan (interleaved over `planes`),
    restart markers inserted every `restart` MCUs."""
    h, w = planes[0].shape
    out = bytearray()
    bw = _BW()
    n = 0
    ry = rx = 0
    rst = 0
    for y in range(h):
        for x in range(w):
            if restart and n and n % restart == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                ry, rx = y, x
            for p in planes:
                pred = _predict(p, y, x, sel, default, ry, rx)
                _emit_diff(bw, int(p[y][x]) - pred)
            n += 1
    out += bw.flush()
    return bytes(out)


def _encode_lossless(planes, prec, sel, pt=0, restart=0, interleaved=True):
    """planes: list of (h, w) int arrays of prec-Pt-bit samples (already
    point-transformed). Emits a complete SOF3 stream — one interleaved
    scan, or (interleaved=False) one scan per component as conforming
    non-interleaved encoders write."""
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
    groups = [list(range(nc))] if interleaved else [[i] for i in range(nc)]
    for g in groups:
        sos = bytes([len(g)])
        for i in g:
            sos += bytes([i + 1, 0x00])
        sos += bytes([sel, 0, pt])
        out += bytes([0xFF, 0xDA]) + struct.pack(">H", 2 + len(sos)) + sos
        out += _scan_entropy([planes[i] for i in g], sel, default, restart)
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


def test_three_components_non_interleaved():
    """ADVICE r6: a legal SOF3 file with one scan PER COMPONENT used to
    return only the last scan's plane (each SOS overwrote the result).
    Planes are now frame-allocated and each scan fills only its own."""
    rng = np.random.default_rng(30)
    rgb = rng.integers(0, 256, (7, 11, 3), dtype=np.int64)
    planes = [rgb[:, :, i] for i in range(3)]
    got = decode_jpeg(_encode_lossless(planes, 8, 6, interleaved=False))
    assert got.shape == (7, 11, 3)
    assert np.array_equal(got, rgb.astype(np.uint8))


def test_non_interleaved_with_restarts():
    rng = np.random.default_rng(31)
    rgb = rng.integers(0, 1 << 12, (6, 10, 2), dtype=np.int64)
    planes = [rgb[:, :, i] for i in range(2)]
    got = decode_jpeg(
        _encode_lossless(planes, 12, 4, restart=7, interleaved=False))
    assert np.array_equal(got, rgb.astype(np.uint16))


def test_missing_component_scan_raises():
    """A lossless frame whose scans don't cover every component is
    corrupt — must raise, not return zero planes silently."""
    rng = np.random.default_rng(32)
    rgb = rng.integers(0, 256, (4, 5, 3), dtype=np.int64)
    planes = [rgb[:, :, i] for i in range(3)]
    data = _encode_lossless(planes, 8, 1, interleaved=False)
    # drop the final scan: truncate at the last SOS marker, keep EOI
    last_sos = data.rfind(b"\xff\xda")
    with pytest.raises(ValueError, match="missing scans"):
        decode_jpeg(data[:last_sos] + b"\xff\xd9")


def test_hand_derived_restart_stream():
    """Bitstream assembled by hand with the expected pixels computed BY
    HAND from T.81 H.1.2.1 — independent of both the decoder and this
    file's encoder, so a shared predictor bug cannot round-trip its way
    past this test. sel=2 (Rb) with DRI=6 on a 3x4 plane: the restart
    lands mid-row at (1,2); per H.1.2.1 sample (1,2) takes the default
    prediction 128 and (1,3) must use Ra=s(1,2) — a nonconformant
    decoder that keeps the selected Rb predictor there reads
    s(0,3)=137 instead and decodes (1,3) as 141, not 124."""
    diffs_a = [5, -3, 7, 0, 10, 1]      # samples 0..5 (restart interval 0)
    diffs_b = [-8, 4, -5, 9, 6, -4]     # samples 6..11 (after RST0)
    # hand-walked prediction chain (sel=2, default=128):
    # (0,0)=128+5=133  (0,1)=Ra 133-3=130  (0,2)=Ra 130+7=137  (0,3)=Ra 137
    # (1,0)=Rb 133+10=143  (1,1)=Rb 130+1=131
    # -- RST0: (1,2)=128-8=120  (1,3)=Ra 120+4=124
    # (2,0)=Rb 143-5=138  (2,1)=Rb 131+9=140  (2,2)=Rb 120+6=126
    # (2,3)=Rb 124-4=120
    expected = np.array([[133, 130, 137, 137],
                         [143, 131, 120, 124],
                         [138, 140, 126, 120]], dtype=np.uint8)
    out = bytearray(b"\xff\xd8") + _dht()
    sof = bytes([8]) + struct.pack(">HH", 3, 4) + bytes([1, 1, 0x11, 0])
    out += bytes([0xFF, 0xC3]) + struct.pack(">H", 2 + len(sof)) + sof
    out += bytes([0xFF, 0xDD]) + struct.pack(">HH", 4, 6)  # DRI 6
    sos = bytes([1, 1, 0x00, 2, 0, 0])  # 1 comp, predictor Ss=2, Pt=0
    out += bytes([0xFF, 0xDA]) + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BW()
    for d in diffs_a:
        _emit_diff(bw, d)
    out += bw.flush() + b"\xff\xd0"  # RST0
    for d in diffs_b:
        _emit_diff(bw, d)
    out += bw.flush() + b"\xff\xd9"
    got = decode_jpeg(bytes(out))
    assert np.array_equal(got, expected)


def test_restart_mid_row_roundtrip_all_predictors():
    """Restart intervals that straddle row boundaries (DRI not a multiple
    of the row length) through every predictor — exercises the
    rest-of-line Ra rule wherever the restart lands."""
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (9, 13), dtype=np.int64)
    for sel in range(1, 8):
        got = decode_jpeg(_encode_lossless([img], 8, sel, restart=5))
        assert np.array_equal(got, img.astype(np.uint8)), f"sel {sel}"
