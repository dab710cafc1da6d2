"""Arithmetic-coded lossless JPEG (SOF11, T.81 Annex H.1.2.3).

What is independently pinned vs what is mirrored — stated honestly:

- The QM-coder machinery in the decoder (_ArithDecoder, state table,
  renormalization, byte stuffing) is already conformance-pinned
  BIT-EXACTLY against libjpeg on the DCT arithmetic processes
  (tests/test_jpeg_arith.py), so it is NOT re-proven here.
- The new surface is only the H.1.2.3 statistical model (2-D (Da, Db)
  conditioning + the two magnitude chains). libjpeg 62 in this container
  exports no lossless entry point, so the encode side below is a MIRROR
  coder (same status as the FLAC/AVI forward encoders): round-trips
  prove decode inverts encode, and `test_model_bin_layout` pins the bin
  indices the model touches against the Table H.4 layout written out BY
  HAND here, independent of both codec halves' index arithmetic.

The QM *encoder* below follows the public T.81 Annex D flowcharts in the
register conventions of the IJG implementation (jcarith.c) — the exact
counterpart of the decoder's documented layout.
"""

import struct

import numpy as np
import pytest

from data_diff_spark.functions import jpeg as J
from data_diff_spark.functions.jpeg import decode_jpeg


# --- QM encoder (T.81 Annex D, IJG register conventions) --------------------


class _QMEnc:
    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1   # pending byte (-1: none yet)
        self.sc = 0        # stacked 0xFF bytes (may still carry-over)
        self.zc = 0        # pending 0x00 bytes (trailing-zero suppression)
        self.out = bytearray()

    def _zeros(self):
        while self.zc:
            self.out.append(0x00)
            self.zc -= 1

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        st = stats[i]
        idx, mps = st & 0x7F, st >> 7
        qe, nlps, nmps, switch = J._ARITH_TAB[idx]
        self.a -= qe
        if bit != mps:
            if self.a >= qe:      # normal LPS: top sub-interval
                self.c += self.a
                self.a = qe
            # else conditional exchange: LPS takes the bottom (larger) part
            if switch:
                mps = 1 - mps
            stats[i] = (mps << 7) | nlps
        else:
            if self.a >= 0x8000:
                return  # no renormalization, no state change (D.1.4)
            if self.a < qe:       # conditional exchange: MPS to the top
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nmps
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                temp = self.c >> 19
                if temp > 0xFF:
                    # carry propagation into the pending byte / 0xFF stack
                    if self.buffer >= 0:
                        self._zeros()
                        b = self.buffer + 1
                        self.out.append(b)
                        if b == 0xFF:
                            self.out.append(0x00)
                    self.zc += self.sc
                    self.sc = 0
                    self.buffer = temp & 0xFF
                elif temp == 0xFF:
                    self.sc += 1
                else:
                    if self.buffer == 0:
                        self.zc += 1
                    elif self.buffer > 0:
                        self._zeros()
                        self.out.append(self.buffer)
                    if self.sc:
                        self._zeros()
                        for _ in range(self.sc):
                            self.out.append(0xFF)
                            self.out.append(0x00)
                        self.sc = 0
                    self.buffer = temp
                self.c &= 0x7FFFF
                self.ct += 8
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        """D.1.8 termination + final byte output with 0xFF stuffing and
        trailing-zero suppression (decoder feeds zeros past the marker)."""
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._zeros()
                b = self.buffer + 1
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer > 0:
                self._zeros()
                self.out.append(self.buffer)
            if self.sc:
                self._zeros()
                for _ in range(self.sc):
                    self.out.append(0xFF)
                    self.out.append(0x00)
                self.sc = 0
        if self.c & 0x7FFF800:
            self._zeros()
            b = (self.c >> 19) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
        data = bytes(self.out)
        self.__init__()
        return data


# --- H.1.2.3 model, encode side (mirror of the decoder's read_diff) ---------


def _classify(m, sign, lo, hi):
    if m < lo:
        return 0
    if m > hi:
        return 3 + sign
    return 1 + sign


def _encode_diff(enc, stats, qa, qb, diff, lo, hi, trace=None):
    base = 4 * (5 * qa + qb)
    if trace is not None:
        trace.append(("S0", base))
    if diff == 0:
        enc.encode(stats, base, 0)
        return 0
    enc.encode(stats, base, 1)
    sign = 1 if diff < 0 else 0
    if trace is not None:
        trace.append(("SS", base + 1))
    enc.encode(stats, base + 1, sign)
    v = -diff if sign else diff
    sz = v - 1
    stp = base + 2 + sign
    if trace is not None:
        trace.append(("SP/SN", stp))
    if sz == 0:
        enc.encode(stats, stp, 0)
        m = 0
    else:
        enc.encode(stats, stp, 1)
        m = 1
        stp = 129 if qb > 2 else 100
        while sz >= (m << 1):
            if trace is not None:
                trace.append(("X", stp))
            enc.encode(stats, stp, 1)
            m <<= 1
            stp += 1
        if trace is not None:
            trace.append(("X", stp))
        enc.encode(stats, stp, 0)
    cat = _classify(m, sign, lo, hi)
    stp += 14
    mm = m >> 1
    while mm:
        if trace is not None:
            trace.append(("M", stp))
        enc.encode(stats, stp, 1 if sz & mm else 0)
        mm >>= 1
    return cat


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_sof11(arr, predictor=1, pt=0, prec=None, restart=0,
                 interleaved=True, L=0, U=1, trace=None):
    """Forward SOF11 coder: grey (h, w) or multi-component (h, w, c)
    arrays, any precision 2-16, predictors 1-7, optional restart interval
    (H.1.2.1 semantics), one interleaved scan or one scan per component."""
    arr = np.asarray(arr)
    grey = arr.ndim == 2
    planes = [arr] if grey else [arr[:, :, i] for i in range(arr.shape[2])]
    h, w = planes[0].shape
    if prec is None:
        prec = max(2, int(np.max(arr)).bit_length()) if np.max(arr) else 2
    default = 1 << (prec - pt - 1)
    lo, hi = (1 << L) >> 1, (1 << U) >> 1

    out = bytearray(b"\xff\xd8")
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(len(planes)))
    out += _seg(0xCB, bytes([prec]) + struct.pack(">HH", h, w)
                + bytes([len(planes)]) + comps)
    if (L, U) != (0, 1):
        out += _seg(0xCC, bytes([0x00, (U << 4) | L]))
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))

    scans = ([list(range(len(planes)))] if interleaved
             else [[i] for i in range(len(planes))])
    for scan_cis in scans:
        spec = b"".join(bytes([ci + 1, 0x00]) for ci in scan_cis)
        out += _seg(0xDA, bytes([len(scan_cis)]) + spec
                    + bytes([predictor, 0, pt]))
        enc = _QMEnc()
        stats = bytearray(158)
        cat_above = {ci: [0] * w for ci in scan_cis}
        cat_left = {ci: 0 for ci in scan_cis}
        n, ry, rx, rst = 0, 0, 0, 0
        px = [(p.astype(np.int64) >> pt) for p in planes]
        for y in range(h):
            for ci in scan_cis:
                cat_left[ci] = 0
            for x in range(w):
                if restart and n and n % restart == 0:
                    out += enc.flush()
                    out += bytes([0xFF, 0xD0 + (rst & 7)])
                    rst += 1
                    enc = _QMEnc()
                    stats = bytearray(158)
                    for ci in scan_cis:
                        cat_above[ci] = [0] * w
                        cat_left[ci] = 0
                    ry, rx = y, x
                for ci in scan_cis:
                    p = px[ci]
                    if y == ry and x == rx:
                        pred = default
                    elif y == ry:
                        pred = p[y][x - 1]
                    elif x == 0:
                        pred = p[y - 1][x]
                    else:
                        ra, rb, rc = p[y][x - 1], p[y - 1][x], p[y - 1][x - 1]
                        pred = {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                                5: ra + ((rb - rc) >> 1),
                                6: rb + ((ra - rc) >> 1),
                                7: (ra + rb) >> 1}[predictor]
                    diff = (int(p[y][x]) - int(pred)) & 0xFFFF
                    if diff > 32767:
                        diff -= 65536
                    cat = _encode_diff(enc, stats, cat_left[ci],
                                       cat_above[ci][x], diff, lo, hi, trace)
                    cat_left[ci] = cat_above[ci][x] = cat
                n += 1
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _img(h, w, seed=0, prec=8, comps=1):
    rng = np.random.RandomState(seed)
    shape = (h, w) if comps == 1 else (h, w, comps)
    return rng.randint(0, 1 << prec, size=shape).astype(np.uint16)


# --- round-trips -------------------------------------------------------------


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_predictors(predictor):
    img = _img(13, 9, seed=predictor)
    got = decode_jpeg(encode_sof11(img, predictor=predictor, prec=8))
    assert got.dtype == np.uint8
    assert np.array_equal(got, img.astype(np.uint8))


@pytest.mark.parametrize("shape", [(1, 1), (1, 17), (17, 1), (8, 8), (23, 31)])
def test_roundtrip_shapes(shape):
    img = _img(*shape, seed=42)
    got = decode_jpeg(encode_sof11(img, predictor=4, prec=8))
    assert np.array_equal(got, img.astype(np.uint8))


def test_roundtrip_16bit():
    img = _img(11, 7, seed=3, prec=16)
    got = decode_jpeg(encode_sof11(img, predictor=1, prec=16))
    assert got.dtype == np.uint16
    assert np.array_equal(got, img)


def test_roundtrip_smooth_gradient():
    """Smooth content exercises the zero/small-diff contexts heavily and
    keeps the adaptive states far from the random-noise trajectory."""
    y, x = np.mgrid[0:24, 0:33]
    img = ((y * 3 + x * 2) % 256).astype(np.uint16)
    got = decode_jpeg(encode_sof11(img, predictor=7, prec=8))
    assert np.array_equal(got, img.astype(np.uint8))


def test_roundtrip_extreme_diffs():
    """Alternating 0 / 65535 at 16-bit: every diff is +/-32768-ish, the
    deepest X chain plus full mantissas, in both chain areas."""
    img = np.zeros((6, 6), dtype=np.uint16)
    img[::2, ::2] = 65535
    img[1::2, 1::2] = 65535
    got = decode_jpeg(encode_sof11(img, predictor=1, prec=16))
    assert np.array_equal(got, img)


def test_roundtrip_point_transform():
    img = (_img(9, 9, seed=5, prec=8) & 0xFC)
    got = decode_jpeg(encode_sof11(img, predictor=1, prec=8, pt=2))
    assert np.array_equal(got, img.astype(np.uint8))


def test_roundtrip_three_components_interleaved():
    img = _img(10, 14, seed=8, comps=3)
    got = decode_jpeg(encode_sof11(img, predictor=4, prec=8))
    assert got.shape == (10, 14, 3)
    assert np.array_equal(got, img.astype(np.uint8))


def test_roundtrip_non_interleaved_scans():
    """One scan per component: the frame-time plane allocation must merge
    all scans (the SOF3 multi-scan fix applies to SOF11 identically)."""
    img = _img(7, 11, seed=9, comps=2)
    got = decode_jpeg(encode_sof11(img, predictor=2, interleaved=False, prec=8))
    assert np.array_equal(got, img.astype(np.uint8))


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_roundtrip_restarts(ri):
    """Restart intervals: QM flush + RSTn + statistics/conditioning reset
    + H.1.2.1 prediction semantics (default, then the 1-D Ra line)."""
    img = _img(9, 10, seed=ri)
    got = decode_jpeg(encode_sof11(img, predictor=4, prec=8, restart=ri))
    assert np.array_equal(got, img.astype(np.uint8))


def test_roundtrip_custom_conditioning():
    """Non-default L/U (via DAC) moves the small/large category borders;
    both sides must classify identically or contexts desynchronize."""
    img = _img(12, 12, seed=11)
    got = decode_jpeg(encode_sof11(img, predictor=1, prec=8, L=2, U=4))
    assert np.array_equal(got, img.astype(np.uint8))


# --- the model layout itself, pinned by hand ---------------------------------


def test_model_bin_layout():
    """Hand-derived Table H.4 bin walk for a 2x2 8-bit image, predictor 1,
    written out independently of the codec's index arithmetic.

    Image:  [[128, 128],
             [129, 100]]     (default prediction 128 at the first sample)

    diffs (mod 2^16, predictor semantics of H.1.2.1):
      (0,0): pred default 128 -> diff 0
      (0,1): pred Ra 128      -> diff 0
      (1,0): pred Rb 128      -> diff +1
      (1,1): pred Ra 129      -> diff -29

    categories with default L=0, U=1 (lo=0, hi=1):
      diff 0 -> 0; diff +1 (m=0) -> ... m=0 means v=1, category uses m:
      m(=0) !> hi -> +small = 1; diff -29: v=29, m=16 > 1 -> -large = 4.

    contexts (base = 4*(5*cat(Da) + cat(Db))):
      (0,0): Da=0 Db=0 -> 0     S0 only (diff 0)
      (0,1): Da=0 Db=0 -> 0     S0 only
      (1,0): Da=0 (line start) Db=0 -> 0    S0, SS(1), SP(2); sz=0 stops
      (1,1): Da=+S(1) Db=0 -> base 20       S0(20), SS(21), SN(23),
             X chain at 100 (Db not large): v=29 -> sz=28, m=16:
             X 100,101,102,103 (ones), 104 (zero) then M bins at
             stp+14 = 118, 117.. wait: mantissa walks mm=8,4,2,1 at the
             SAME stp+14 bin (the model uses one M bin per magnitude
             category, indexed from the final X position).
    """
    trace = []
    img = np.array([[128, 128], [129, 100]], dtype=np.uint16)
    encode_sof11(img, predictor=1, prec=8, trace=trace)
    want = [
        ("S0", 0),
        ("S0", 0),
        ("S0", 0), ("SS", 1), ("SP/SN", 2),
        ("S0", 20), ("SS", 21), ("SP/SN", 23),
        ("X", 100), ("X", 101), ("X", 102), ("X", 103), ("X", 104),
        ("M", 118), ("M", 118), ("M", 118), ("M", 118),
    ]
    assert trace == want
    # and the stream with this exact bin walk round-trips
    got = decode_jpeg(encode_sof11(img, predictor=1, prec=8))
    assert np.array_equal(got, img.astype(np.uint8))


def test_second_chain_used_for_large_db():
    """A column of large diffs makes Db large for the next line: its
    magnitude bins must come from the second chain area (129+)."""
    trace = []
    img = np.array([[0, 0], [200, 200], [90, 90]], dtype=np.uint16)
    encode_sof11(img, predictor=2, prec=8, trace=trace)
    chains = {b for k, b in trace if k == "X"}
    assert any(b >= 129 for b in chains), f"second chain never used: {sorted(chains)}"
    assert any(100 <= b < 129 for b in chains), "first chain never used"
    got = decode_jpeg(encode_sof11(img, predictor=2, prec=8))
    assert np.array_equal(got, img.astype(np.uint8))


def test_rejects_hierarchical():
    # SOF14 decodes natively since r10 (test_jpeg_hier_dct_arith.py);
    # spliced in WITHOUT a hierarchical reference it is a stream error
    img = _img(4, 4)
    data = bytearray(encode_sof11(img, prec=8))
    i = data.find(b"\xff\xcb")
    data[i + 1] = 0xCE  # differential marker with no DHP/reference
    with pytest.raises(ValueError, match="differential frame without"):
        decode_jpeg(bytes(data))
