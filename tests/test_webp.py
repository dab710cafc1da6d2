"""Native VP8L decoder pinned byte-exact against libwebp (functions/webp.py).

libwebp (shipped in this container as libwebp.so.7) plays two roles: the
ENCODER generates real VP8L bitstreams over fixture families designed to
exercise every decoder table — predictors, color transform, palette
bundling widths, 2D LZ77 distance codes, color cache, meta prefix codes —
and its DECODER is the authoritative oracle the native Python decode must
match byte-for-byte. A wrong constant (e.g. one bad distance-map entry)
corrupts pixels and fails these pins; that is the honesty contract the r4
review asked for before shipping a webp path.
"""

import os

import numpy as np
import pytest

from data_diff_spark.functions.webp import (
    decode_vp8l, decode_webp, decode_webp_libwebp, encode_webp_lossless, libwebp,
)

pytestmark = pytest.mark.skipif(
    libwebp() is None, reason="libwebp.so not present; native VP8L has no oracle"
)

rng = np.random.default_rng(42)


def _check(arr):
    data = encode_webp_lossless(arr)
    assert data[:4] == b"RIFF" and data[12:16] == b"VP8L"
    want = decode_webp_libwebp(data)
    got = decode_vp8l(data)
    np.testing.assert_array_equal(got, want)
    return data


def _rgba(h, w, fill):
    a = np.zeros((h, w, 4), np.uint8)
    a[..., :3] = fill
    a[..., 3] = 255
    return a


class TestVp8lAgainstLibwebp:
    def test_solid(self):
        _check(_rgba(8, 8, (10, 200, 30)))

    def test_gradients(self):
        for h, w in [(16, 16), (13, 17), (1, 64), (64, 1)]:
            y, x = np.mgrid[0:h, 0:w]
            arr = np.zeros((h, w, 4), np.uint8)
            arr[..., 0] = (x * 9) % 256
            arr[..., 1] = (y * 7) % 256
            arr[..., 2] = ((x + y) * 3) % 256
            arr[..., 3] = 255
            _check(arr)

    def test_photo_like_forces_predictors_and_color_transform(self):
        # smooth 2D field + correlated channels: the encoder reaches for
        # predictor AND cross-color transforms at this shape
        h, w = 48, 56
        y, x = np.mgrid[0:h, 0:w]
        base = (np.sin(x / 7.0) * 60 + np.cos(y / 5.0) * 60 + 128).astype(np.uint8)
        arr = np.zeros((h, w, 4), np.uint8)
        arr[..., 0] = base
        arr[..., 1] = (base * 0.8 + 20).astype(np.uint8)
        arr[..., 2] = (base * 0.6 + 40).astype(np.uint8)
        arr[..., 3] = 255
        _check(arr)

    @pytest.mark.parametrize("ncolors", [2, 3, 4, 9, 16, 60])
    def test_palette_bundling_widths(self, ncolors):
        # <=2 colors: 8 px/byte; <=4: 4; <=16: 2; else 1 — every bundling
        # width plus the unbundled case
        pal = rng.integers(0, 255, (ncolors, 3), dtype=np.uint8)
        idx = rng.integers(0, ncolors, (21, 37))
        arr = np.zeros((21, 37, 4), np.uint8)
        arr[..., :3] = pal[idx]
        arr[..., 3] = 255
        _check(arr)

    @pytest.mark.parametrize("tile", [2, 3, 5, 7, 8, 11])
    def test_tiled_patterns_force_2d_distances(self, tile):
        # periodic content with period != row width makes the encoder emit
        # close-neighborhood (2D) distance codes — the table under test
        h, w = 40, 40
        base = rng.integers(0, 255, (tile, tile, 3), dtype=np.uint8)
        arr = np.zeros((h, w, 4), np.uint8)
        for y in range(h):
            for x in range(w):
                arr[y, x, :3] = base[y % tile, x % tile]
        arr[..., 3] = 255
        _check(arr)

    def test_row_repeat_distances(self):
        # identical consecutive rows: distance == row width (code (0,1))
        row = rng.integers(0, 255, (1, 33, 3), dtype=np.uint8)
        arr = np.zeros((24, 33, 4), np.uint8)
        arr[..., :3] = row
        arr[..., 3] = 255
        _check(arr)

    def test_noise_uses_cache_and_literals(self):
        arr = np.zeros((32, 32, 4), np.uint8)
        arr[..., :3] = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        arr[..., 3] = 255
        _check(arr)

    def test_low_entropy_noise(self):
        # few distinct colors, non-periodic: color cache hits dominate
        pal = rng.integers(0, 255, (5, 3), dtype=np.uint8)
        arr = np.zeros((40, 31, 4), np.uint8)
        arr[..., :3] = pal[rng.integers(0, 5, (40, 31))]
        arr[..., 3] = 255
        _check(arr)

    def test_alpha_channel(self):
        h, w = 20, 20
        y, x = np.mgrid[0:h, 0:w]
        arr = np.zeros((h, w, 4), np.uint8)
        arr[..., 0] = 200
        arr[..., 1] = (x * 12) % 256
        arr[..., 2] = 90
        arr[..., 3] = np.maximum((y * 13) % 256, 1)  # nonzero: no RGB discard
        _check(arr)

    def test_mixed_regions_meta_huffman(self):
        # heterogeneous regions at a size where the encoder switches to
        # per-block meta prefix codes
        h, w = 96, 128
        arr = np.zeros((h, w, 4), np.uint8)
        arr[:48, :64, :3] = 200  # flat
        y, x = np.mgrid[0:48, 0:64]
        arr[:48, 64:, 0] = (x * 4) % 256  # gradient
        arr[48:, :64, :3] = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)  # noise
        tile = rng.integers(0, 255, (6, 6, 3), dtype=np.uint8)
        for yy in range(48):
            for xx in range(64):
                arr[48 + yy, 64 + xx, :3] = tile[yy % 6, xx % 6]  # periodic
        arr[..., 3] = 255
        _check(arr)


# --- hand-assembled VP8L streams: targeted conformance --------------------
# The libwebp simple-API encoder rarely emits 2D distance codes or exotic
# predictor modes, so oracle pins over its output under-cover those tables.
# This mini-writer assembles conformant VP8L streams that hit EXACT
# constructs (a chosen distance code, a chosen predictor mode, the color
# transform, the color cache); libwebp then acts as the conformance oracle
# for OUR streams — native decode must match it bit-for-bit. A shared
# misunderstanding between this writer and the native reader cannot pass,
# because libwebp is independent of both.


class _BitWriter:
    def __init__(self):
        self.bits = []

    def w(self, val, n):  # LSB-first field
        for i in range(n):
            self.bits.append((val >> i) & 1)

    def code(self, c, length):  # prefix code, MSB-first
        for i in range(length - 1, -1, -1):
            self.bits.append((c >> i) & 1)

    def tobytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


def _canon(lengths):
    present = sorted((l, s) for s, l in enumerate(lengths) if l)
    table, c, prev = {}, 0, present[0][0]
    for l, s in present:
        c <<= (l - prev)
        prev = l
        table[s] = (l, c)
        c += 1
    assert c == 1 << prev, "incomplete code in test writer"
    return table


def _flat_lengths(used, alphabet):
    used = sorted(used)
    n = len(used)
    lengths = [0] * alphabet
    if n == 1:
        lengths[used[0]] = 1  # writer emits simple form for this
        return lengths
    L = max(1, (n - 1).bit_length())
    shorter = (1 << L) - n
    for i, s in enumerate(used):
        lengths[s] = (L - 1) if i < shorter and L > 1 else L
    return lengths


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _emit_prefix_code(bw, lengths):
    present = [(s, l) for s, l in enumerate(lengths) if l]
    if len(present) <= 2 and all(s < 256 for s, _ in present):
        bw.w(1, 1)  # simple
        bw.w(len(present) - 1, 1)
        bw.w(1, 1)  # first symbol in 8 bits
        bw.w(present[0][0], 8)
        if len(present) == 2:
            bw.w(present[1][0], 8)
        return
    bw.w(0, 1)  # code-length-coded form
    used_lens = sorted({l for l in lengths})  # includes 0
    cl_lengths = _flat_lengths(used_lens, 19)
    cl_canon = _canon(cl_lengths)
    bw.w(19 - 4, 4)
    for i in range(19):
        bw.w(cl_lengths[_CL_ORDER[i]], 3)
    bw.w(0, 1)  # no explicit max_symbol
    for l in lengths:
        cl, cc = cl_canon[l]
        bw.code(cc, cl)


def _value_prefix(v):
    """length/distance value -> (prefix_code, extra_bits, extra_val)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 44):
        extra = (code - 2) >> 1
        off = (2 + (code & 1)) << extra
        if off < v <= off + (1 << extra):
            return code, extra, v - off - 1
    raise ValueError(v)


class _StreamBuilder:
    """Assemble one VP8L image: header, optional single transform, one
    entropy-coded group, literal/backref/cache symbol stream."""

    def __init__(self, w, h, cache_bits=0):
        self.w, self.h, self.cache_bits = w, h, cache_bits
        self.bw = _BitWriter()
        self.bw.w(w - 1, 14)
        self.bw.w(h - 1, 14)
        self.bw.w(0, 1)  # alpha hint
        self.bw.w(0, 3)  # version

    def predictor_transform(self, mode, bits=9):
        bw = self.bw
        bw.w(1, 1)
        bw.w(0, 2)  # PREDICTOR
        bw.w(bits - 2, 3)
        self._subimage_1px(g=mode)

    def color_transform(self, g2r, g2b, r2b, bits=9):
        bw = self.bw
        bw.w(1, 1)
        bw.w(1, 2)  # COLOR
        bw.w(bits - 2, 3)
        self._subimage_1px(r=r2b, g=g2b, b=g2r)

    def subtract_green(self):
        self.bw.w(1, 1)
        self.bw.w(2, 2)

    def _subimage_1px(self, r=0, g=0, b=0, a=0):
        # a non-level0 entropy image: [cache bit=0][5 prefix codes][pixels];
        # all-single-symbol codes consume ZERO symbol bits for the 1 pixel
        bw = self.bw
        bw.w(0, 1)  # no color cache
        for sym, alpha_sz in ((g, 280), (r, 256), (b, 256), (a, 256), (0, 40)):
            _emit_prefix_code(bw, _flat_lengths([sym], alpha_sz))

    def body(self, ops):
        """ops: list of ('lit', (a,r,g,b)) / ('ref', length, distance_code_value)
        / ('cache', index). Emits transform terminator, code headers, and
        the symbol stream."""
        bw = self.bw
        bw.w(0, 1)  # end of transforms
        if self.cache_bits:
            bw.w(1, 1)
            bw.w(self.cache_bits, 4)
        else:
            bw.w(0, 1)
        bw.w(0, 1)  # no meta prefix image
        cache_size = (1 << self.cache_bits) if self.cache_bits else 0
        greens, reds, blues, alphas, dists = set(), set(), set(), set(), set()
        for op in ops:
            if op[0] == "lit":
                a, r, g, b = op[1]
                greens.add(g); reds.add(r); blues.add(b); alphas.add(a)
            elif op[0] == "ref":
                greens.add(256 + _value_prefix(op[1])[0])
                dists.add(_value_prefix(op[2])[0])
            else:
                greens.add(280 + op[1])
        galpha = 256 + 24 + cache_size
        codes = []
        for used, alpha_sz in ((greens, galpha), (reds, 256), (blues, 256),
                               (alphas, 256), (dists or {0}, 40)):
            lengths = _flat_lengths(used, alpha_sz)
            _emit_prefix_code(bw, lengths)
            codes.append(_canon(lengths) if len(used) > 1 else
                         {next(iter(used)): (0, 0)})
        gc, rc, bc, ac, dc = codes

        def emit(tbl, sym):
            l, c = tbl[sym]
            if l:
                bw.code(c, l)

        for op in ops:
            if op[0] == "lit":
                a, r, g, b = op[1]
                emit(gc, g); emit(rc, r); emit(bc, b); emit(ac, a)
            elif op[0] == "ref":
                lcode, lext, lval = _value_prefix(op[1])
                emit(gc, 256 + lcode)
                bw.w(lval, lext)
                dcode, dext, dval = _value_prefix(op[2])
                emit(dc, dcode)
                bw.w(dval, dext)
            else:
                emit(gc, 280 + op[1])

    def container(self):
        payload = b"\x2f" + self.bw.tobytes()
        if len(payload) & 1:
            chunk = payload + b"\x00"
        else:
            chunk = payload
        import struct as _s

        body = (b"WEBP" + b"VP8L" + _s.pack("<I", len(payload)) + chunk)
        return b"RIFF" + _s.pack("<I", len(body)) + body


def _lit(p):
    return ("lit", (255, (p * 3) % 256, p % 256, (p * 5) % 256))


def _assert_conformant(builder):
    data = builder.container()
    want = decode_webp_libwebp(data)
    got = decode_vp8l(data)
    np.testing.assert_array_equal(got, want)
    return want


class TestHandStreams:
    def test_all_120_distance_codes(self):
        w, h = 16, 12
        for code in range(1, 121):
            m = __import__(
                "data_diff_spark.functions.webp", fromlist=["_DIST_MAP"]
            )._DIST_MAP[code - 1]
            dy, dx = m >> 4, 8 - (m & 0xF)
            dist = max(dy * w + dx, 1)
            prefix_rows = 9  # 144 literals >= any mapped distance (<=120)
            n_lit = prefix_rows * w
            ops = [_lit(p) for p in range(n_lit)]
            ops.append(("ref", w, code))  # copy one full row
            ops += [_lit(p + 1000) for p in range(w * h - n_lit - w)]
            b = _StreamBuilder(w, h)
            b.body(ops)
            want = _assert_conformant(b)
            # and the copy really landed where the 2D map says
            src_row, src_col = divmod(n_lit - dist, w)
            np.testing.assert_array_equal(
                want[prefix_rows, 0], want[src_row, src_col]
            )

    def test_plain_distances_beyond_120(self):
        w, h = 16, 6
        for dist in (1, 2, 15, 16, 17, 40):
            ops = [_lit(p) for p in range(3 * w)]
            ops.append(("ref", 2 * w, dist + 120))
            ops += [_lit(p) for p in range(w * h - 5 * w)]
            b = _StreamBuilder(w, h)
            b.body(ops)
            _assert_conformant(b)

    def test_color_cache_roundtrip(self):
        bits = 4
        w, h = 8, 4
        px = (255, 77, 12, 200)
        a, r, g, bl = px
        argb = (a << 24) | (r << 16) | (g << 8) | bl
        idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)
        ops = [("lit", px)]
        ops += [("cache", idx)] * (w * h - 1)
        b = _StreamBuilder(w, h, cache_bits=bits)
        b.body(ops)
        want = _assert_conformant(b)
        assert tuple(want[3, 7]) == (r, g, bl, a)

    def test_all_14_predictor_modes(self):
        # 1x1 predictor subimage selects one mode for the whole frame;
        # w=16 means the rightmost column exercises the TR wrap-to-row-start
        # rule for modes that read the top-right neighbor
        for mode in range(14):
            w, h = 16, 8
            b = _StreamBuilder(w, h)
            b.predictor_transform(mode)
            b.body([_lit(p * 13 + 7) for p in range(w * h)])
            _assert_conformant(b)

    def test_color_transform_deltas(self):
        for g2r, g2b, r2b in [(0x35, 0x10, 0xF0), (0x80, 0x7F, 0x01),
                              (0xFF, 0x01, 0x80)]:
            b = _StreamBuilder(16, 8)
            b.color_transform(g2r, g2b, r2b)
            b.body([_lit(p * 7 + 3) for p in range(16 * 8)])
            _assert_conformant(b)

    def test_subtract_green_and_stacking(self):
        b = _StreamBuilder(16, 8)
        b.subtract_green()
        b.body([_lit(p * 11 + 1) for p in range(16 * 8)])
        _assert_conformant(b)
        # stacked: subtract-green then predictor (inverse order reversed)
        b = _StreamBuilder(16, 8)
        b.subtract_green()
        b.predictor_transform(11)
        b.body([_lit(p * 5 + 2) for p in range(16 * 8)])
        _assert_conformant(b)

    def test_cache_updated_by_backref_copies(self):
        """Spec rule: pixels produced by BACKWARD REFERENCES enter the
        color cache too. Pinned non-vacuously: P1 and P2 share a cache
        slot, P2 overwrites P1's entry, then a backref re-copies P1 — the
        following cache reference resolves to P1 ONLY if the copy
        re-inserted it. A decoder that skips insert-on-copy yields P2
        there and diverges from libwebp."""
        bits = 6

        def slot(argb):
            return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)

        def argb_of(px):
            a, r, g, bl = px
            return (a << 24) | (r << 16) | (g << 8) | bl

        p1 = (255, 10, 20, 30)
        s = slot(argb_of(p1))
        p2 = next(
            (255, 10, 20, bl) for bl in range(256)
            if bl != 30 and slot(argb_of((255, 10, 20, bl))) == s
        )
        # fillers must not touch slot s, or they would overwrite the entry
        fillers = [
            px for px in (_lit(p)[1] for p in range(40, 400))
            if slot(argb_of(px)) != s
        ]
        w, h = 8, 4
        ops = [("lit", p1), ("lit", p2)]
        ops += [("lit", f) for f in fillers[: w - 2]]  # finish row 0
        # plain distance back to p1 (pos=w, p1 at pos 0): dist w -> code w+120
        ops.append(("ref", 1, w + 120))
        ops.append(("cache", s))  # must resolve to p1, not p2
        ops += [("lit", f) for f in fillers[w - 2: w - 2 + (w * h - w - 2)]]
        b = _StreamBuilder(w, h, cache_bits=bits)
        b.body(ops)
        want = _assert_conformant(b)
        assert tuple(want[1, 0]) == (p1[1], p1[2], p1[3], p1[0])  # the copy
        assert tuple(want[1, 1]) == (p1[1], p1[2], p1[3], p1[0])  # cache hit


class TestMutationCoverage:
    """Prove the pins are not vacuous: corrupting a decoder table must
    break at least one fixture family. If these fail after an edit, the
    fixtures no longer exercise that table — fix the fixtures, not the
    assertion."""

    @staticmethod
    def _ref_stream(code):
        w, h = 16, 12
        ops = [_lit(p) for p in range(9 * w)]
        ops.append(("ref", w, code))
        ops += [_lit(p + 1000) for p in range(w * h - 10 * w)]
        b = _StreamBuilder(w, h)
        b.body(ops)
        return b.container()

    def test_distance_map_is_load_bearing(self, monkeypatch):
        from data_diff_spark.functions import webp as W

        data = self._ref_stream(1)  # uses _DIST_MAP[0]
        want = decode_webp_libwebp(data)
        np.testing.assert_array_equal(decode_vp8l(data), want)
        # swap two entries of the 2D distance table -> the copy lands wrong
        bad = bytearray(W._DIST_MAP)
        bad[0], bad[1] = bad[1], bad[0]
        monkeypatch.setattr(W, "_DIST_MAP", bytes(bad))
        try:
            got = decode_vp8l(data)
        except ValueError:
            return  # corrupted reference walked out of bounds: detected
        assert not np.array_equal(got, want)

    def test_predictor_semantics_are_load_bearing(self, monkeypatch):
        from data_diff_spark.functions import webp as W

        b = _StreamBuilder(16, 8)
        b.predictor_transform(11)  # Select
        b.body([_lit(p * 13 + 7) for p in range(16 * 8)])
        data = b.container()
        want = decode_webp_libwebp(data)
        np.testing.assert_array_equal(decode_vp8l(data), want)
        # break Select's choice rule -> the mode-11 stream corrupts
        monkeypatch.setattr(W, "_select", lambda l, t, tl: t)
        assert not np.array_equal(decode_vp8l(data), want)


def test_decode_webp_dispatch_matches_both_paths():
    arr = _rgba(10, 12, (5, 6, 7))
    data = encode_webp_lossless(arr)
    np.testing.assert_array_equal(decode_webp(data), decode_vp8l(data))


def test_decode_image_dispatches_webp():
    from data_diff_spark.functions.multimodal import decode_image

    arr = _rgba(6, 9, (1, 2, 3))
    got = decode_image(encode_webp_lossless(arr))
    np.testing.assert_array_equal(got, arr)


def test_cpython_fixture_if_present():
    """The webp file CPython ships in its test suite (VP8X container) —
    a foreign, non-libwebp-generated-by-us sample."""
    import glob

    hits = glob.glob("/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.webp")
    if not hits:
        pytest.skip("no cpython webp fixture on this machine")
    data = open(hits[0], "rb").read()
    want = decode_webp_libwebp(data)
    try:
        got = decode_vp8l(data)
    except NotImplementedError:
        pytest.skip("cpython fixture is lossy VP8; native path is VP8L-only")
    np.testing.assert_array_equal(got, want)
