"""WebP decode for the multimodal pipeline.

Two engines, one contract (RGBA uint8 arrays):

  1. libwebp via ctypes (stdlib-only binding): the FAST path, covering
     lossy VP8 and lossless VP8L, used whenever the cluster ships
     libwebp.so (this container does). Also exposes the lossless encoder,
     which the tests use to GENERATE real bitstreams.
  2. A native pure-Python VP8L (lossless) decoder implementing the public
     WebP Lossless Bitstream Specification (RFC 9649): RIFF/VP8X
     container walk, LSB-first bit reader, canonical prefix codes (simple
     + code-length-coded forms), meta prefix codes / entropy image, color
     cache, LZ77 with the 120-entry 2D distance mapping, and all four
     transforms (predictor, color, subtract-green, color-indexing with
     pixel bundling).

The r4 review flagged that a GUESSED distance/predictor table silently
corrupts foreign files. That risk is retired by construction here: every
constant in this decoder — the distance map, predictor modes, color
transform channel layout — is pinned byte-exact against libwebp's decode
of libwebp-ENCODED bitstreams across fixture families designed to
exercise those tables (tests/test_webp.py). The native path exists for
clusters without libwebp and as executable spec documentation.

Round 6 closed the remaining gate: lossy VP8 key frames decode NATIVELY
too (functions/vp8.py, the full RFC 6386 pipeline — bool decoder, token
trees, dequant, iWHT/iDCT, intra prediction, loop filter), pinned
bit-exact against libwebp's WebPDecodeYUV across sizes, qualities,
segmentation states, and content families (tests/test_vp8.py). Without
libwebp, decode_webp now covers BOTH WebP codecs; the only remaining
difference is RGB presentation (yuv420_to_rgb uses the standard BT.601
integer formula; libwebp's own RGB output applies its 'fancy' upsampler).

Reference parity note: the reference engine has no media stack at all;
this module serves the training-data pipeline story (SURVEY §2's
beyond-reference operators), feeding decode_image/mapInPandas
(functions/multimodal.py).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
from typing import List, Optional, Tuple

# --- libwebp via ctypes -----------------------------------------------------

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def libwebp() -> Optional[ctypes.CDLL]:
    """The system libwebp, or None. Cached; never raises."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    for name in ("libwebp.so.7", "libwebp.so", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            _LIB = lib
            break
        except OSError:
            continue
    return _LIB


def decode_webp_libwebp(data: bytes):
    """RGBA uint8 (h, w, 4) via libwebp; raises if the library is absent
    or the payload is corrupt."""
    import numpy as np

    lib = libwebp()
    if lib is None:
        raise NotImplementedError("libwebp.so not found on this machine")
    w, h = ctypes.c_int(), ctypes.c_int()
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise ValueError("libwebp failed to decode the payload")
    try:
        n = w.value * h.value * 4
        arr = np.frombuffer(ctypes.string_at(buf, n), dtype=np.uint8).copy()
        return arr.reshape((h.value, w.value, 4))
    finally:
        lib.WebPFree(buf)


def encode_webp_lossless(arr) -> bytes:
    """Lossless WebP (VP8L) bytes from an RGBA/RGB (h, w, 3|4) uint8 array
    via libwebp's encoder."""
    import numpy as np

    lib = libwebp()
    if lib is None:
        raise NotImplementedError("libwebp.so not found on this machine")
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a, a, a], axis=-1)
    if a.shape[2] == 3:
        a = np.concatenate([a, np.full(a.shape[:2] + (1,), 255, np.uint8)], axis=2)
        a = np.ascontiguousarray(a)
    h_, w_ = a.shape[:2]
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeLosslessRGBA(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w_, h_, w_ * 4, ctypes.byref(out),
    )
    if not size:
        raise ValueError("libwebp lossless encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)


def encode_webp_lossy(arr, quality: float = 75.0) -> bytes:
    """Lossy WebP (VP8 key frame) bytes from an RGB (h, w, 3) uint8 array
    via libwebp's simple encoder — used to build conformance fixtures for
    the native VP8 decoder (functions/vp8.py)."""
    import numpy as np

    lib = libwebp()
    if lib is None:
        raise NotImplementedError("libwebp.so not found on this machine")
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.ascontiguousarray(np.stack([a, a, a], axis=-1))
    if a.shape[2] == 4:
        a = np.ascontiguousarray(a[:, :, :3])
    h_, w_ = a.shape[:2]
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    out = ctypes.POINTER(ctypes.c_uint8)()
    size = lib.WebPEncodeRGB(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w_, h_, w_ * 3, ctypes.c_float(quality), ctypes.byref(out),
    )
    if not size:
        raise ValueError("libwebp lossy encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)


def decode_webp_yuv_libwebp(data: bytes):
    """(Y, U, V) uint8 planes via libwebp — the ORACLE for the native VP8
    decoder: YUV planes are the normative decoder output (RFC 6386), before
    any library-specific upsampling/colorspace conversion."""
    import numpy as np

    lib = libwebp()
    if lib is None:
        raise NotImplementedError("libwebp.so not found on this machine")
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    buf = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(u), ctypes.byref(v),
                            ctypes.byref(stride), ctypes.byref(uv_stride))
    if not buf:
        raise ValueError("libwebp failed to decode the payload")
    try:
        W, H, s, us = w.value, h.value, stride.value, uv_stride.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        Y = np.frombuffer(ctypes.string_at(buf, s * H), np.uint8).reshape(H, s)[:, :W].copy()
        U = np.frombuffer(ctypes.string_at(u, us * ch), np.uint8).reshape(ch, us)[:, :cw].copy()
        V = np.frombuffer(ctypes.string_at(v, us * ch), np.uint8).reshape(ch, us)[:, :cw].copy()
        return Y, U, V
    finally:
        lib.WebPFree(buf)


# --- native VP8L decoder ----------------------------------------------------

# 2D distance mapping (RFC 9649 §4.2.2): codes 1..120 address a close
# neighborhood; byte = (dy << 4) | (8 - dx). Pinned byte-exact against
# libwebp decodes in tests/test_webp.py — do not edit without re-running
# the oracle fixtures.
_DIST_MAP = bytes([
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70,
])

_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _Bits:
    """LSB-first bit reader. Each read slices only the <=4 bytes it
    touches (k <= 14 anywhere in VP8L), keeping decode O(n) — a
    whole-payload big-int shift would re-materialize the remaining
    integer per read and turn multi-MB payloads quadratic."""

    def __init__(self, data: bytes):
        self.d = data
        self.n = len(data) * 8
        self.pos = 0

    def read(self, k: int) -> int:
        pos = self.pos
        if pos + k > self.n:
            raise ValueError("VP8L: bitstream overrun")
        chunk = int.from_bytes(self.d[pos >> 3:(pos + k + 7) >> 3], "little")
        self.pos = pos + k
        return (chunk >> (pos & 7)) & ((1 << k) - 1)


class _Prefix:
    """Canonical prefix code (DEFLATE-style assignment; stream carries each
    code MSB-first, so bit-at-a-time accumulation walks the tree)."""

    __slots__ = ("single", "table", "max_len")

    def __init__(self, lengths: List[int]):
        present = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not present:
            raise ValueError("VP8L: empty prefix code")
        if len(present) == 1:
            self.single = present[0][1]
            self.table = None
            self.max_len = 0
            return
        self.single = None
        present.sort()
        table = {}
        code = 0
        prev_len = present[0][0]
        for l, s in present:
            code <<= (l - prev_len)
            prev_len = l
            table[(l, code)] = s
            code += 1
        if code != (1 << prev_len):
            raise ValueError("VP8L: over/under-subscribed prefix code")
        self.table = table
        self.max_len = prev_len

    def read(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        t = self.table
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = t.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(br: _Bits, alphabet_size: int) -> _Prefix:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bit else 1)
        lengths[s0] = 1
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s1] = 1
        return _Prefix(lengths)
    # code-length-coded form
    num_codes = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _Prefix(cl_lengths)
    if br.read(1):  # explicit max symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    break
                lengths[symbol] = fill
                symbol += 1
    return _Prefix(lengths)


def _prefix_value(br: _Bits, code: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_entropy_image(br: _Bits, w: int, h: int, is_level0: bool):
    """A 'spatially coded image' (RFC 9649 §4.3): optional color cache,
    optional meta prefix codes (level 0 only), prefix-coded ARGB pixels
    with LZ77 and cache references. Returns a flat list of ARGB ints."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("VP8L: invalid color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read(1):  # entropy image present
        meta_bits = br.read(3) + 2
        mw, mh = _subsample_size(w, meta_bits), _subsample_size(h, meta_bits)
        meta_px = _decode_entropy_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]  # (red<<8)|green
        num_groups = max(meta) + 1

    alphabets = (256 + 24 + cache_size, 256, 256, 256, 40)
    groups = [
        tuple(_read_prefix_code(br, a) for a in alphabets)
        for _ in range(num_groups)
    ]

    pixels: List[int] = [0] * (w * h)
    pos = 0
    total = w * h
    g_codes = groups[0]
    while pos < total:
        if meta is not None:
            x, y = pos % w, pos // w
            mw = _subsample_size(w, meta_bits)
            g_codes = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        green_c, red_c, blue_c, alpha_c, dist_c = g_codes
        s = green_c.read(br)
        if s < 256:
            r = red_c.read(br)
            b = blue_c.read(br)
            a = alpha_c.read(br)
            px = (a << 24) | (r << 16) | (s << 8) | b
            pixels[pos] = px
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dcode = _prefix_value(br, dist_c.read(br))
            if dcode <= 120:
                m = _DIST_MAP[dcode - 1]
                dy, dx = m >> 4, 8 - (m & 0xF)
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dcode - 120
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: invalid backward reference")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                pos += 1
                if cache_size:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        else:
            pixels[pos] = cache[s - 280]
            pos += 1
    return pixels


# --- inverse transforms -----------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | (((a & 0xFF) + (b & 0xFF)) >> 1)
    )


def _select(l: int, t: int, tl: int) -> int:
    p_a = (l >> 24) + (t >> 24) - (tl >> 24)
    p_r = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
    p_g = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
    p_b = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
    pl = (abs(p_a - (l >> 24)) + abs(p_r - ((l >> 16) & 0xFF))
          + abs(p_g - ((l >> 8) & 0xFF)) + abs(p_b - (l & 0xFF)))
    pt = (abs(p_a - (t >> 24)) + abs(p_r - ((t >> 16) & 0xFF))
          + abs(p_g - ((t >> 8) & 0xFF)) + abs(p_b - (t & 0xFF)))
    return l if pl < pt else t


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _cas_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) << sh
    return out


def _cas_half(avg: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (avg >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation toward zero
        out |= _clamp(a + half) << sh
    return out


def _apply_predictor_inverse(pixels: List[int], w: int, h: int,
                             modes: List[int], bits: int) -> None:
    mw = _subsample_size(w, bits)
    add = lambda p, q: (  # noqa: E731 - per-channel modular add
        ((((p >> 24) + (q >> 24)) & 0xFF) << 24)
        | (((((p >> 16) & 0xFF) + ((q >> 16) & 0xFF)) & 0xFF) << 16)
        | (((((p >> 8) & 0xFF) + ((q >> 8) & 0xFF)) & 0xFF) << 8)
        | (((p & 0xFF) + (q & 0xFF)) & 0xFF)
    )
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[pos - 1]  # top row: always LEFT
            elif x == 0:
                pred = pixels[pos - w]  # left column: always TOP
            else:
                mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
                l = pixels[pos - 1]
                t = pixels[pos - w]
                tl = pixels[pos - w - 1]
                # TR of the rightmost column wraps to the current row's
                # first pixel (linear-buffer addressing, RFC 9649 §4.4.1)
                tr = pixels[pos - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(l, tr), t)
                elif mode == 6:
                    pred = _avg2(l, tl)
                elif mode == 7:
                    pred = _avg2(l, t)
                elif mode == 8:
                    pred = _avg2(tl, t)
                elif mode == 9:
                    pred = _avg2(t, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(l, tl), _avg2(t, tr))
                elif mode == 11:
                    pred = _select(l, t, tl)
                elif mode == 12:
                    pred = _cas_full(l, t, tl)
                elif mode == 13:
                    pred = _cas_half(_avg2(l, t), tl)
                else:
                    raise ValueError(f"VP8L: bad predictor mode {mode}")
            pixels[pos] = add(pixels[pos], pred)


def _ctdelta(pred: int, c: int) -> int:
    p = pred - 256 if pred >= 128 else pred  # int8
    v = c - 256 if c >= 128 else c
    return (p * v) >> 5


def _apply_color_inverse(pixels: List[int], w: int, h: int,
                         elems: List[int], bits: int) -> None:
    mw = _subsample_size(w, bits)
    for y in range(h):
        base = (y >> bits) * mw
        for x in range(w):
            e = elems[base + (x >> bits)]
            g2r = e & 0xFF            # blue channel of the transform pixel
            g2b = (e >> 8) & 0xFF     # green channel
            r2b = (e >> 16) & 0xFF    # red channel
            px = pixels[y * w + x]
            g = (px >> 8) & 0xFF
            r = ((px >> 16) & 0xFF) + _ctdelta(g2r, g)
            r &= 0xFF
            b = (px & 0xFF) + _ctdelta(g2b, g) + _ctdelta(r2b, r)
            b &= 0xFF
            pixels[y * w + x] = (px & 0xFF00FF00) | (r << 16) | b


def _apply_subtract_green_inverse(pixels: List[int]) -> None:
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def decode_vp8l(data: bytes):
    """Native VP8L decode: `data` is a full RIFF WebP container or a raw
    VP8L chunk payload. Returns an RGBA uint8 (h, w, 4) array."""
    import numpy as np

    payload = data
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        payload = _find_chunk(data, b"VP8L")
        if payload is None:
            raise NotImplementedError(
                "container holds lossy VP8, not VP8L; decode via libwebp"
            )
    if payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _Bits(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")

    # transforms, in stream order (inverse-applied in reverse)
    transforms: List[Tuple[int, object, int]] = []
    seen = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("VP8L: repeated transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color
            bits = br.read(3) + 2
            sub = _decode_entropy_image(
                br, _subsample_size(xsize, bits), _subsample_size(h, bits), False
            )
            transforms.append((ttype, sub, bits))
        elif ttype == 2:  # subtract green
            transforms.append((2, None, 0))
        else:  # color indexing
            n_colors = br.read(8) + 1
            pal_px = _decode_entropy_image(br, n_colors, 1, False)
            palette = []
            prev = 0
            for p in pal_px:  # palette entries are componentwise deltas
                cur = (
                    ((((prev >> 24) + (p >> 24)) & 0xFF) << 24)
                    | (((((prev >> 16) & 0xFF) + ((p >> 16) & 0xFF)) & 0xFF) << 16)
                    | (((((prev >> 8) & 0xFF) + ((p >> 8) & 0xFF)) & 0xFF) << 8)
                    | (((prev & 0xFF) + (p & 0xFF)) & 0xFF)
                )
                palette.append(cur)
                prev = cur
            if n_colors <= 2:
                wb = 3
            elif n_colors <= 4:
                wb = 2
            elif n_colors <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append((3, (palette, wb), 0))
            xsize = _subsample_size(xsize, wb)

    pixels = _decode_entropy_image(br, xsize, h, True)

    for ttype, tdata, bits in reversed(transforms):
        if ttype == 3:
            palette, wb = tdata
            if wb:
                per = 1 << wb
                ibits = 8 >> wb
                mask = (1 << ibits) - 1
                unpacked = [0] * (w * h)
                for y in range(h):
                    for x in range(w):
                        packed = pixels[y * xsize + (x >> wb)]
                        idx = ((packed >> 8) & 0xFF) >> ((x % per) * ibits) & mask
                        unpacked[y * w + x] = (
                            palette[idx] if idx < len(palette) else 0
                        )
                pixels = unpacked
                xsize = w
            else:
                pixels = [
                    palette[(p >> 8) & 0xFF] if ((p >> 8) & 0xFF) < len(palette) else 0
                    for p in pixels
                ]
        elif ttype == 2:
            _apply_subtract_green_inverse(pixels)
        elif ttype == 1:
            _apply_color_inverse(pixels, xsize, h, tdata, bits)
        else:
            _apply_predictor_inverse(pixels, xsize, h, tdata, bits)

    arr = np.empty((h, w, 4), dtype=np.uint8)
    flat = np.array(pixels, dtype=np.uint32).reshape((h, w))
    arr[..., 0] = (flat >> 16) & 0xFF  # R
    arr[..., 1] = (flat >> 8) & 0xFF   # G
    arr[..., 2] = flat & 0xFF          # B
    arr[..., 3] = (flat >> 24) & 0xFF  # A
    return arr


def _find_chunk(data: bytes, fourcc: bytes) -> Optional[bytes]:
    pos = 12
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if cc == fourcc:
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    return None


def decode_webp_yuv(data: bytes):
    """(Y, U, V) planes from a lossy WebP via the NATIVE VP8 decoder
    (functions/vp8.py) — the normative RFC 6386 output, pinned bit-exact
    against libwebp's WebPDecodeYUV in tests/test_vp8.py. `data` is a full
    RIFF container or a raw 'VP8 ' chunk payload."""
    from data_diff_spark.functions.vp8 import decode_vp8

    payload = data
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        payload = _find_chunk(data, b"VP8 ")
        if payload is None:
            raise ValueError("container holds no lossy VP8 chunk")
    return decode_vp8(payload)


def yuv420_to_rgb(Y, U, V):
    """4:2:0 YUV -> RGB (h, w, 3) uint8 with the standard BT.601
    limited-range integer formula (chroma duplicated 2x2). NOTE: this is a
    presentation choice, deterministic but NOT bit-identical to libwebp's
    RGB output (libwebp applies its own 'fancy' chroma upsampler); the
    normative, conformance-pinned decoder output is the YUV planes."""
    import numpy as np

    h, w = Y.shape
    up = lambda P: np.repeat(np.repeat(P, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    y = 298 * (Y.astype(np.int32) - 16)
    u = up(U) - 128
    v = up(V) - 128
    r = (y + 409 * v + 128) >> 8
    g = (y - 100 * u - 208 * v + 128) >> 8
    b = (y + 516 * u + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_webp(data: bytes):
    """RGBA (h, w, 4) uint8 from a WebP container: libwebp when present
    (fast path), else fully native — VP8L for lossless, the RFC 6386 VP8
    decoder + BT.601 conversion for lossy."""
    if libwebp() is not None:
        return decode_webp_libwebp(data)
    if data[:4] == b"RIFF" and _find_chunk(data, b"VP8 ") is not None:
        import numpy as np

        rgb = yuv420_to_rgb(*decode_webp_yuv(data))
        return np.concatenate(
            [rgb, np.full(rgb.shape[:2] + (1,), 255, np.uint8)], axis=2)
    return decode_vp8l(data)
