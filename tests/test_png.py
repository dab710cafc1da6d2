"""Pure numpy+zlib PNG codec (functions/multimodal.py): the decoder's
un-filtering is pinned against bytes constructed FORWARD per the spec
(the test implements the filter direction, the decoder its inverse —
independent implementations), plus encode/decode roundtrips and the
decode_image dispatch."""

import struct
import zlib

import numpy as np
import pytest

from data_diff_spark.functions.multimodal import (
    _PNG_SIG,
    decode_image,
    decode_png,
    encode_png,
)


def _chunk(ctype, payload):
    raw = ctype + payload
    return struct.pack(">I", len(payload)) + raw + struct.pack(
        ">I", zlib.crc32(raw) & 0xFFFFFFFF
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _build_png_with_filters(pixels, ch):
    """Forward-filter each row with filter type (row_index % 5) and emit a
    complete PNG byte stream — no shared code with the decoder."""
    h, w = pixels.shape[0], pixels.shape[1]
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(int)
    scan = b""
    for y in range(h):
        f = y % 5
        row, out = flat[y], []
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=int)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - a
            elif f == 2:
                v = row[x] - b
            elif f == 3:
                v = row[x] - ((a + b) >> 1)
            else:
                v = row[x] - _paeth(a, b, c)
            out.append(v & 0xFF)
        scan += bytes([f]) + bytes(out)
    color = {1: 0, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ch", [1, 3, 4], ids=["grey", "rgb", "rgba"])
def test_decoder_inverts_spec_filters(ch):
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(7, 5, ch), dtype=np.uint8)
    data = _build_png_with_filters(px, ch)
    got = decode_png(data)
    want = px[:, :, 0] if ch == 1 else px
    assert np.array_equal(got, want)


@pytest.mark.parametrize("shape", [(6, 4), (5, 3, 3), (4, 4, 4)])
def test_roundtrip(shape):
    rng = np.random.default_rng(9)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(a)), a)


def test_decode_image_dispatch_and_gates():
    a = np.arange(12, dtype=np.uint8).reshape(4, 3)
    assert np.array_equal(decode_image(encode_png(a)), a)
    # webp decodes natively now (tests/test_webp.py); a truncated
    # container is malformed, not unsupported
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(b"RIFF....WEBPVP8 ")
    # an impossible depth/color combination is refused with the PIL
    # pointer, not mis-decoded (all practical PNGs decode natively now)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)  # 4-bit RGB
    deep = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_png(deep)


def test_palette_png_decodes_via_plte():
    # 3x2 palette image built by hand: indices map through a 4-entry PLTE
    pal = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  7, 7, 7])
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
    scan = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    data = (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", pal)
            + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b""))
    got = decode_png(data)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
         [[7, 7, 7], [255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    assert np.array_equal(got, want)


# --- 16-bit and Adam7 interlace (round 6) -------------------------------------
# Forward implementation written independently from the decoder: spec filter
# direction, spec pass geometry (PNG §8.2), big-endian sample packing.

_ADAM7_FWD = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _filter_rows(flat, stride, bpp):
    """Forward-filter rows (filter type = row % 5) -> scanline bytes."""
    scan = b""
    for y in range(flat.shape[0]):
        f = y % 5
        row, out = flat[y], []
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=int)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            v = (row[x], row[x] - a, row[x] - b,
                 row[x] - ((a + b) >> 1), row[x] - _paeth(a, b, c))[f]
            out.append(v & 0xFF)
        scan += bytes([f]) + bytes(out)
    return scan


def _build_png2(pixels, depth, interlace):
    """pixels: (h, w, ch) ints < 2**depth. Emits a full PNG stream."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    bps = depth // 8
    bpp = ch * bps
    dt = ">u2" if depth == 16 else "u1"
    scan = b""
    if interlace == 0:
        rows = np.asarray(pixels, dtype=dt).reshape(h, -1).view(np.uint8)
        rows = np.frombuffer(rows.tobytes(), np.uint8).reshape(h, w * bpp)
        scan = _filter_rows(rows.astype(int), w * bpp, bpp)
    else:
        for x0, y0, dx, dy in _ADAM7_FWD:
            sub = pixels[y0::dy, x0::dx]
            hp, wp = sub.shape[:2]
            if hp == 0 or wp == 0:
                continue
            rows = np.asarray(sub, dtype=dt).reshape(hp, -1).view(np.uint8)
            rows = np.frombuffer(rows.tobytes(), np.uint8).reshape(hp, wp * bpp)
            scan += _filter_rows(rows.astype(int), wp * bpp, bpp)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b""))


@pytest.mark.parametrize("ch", [1, 2, 3, 4], ids=["grey", "greyA", "rgb", "rgba"])
@pytest.mark.parametrize("depth", [8, 16])
@pytest.mark.parametrize("interlace", [0, 1])
def test_depth_interlace_matrix(ch, depth, interlace):
    rng = np.random.default_rng(ch * depth + interlace)
    px = rng.integers(0, 2 ** depth, size=(13, 11, ch)).astype(
        np.uint16 if depth == 16 else np.uint8)
    got = decode_png(_build_png2(px, depth, interlace))
    want = px[:, :, 0] if ch == 1 else px
    assert got.dtype == (np.uint16 if depth == 16 else np.uint8)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("shape", [(1, 1), (2, 3), (7, 9), (8, 8), (9, 17)])
def test_interlace_odd_sizes(shape):
    """Adam7 with dimensions that leave some passes EMPTY (no scanlines at
    all, per spec) — the classic interlace decoder bug."""
    rng = np.random.default_rng(sum(shape))
    px = rng.integers(0, 256, size=shape + (3,), dtype=np.uint8)
    assert np.array_equal(decode_png(_build_png2(px, 8, 1)), px)


def test_grey_alpha_noninterlaced():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(6, 5, 2), dtype=np.uint8)
    got = decode_png(_build_png2(px, 8, 0))
    assert got.shape == (6, 5, 2) and np.array_equal(got, px)


# --- sub-byte depths (round 6, closing the PNG gate entirely) -----------------


def _build_png_subbyte(samples, depth, color, interlace, plte=None):
    """samples: (h, w) ints < 2**depth. Independent forward path: MSB-first
    bit packing per scanline (padded to byte), filters on byte level with
    bpp=1, Adam7 geometry re-packed per pass."""
    h, w = samples.shape

    def pack_rows(sub):
        hp, wp = sub.shape
        rows = np.zeros((hp, (wp * depth + 7) // 8 * 8), dtype=np.uint8)
        for d in range(depth):
            rows[:, :wp * depth][:, d::depth] = (sub >> (depth - 1 - d)) & 1
        return np.packbits(rows, axis=1)

    def filt(rows):
        out = b""
        prev = np.zeros(rows.shape[1], dtype=int)
        for y in range(rows.shape[0]):
            f = y % 5
            row = rows[y].astype(int)
            enc = []
            for x in range(row.shape[0]):
                a = row[x - 1] if x >= 1 else 0
                b = prev[x]
                c = prev[x - 1] if x >= 1 else 0
                v = (row[x], row[x] - a, row[x] - b,
                     row[x] - ((a + b) >> 1), row[x] - _paeth(a, b, c))[f]
                enc.append(v & 0xFF)
            out += bytes([f]) + bytes(enc)
            prev = row
        return out

    scan = b""
    if interlace == 0:
        scan = filt(pack_rows(samples))
    else:
        for x0, y0, dx, dy in _ADAM7_FWD:
            sub = samples[y0::dy, x0::dx]
            if sub.size:
                scan += filt(pack_rows(sub))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    chunks = _PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        chunks += _chunk(b"PLTE", plte)
    return chunks + _chunk(b"IDAT", zlib.compress(scan)) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("depth", [1, 2, 4])
@pytest.mark.parametrize("interlace", [0, 1])
def test_subbyte_grey(depth, interlace):
    rng = np.random.default_rng(depth * 3 + interlace)
    px = rng.integers(0, 1 << depth, size=(13, 11)).astype(np.uint8)
    got = decode_png(_build_png_subbyte(px, depth, 0, interlace))
    scale = 255 // ((1 << depth) - 1)
    assert np.array_equal(got, (px * scale).astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_palette(depth):
    rng = np.random.default_rng(depth)
    n = 1 << depth
    plte = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    px = rng.integers(0, n, size=(9, 14)).astype(np.uint8)
    got = decode_png(_build_png_subbyte(px, depth, 3, 0, plte.tobytes()))
    assert np.array_equal(got, plte[px])


def test_subbyte_interlace_bit_padding():
    """1-bit Adam7 with widths that force per-pass bit padding (each pass
    packs its own rows to byte boundaries) — the packing edge case."""
    rng = np.random.default_rng(0)
    for shape in [(3, 9), (7, 17), (8, 8), (5, 1)]:
        px = rng.integers(0, 2, size=shape).astype(np.uint8)
        got = decode_png(_build_png_subbyte(px, 1, 0, 1))
        assert np.array_equal(got, px * 255), shape
