"""GIF decode/encode for the multimodal pipeline.

Implements the public GIF89a specification (CompuServe, 1990 — the
format is fully documented and patent-expired): header + logical screen
descriptor, global/local color tables, interlacing (the 4-pass row
order), the 89a extension blocks (graphic control: disposal method,
transparency index, frame delay; comment; plain text; application), and
LZW image data with variable code widths (LSB-first, 3..12 bits,
deferred-clear behavior at a full table — the case early decoders
famously got wrong).

Animation frames composite onto the logical screen the way every modern
renderer does (and the way the 89a disposal semantics require):

  - the canvas starts fully transparent (browsers ignore the background
    color index for compositing; we follow that de-facto standard and
    document it here),
  - disposal 0/1 leave the canvas as drawn,
  - disposal 2 restores the frame's rectangle to transparent,
  - disposal 3 restores the canvas as it was before the frame,
  - transparent pixels within a frame leave the canvas untouched.

`encode_gif` is a real encoder (exact palette — at most 256 distinct
colors, no quantization — plus spec LZW with clear-code table resets),
so round-trips are byte-lossless on palettized content; the tests pin
the decoder against hand-assembled bitstreams targeting each construct
(interlace, local palettes, deferred clear, every disposal mode) and
against an independent straight-from-spec string-table LZW in the test
file, with mutation checks proving the pins exercise the tables.

Reference parity note: the reference engine has no media stack; this
serves the training-pipeline story (SURVEY §2 beyond-reference
operators), feeding decode_image / mapInPandas in
functions/multimodal.py. GIF is one of the three image formats that
dominate real crawled corpora (jpeg/png/gif), and was the last of the
three without a native decoder here.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

GIF_SIGS = (b"GIF87a", b"GIF89a")

# interlace passes (spec appendix E): every 8th row from 0, every 8th
# from 4, every 4th from 2, every 2nd from 1 — together covering all rows
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


# --- LZW ---------------------------------------------------------------------


def lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """Decode a GIF LZW code stream (sub-blocks already concatenated) to a
    sequence of palette indices. Codes are packed LSB-first; the code
    width starts at min_code_size+1 and grows AFTER the table reaches
    2^width entries, capping at 12 (further codes reuse width 12 until a
    clear code arrives — the "deferred clear" rule). Decoding stops at
    EOI, at end-of-data, or once max_pixels indices are produced
    (trailing junk after the raster is tolerated, as renderers do)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    # string table as prefix links: entry i (>= eoi+1) is table[i] =
    # (prefix_code, suffix_byte); roots 0..clear-1 are single literals.
    prefix = [0] * _TABLE_LIMIT
    suffix = [0] * _TABLE_LIMIT
    for i in range(clear):
        suffix[i] = i

    out = bytearray()
    # LSB-first bit reader over the whole stream
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    width = min_code_size + 1
    next_code = eoi + 1
    prev: Optional[int] = None
    first_byte = 0  # first index of the previously emitted string

    def expand(code: int) -> bytes:
        stack = bytearray()
        c = code
        while c > eoi:
            stack.append(suffix[c])
            c = prefix[c]
        stack.append(suffix[c])
        stack.reverse()
        return bytes(stack)

    while len(out) < max_pixels:
        while nbits < width:
            if pos >= n:
                return out  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("first LZW code after clear must be a literal")
            out.append(code)
            prev, first_byte = code, code
            continue
        if code < next_code and code != eoi:
            entry = expand(code)
        elif code == next_code:
            # the KwKwK case: string = prev's string + its own first byte
            entry = expand(prev) + bytes([first_byte])
        else:
            raise ValueError(f"LZW code {code} beyond table size {next_code}")
        out += entry
        first_byte = entry[0]
        if next_code < _TABLE_LIMIT:
            prefix[next_code] = prev
            suffix[next_code] = entry[0]
            next_code += 1
            # width grows when the NEXT code to assign no longer fits;
            # at 12 bits the table is full and the width stays (deferred
            # clear) until the encoder sends a clear code
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = code
    return out


def lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Spec LZW encoder: emits an initial clear code, resets the table
    with a clear code whenever it fills (the simple always-clear policy —
    decoders must also handle deferred clear, which the tests cover with
    hand-assembled streams), and terminates with EOI."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {}
    next_code = eoi + 1
    emit(clear, width)
    prev = b""
    for b in indices:
        cur = prev + bytes([b])
        if len(cur) == 1 or cur in table:
            prev = cur
            continue
        # emit code for prev, add cur to table
        emit(prev[0] if len(prev) == 1 else table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code > (1 << width) and width < _MAX_CODE_WIDTH:
            width += 1
        if next_code == _TABLE_LIMIT:
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(prev[0] if len(prev) == 1 else table[prev], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- container parse ---------------------------------------------------------


def _sub_blocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; returns (payload,
    position after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + size])
        if len(data[pos : pos + size]) < size:
            raise ValueError("truncated GIF sub-block")
        pos += size


def _deinterlace(rows, h: int):
    """Map interlaced row order back to display order (spec appendix E)."""
    order = []
    for first, step in _INTERLACE:
        order.extend(range(first, h, step))
    import numpy as np

    out = np.empty_like(rows)
    out[np.asarray(order, dtype=np.int64)] = rows
    return out


class GifFrame:
    __slots__ = ("left", "top", "width", "height", "indices", "palette",
                 "transparent", "disposal", "delay_cs")

    def __init__(self, left, top, width, height, indices, palette,
                 transparent, disposal, delay_cs):
        self.left, self.top = left, top
        self.width, self.height = width, height
        self.indices = indices          # (h, w) uint8 palette indices
        self.palette = palette          # (n, 3) uint8
        self.transparent = transparent  # index or None
        self.disposal = disposal        # 0..3
        self.delay_cs = delay_cs        # centiseconds


def parse_gif(data: bytes):
    """Parse the container: returns (screen_w, screen_h, frames) with
    frames as GifFrame objects in file order, raster deinterlaced and
    clipped to the declared frame size."""
    import numpy as np

    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n

    frames: List[GifFrame] = []
    transparent: Optional[int] = None
    disposal = 0
    delay_cs = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                gc_packed, delay_cs, tidx = struct.unpack_from("<BHB", payload, 0)
                disposal = (gc_packed >> 2) & 0x07
                transparent = tidx if gc_packed & 0x01 else None
            # comment (0xFE) / plain text (0x01) / application (0xFF,
            # e.g. NETSCAPE2.0 looping) carry no raster data: skipped
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at {pos - 1}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if fw == 0 or fh == 0:
            raise ValueError("zero-sized GIF frame")
        palette = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            palette = np.frombuffer(
                data, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF frame with neither local nor global color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        mcs = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        idx = lzw_decode(mcs, lzw, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError(
                f"GIF raster underrun: {len(idx)} of {fw * fh} pixels"
            )
        rows = np.frombuffer(bytes(idx[: fw * fh]), dtype=np.uint8).reshape(fh, fw)
        if ipacked & 0x40:
            rows = _deinterlace(rows, fh)
        if int(rows.max(initial=0)) >= len(palette):
            raise ValueError("GIF pixel index beyond color table")
        frames.append(GifFrame(
            left, top, fw, fh, rows, palette, transparent, disposal, delay_cs
        ))
        # graphic control applies to ONE following image (spec 89a §23)
        transparent, disposal, delay_cs = None, 0, 0
    if not frames:
        raise ValueError("GIF contains no image data")
    return sw, sh, frames


# --- compositing -------------------------------------------------------------


def decode_gif_frames(data: bytes):
    """Decode all frames composited onto the logical screen: a list of
    (screen_h, screen_w, 4) uint8 RGBA arrays, one per frame, applying
    the 89a disposal semantics (module docstring)."""
    import numpy as np

    sw, sh, frames = parse_gif(data)
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    out = []
    for fr in frames:
        # clip the frame rect to the screen (spec allows out-of-bounds)
        y0, x0 = fr.top, fr.left
        y1, x1 = min(y0 + fr.height, sh), min(x0 + fr.width, sw)
        if y1 <= y0 or x1 <= x0:
            out.append(canvas.copy())
            continue
        before = canvas.copy() if fr.disposal == 3 else None
        idx = fr.indices[: y1 - y0, : x1 - x0]
        rgba = np.empty((y1 - y0, x1 - x0, 4), dtype=np.uint8)
        rgba[..., :3] = fr.palette[idx]
        rgba[..., 3] = 255
        region = canvas[y0:y1, x0:x1]
        if fr.transparent is not None:
            opaque = idx != fr.transparent
            region[opaque] = rgba[opaque]
        else:
            region[:] = rgba
        out.append(canvas.copy())
        if fr.disposal == 2:
            canvas[y0:y1, x0:x1] = 0
        elif fr.disposal == 3:
            canvas = before
    return out


def decode_gif(data: bytes):
    """First composited frame, as (h, w, 3) uint8 when fully opaque else
    (h, w, 4) — mirroring decode_png's channel convention so
    decode_image callers see one contract across formats."""
    frame = decode_gif_frames(data)[0]
    import numpy as np

    if int(frame[..., 3].min(initial=255)) == 255:
        return np.ascontiguousarray(frame[..., :3])
    return frame


# --- encoder -----------------------------------------------------------------


def _palette_bits(n_colors: int) -> int:
    bits = 1
    while (2 << (bits - 1)) < n_colors:
        bits += 1
    return bits  # color table size field = bits - 1; table has 2**bits entries


def _pack_sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(frames, delays_cs=None, disposal: int = 1,
               transparent_rgb=None, interlace: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 frame(s) as GIF89a with an EXACT global
    palette (all frames together must use <= 256 distinct colors; no
    quantization — raise otherwise, this is a codec, not an artist).
    `transparent_rgb`, when given, marks that color transparent in every
    frame. Round-trip contract: decode_gif_frames(encode_gif(fs))
    reproduces each input frame exactly wherever pixels are opaque."""
    import numpy as np

    if not isinstance(frames, (list, tuple)):
        frames = [frames]
    arrs = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    for a in arrs:
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError(f"expected (h,w,3) uint8 frames, got {a.shape}")
    h, w = arrs[0].shape[:2]
    if any(a.shape[:2] != (h, w) for a in arrs):
        raise ValueError("all frames must share one size (full-screen frames)")

    flat = np.concatenate([a.reshape(-1, 3) for a in arrs])
    colors = np.unique(flat, axis=0)
    if transparent_rgb is not None:
        t = np.asarray(transparent_rgb, dtype=np.uint8).reshape(1, 3)
        if not (colors == t).all(axis=1).any():
            colors = np.concatenate([colors, t])
    if len(colors) > 256:
        raise ValueError(
            f"{len(colors)} distinct colors; exact-palette GIF holds 256 — "
            "quantize upstream"
        )
    bits = _palette_bits(len(colors))
    table = np.zeros((2 << (bits - 1), 3), dtype=np.uint8)
    table[: len(colors)] = colors
    # color -> index lookup, fully vectorized: searchsorted over the
    # packed-int palette (exact — every pixel color is in the palette by
    # construction)
    packed = (colors[:, 0].astype(np.int64) << 16) | (
        colors[:, 1].astype(np.int64) << 8
    ) | colors[:, 2].astype(np.int64)
    lut_order = np.argsort(packed)
    lut_keys = packed[lut_order]
    tindex = None
    if transparent_rgb is not None:
        t = np.asarray(transparent_rgb, dtype=np.uint8)
        tp = (int(t[0]) << 16) | (int(t[1]) << 8) | int(t[2])
        tindex = int(lut_order[np.searchsorted(lut_keys, tp)])

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += table.tobytes()
    if len(arrs) > 1:
        # NETSCAPE2.0 loop-forever application extension (the de-facto
        # animation marker): 11-byte identifier block, one 3-byte data
        # sub-block (id 1 + loop count 0 = forever), terminator
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    if delays_cs is not None and len(delays_cs) != len(arrs):
        raise ValueError(
            f"delays_cs has {len(delays_cs)} entries for {len(arrs)} frames"
        )
    delays = delays_cs or [0] * len(arrs)
    mcs = max(bits, 2)
    for a, delay in zip(arrs, delays):
        gc_packed = (disposal & 0x07) << 2 | (1 if tindex is not None else 0)
        out += b"\x21\xf9" + _pack_sub_blocks(
            struct.pack("<BHB", gc_packed, delay, tindex or 0)
        )
        ipacked = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
        p = (a[:, :, 0].astype(np.int64) << 16) | (
            a[:, :, 1].astype(np.int64) << 8
        ) | a[:, :, 2].astype(np.int64)
        idx = lut_order[np.searchsorted(lut_keys, p.ravel())].astype(
            np.uint8
        ).reshape(p.shape)
        if interlace:
            order = []
            for first, step in _INTERLACE:
                order.extend(range(first, h, step))
            idx = idx[np.asarray(order, dtype=np.int64)]
        out.append(mcs)
        out += _pack_sub_blocks(lzw_encode(mcs, idx.tobytes()))
    out.append(0x3B)
    return bytes(out)
