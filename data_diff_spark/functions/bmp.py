"""BMP (Windows DIB) decode/encode for the multimodal pipeline.

Implements the public Windows bitmap format: BITMAPFILEHEADER +
BITMAPINFOHEADER (and the larger V4/V5 headers, which extend INFOHEADER
compatibly), 8-bit palettized / 24-bit BGR / 32-bit BGRA uncompressed
rows (4-byte-aligned, bottom-up or top-down via negative height), and
RLE8 compression (encoded runs, absolute mode with word alignment,
end-of-line / end-of-bitmap / delta escapes). The format carries no
entropy coding, so decode is pure numpy slicing — the cheapest real
image format a crawled corpus contains.

Feeds decode_image / mapInPandas (functions/multimodal.py); the
reference engine has no media stack (SURVEY §2 beyond-reference
operators). Gates: 1/4/16-bit pixels and BITFIELDS masks raise with the
variant named — rare in corpora, documented rather than guessed.
"""

from __future__ import annotations

import struct


def decode_bmp(data: bytes):
    """Decode to (h, w) uint8 for 8-bit greyscale-palette images whose
    palette is exactly grey ramps, else (h, w, 3) / (h, w, 4) uint8 RGB /
    RGBA (BGR order converted)."""
    import numpy as np

    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP (missing BM signature / truncated)")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER (OS/2) BMP not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    n_colors = struct.unpack_from("<I", data, 46)[0]
    if w <= 0 or h == 0 or planes != 1:
        raise ValueError(f"bad BMP dimensions {w}x{h} planes={planes}")
    top_down = h < 0
    h = abs(h)

    palette = None
    if bpp == 8:
        n = n_colors or 256
        pal_off = 14 + hdr_size
        raw = np.frombuffer(data, dtype=np.uint8, count=4 * n, offset=pal_off)
        palette = raw.reshape(n, 4)[:, [2, 1, 0]].copy()  # BGRX -> RGB

    if compression == 1:  # BI_RLE8
        if bpp != 8:
            raise ValueError("RLE8 requires 8-bit pixels")
        idx = _decode_rle8(data[pix_off:], w, h)
    elif compression == 0:  # BI_RGB
        if bpp not in (8, 24, 32):
            raise NotImplementedError(f"{bpp}-bit uncompressed BMP not supported")
        stride = (w * (bpp // 8) + 3) & ~3
        need = stride * h
        raw = np.frombuffer(data, dtype=np.uint8, count=need, offset=pix_off)
        rows = raw.reshape(h, stride)
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 24:
            px = rows[:, : w * 3].reshape(h, w, 3)
        else:
            px = rows[:, : w * 4].reshape(h, w, 4)
    else:
        raise NotImplementedError(
            f"BMP compression {compression} (BITFIELDS/RLE4/...) not supported"
        )

    if bpp == 8:
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError(
                f"BMP pixel index {int(idx.max(initial=0))} beyond color "
                f"table ({len(palette)} entries)"
            )
        out = palette[idx]  # (h, w, 3)
        if (palette[:, 0] == palette[:, 1]).all() and (
            palette[:, 1] == palette[:, 2]
        ).all():
            out = palette[:, 0][idx]  # pure grey ramp -> (h, w)
    elif bpp == 24:
        out = px[:, :, [2, 1, 0]]  # BGR -> RGB
    else:
        out = px[:, :, [2, 1, 0, 3]]  # BGRA -> RGBA
    if not top_down:
        out = out[::-1]
    return np.ascontiguousarray(out)


def _decode_rle8(data: bytes, w: int, h: int):
    """RLE8 per the public spec: (count, value) runs; escape 0 then
    0=EOL, 1=EOB, 2=delta(dx,dy), n>=3=absolute run of n bytes padded to
    word boundary. Pixels the stream never touches stay 0 (the spec's
    'delta skips' leave undefined pixels; 0 is the deterministic
    choice renderers use)."""
    import numpy as np

    out = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    n = len(data)
    while pos + 1 < n:
        c, v = data[pos], data[pos + 1]
        pos += 2
        if c:
            end = min(x + c, w)
            out[y, x:end] = v
            x = end
            continue
        if v == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if pos + 2 > n:
                raise ValueError("truncated RLE8 delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if y >= h or x > w:
                raise ValueError("RLE8 delta escapes the bitmap")
        else:  # absolute mode: v literal bytes, word-aligned
            if pos + v > n:
                raise ValueError("truncated RLE8 absolute run")
            end = min(x + v, w)
            out[y, x:end] = np.frombuffer(
                data, dtype=np.uint8, count=end - x, offset=pos
            )
            x = end
            pos += v + (v & 1)
    # rows above are stored bottom-up like everything else; caller flips
    return out


def encode_bmp(arr) -> bytes:
    """Encode (h, w) uint8 as 8-bit grey-palette BMP, (h, w, 3) as 24-bit
    BI_RGB, (h, w, 4) as 32-bit — bottom-up, rows 4-byte aligned. Exact
    round-trip: decode_bmp(encode_bmp(a)) == a."""
    import numpy as np

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        bpp, ch = 8, 1
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        ch = a.shape[2]
        bpp = 8 * ch
    else:
        raise ValueError(f"expected (h,w)/(h,w,3)/(h,w,4) uint8, got {a.shape}")
    h, w = a.shape[:2]
    stride = (w * ch + 3) & ~3
    pal = b""
    if bpp == 8:
        pal = b"".join(bytes([g, g, g, 0]) for g in range(256))
    pix_off = 14 + 40 + len(pal)
    body = np.zeros((h, stride), dtype=np.uint8)
    rows = a[::-1]
    if ch == 1:
        body[:, :w] = rows
    elif ch == 3:
        body[:, : w * 3] = rows[:, :, [2, 1, 0]].reshape(h, w * 3)
    else:
        body[:, : w * 4] = rows[:, :, [2, 1, 0, 3]].reshape(h, w * 4)
    raw = body.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(raw), 0, 0, pix_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(raw), 2835, 2835,
        256 if bpp == 8 else 0, 0,
    )
    return hdr + info + pal + raw
