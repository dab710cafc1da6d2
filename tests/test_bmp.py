"""BMP codec pins (functions/bmp.py): round-trips across channel
layouts and alignment cases, hand-assembled RLE8 streams exercising
every escape, top-down vs bottom-up, and mutation/error paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_diff_spark.functions.bmp import decode_bmp, encode_bmp, _decode_rle8


def rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(7, 5), (8, 8), (3, 13)])
def test_grey_roundtrip(shape):
    img = rng(1).integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert out.shape == shape and (out == img).all()


@pytest.mark.parametrize("w", [4, 5, 6, 7])  # every stride-padding case
def test_rgb_roundtrip_all_paddings(w):
    img = rng(w).integers(0, 256, size=(6, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert out.shape == (6, w, 3) and (out == img).all()


def test_rgba_roundtrip():
    img = rng(3).integers(0, 256, size=(5, 9, 4), dtype=np.uint8)
    out = decode_bmp(encode_bmp(img))
    assert out.shape == (5, 9, 4) and (out == img).all()


def test_top_down_negative_height():
    img = rng(4).integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    # flip height sign and pre-flip rows: same decoded image
    h = struct.unpack_from("<i", data, 22)[0]
    struct.pack_into("<i", data, 22, -h)
    pix_off = struct.unpack_from("<I", data, 10)[0]
    stride = (4 * 3 + 3) & ~3
    rows = np.frombuffer(bytes(data[pix_off:]), dtype=np.uint8).reshape(6, stride)
    data[pix_off:] = rows[::-1].tobytes()
    assert (decode_bmp(bytes(data)) == img).all()


def test_color_palette_8bit():
    """Hand-build an 8-bit BMP with a NON-grey palette: decode must
    return (h, w, 3) through the palette."""
    pal = bytearray()
    for i in range(256):
        pal += bytes([i, 255 - i, (i * 7) % 256, 0])  # BGRX
    w, h = 5, 3
    stride = (w + 3) & ~3
    idx = rng(5).integers(0, 256, size=(h, w), dtype=np.uint8)
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :w] = idx[::-1]
    pix_off = 14 + 40 + len(pal)
    data = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, 0, 0, 0, 256, 0)
        + bytes(pal) + body.tobytes()
    )
    out = decode_bmp(data)
    assert out.shape == (h, w, 3)
    expect = np.stack(
        [(idx * 7) % 256, 255 - idx, idx], axis=2
    ).astype(np.uint8)  # palette BGRX -> RGB
    assert (out == expect).all()


def test_rle8_runs_and_escapes():
    """Hand-assemble RLE8: encoded runs, absolute mode (odd length, so
    the word-alignment pad byte is exercised), EOL, delta, EOB."""
    w, h = 8, 3
    stream = bytes([
        4, 7,            # run: 4 pixels of 7
        0, 3, 1, 2, 3, 0,  # absolute: 3 literal bytes + pad
        0, 0,            # EOL -> row 1
        0, 2, 2, 1,      # delta: skip to x=2 on row 2 (y+=1)
        5, 9,            # run of 9s
        0, 1,            # EOB
    ])
    out = _decode_rle8(stream, w, h)
    row0 = [7, 7, 7, 7, 1, 2, 3, 0]
    row2 = [0, 0, 9, 9, 9, 9, 9, 0]
    assert out[0].tolist() == row0
    assert out[1].tolist() == [0] * w
    assert out[2].tolist() == row2


def test_rle8_full_file_decode():
    """RLE8 inside a real header: stored bottom-up, grey palette."""
    w, h = 4, 2
    stream = bytes([4, 10, 0, 0, 4, 200, 0, 1])  # bottom row 10s, top row 200s
    pal = b"".join(bytes([g, g, g, 0]) for g in range(256))
    pix_off = 14 + 40 + len(pal)
    data = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream), 0, 0, 256, 0)
        + pal + stream
    )
    out = decode_bmp(data)
    assert out.shape == (h, w)
    assert out[0].tolist() == [200] * 4 and out[1].tolist() == [10] * 4


def test_run_clipped_at_row_end():
    out = _decode_rle8(bytes([200, 5, 0, 1]), 4, 1)
    assert out[0].tolist() == [5, 5, 5, 5]


def test_decode_image_dispatch():
    from data_diff_spark.functions.multimodal import decode_image

    img = rng(9).integers(0, 256, size=(5, 5, 3), dtype=np.uint8)
    assert (decode_image(encode_bmp(img)) == img).all()


def test_bad_signature_raises():
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + bytes(60))


def test_unsupported_bitfields_raises():
    img = rng(2).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    struct.pack_into("<I", data, 30, 3)  # BI_BITFIELDS
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(data))


def test_mutated_pixel_detected():
    img = rng(6).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    data[-1] ^= 0xFF
    assert not (decode_bmp(bytes(data)) == img).all()


def test_index_beyond_color_table_raises():
    """A malformed BMP declaring biClrUsed=16 with pixel bytes >= 16 must
    raise ValueError (the GIF path's contract), not a numpy IndexError."""
    pal = bytes(bytearray([c for i in range(16) for c in (i, i, i, 0)]))
    w, h = 4, 2
    body = np.full((h, 4), 200, dtype=np.uint8)  # index 200 >= 16
    pix_off = 14 + 40 + len(pal)
    data = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, 0, 0, 0, 16, 0)
        + pal + body.tobytes()
    )
    with pytest.raises(ValueError, match="beyond color table"):
        decode_bmp(data)
