"""AVI (RIFF) container with MJPEG video — real video-file support.

Motion-JPEG AVI is the simplest REAL video container a crawled corpus
contains (and the interchange format camera/scanner pipelines still
emit): a RIFF tree — LIST hdrl (avih header + one strl per stream with
strh/strf) — then LIST movi holding one '00dc' chunk per compressed
frame, and an idx1 index. Every frame is an independent JPEG, so the
pure-numpy JPEG decoder (functions/jpeg.py, Huffman AND arithmetic
entropy modes) decodes real video with no new DSP.

The parser walks the RIFF tree strictly (sizes, even-padding, stream-0
chunk ids); the encoder emits a spec-complete file (avih/strh/strf with
BITMAPINFOHEADER, idx1 keyframe index). The parser is pinned against a
HAND-ASSEMBLED byte-level AVI in the tests (independent construction),
and the encoder round-trips through it.

Non-MJPEG codecs (H.264 etc.) raise with the fourcc named — real video
codecs need pyav/ffmpeg, the same documented swap-in contract as the
image stack. The reference engine has no media surface at all (SURVEY §2
beyond-reference operators).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a RIFF chunk run."""
    while pos + 8 <= end:
        cc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield cc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def parse_avi(data: bytes) -> dict:
    """Parse an AVI container: returns {width, height, us_per_frame,
    n_frames, handler, frames: [(start, size)]} for video stream 0."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' signature missing)")
    meta = {"width": None, "height": None, "us_per_frame": None,
            "n_frames": None, "handler": None, "frames": []}

    def walk(pos, end):
        for cc, body, size in _chunks(data, pos, end):
            if cc == b"LIST":
                walk(body + 4, body + size)  # body[0:4] is the list type
            elif cc == b"avih" and size >= 40:
                us, _mbps, _pad, _flags, total = struct.unpack_from("<IIIII", data, body)
                w, h = struct.unpack_from("<II", data, body + 32)
                meta.update(us_per_frame=us, n_frames=total, width=w, height=h)
            elif cc == b"strh" and size >= 8:
                if data[body:body + 4] == b"vids" and meta["handler"] is None:
                    meta["handler"] = data[body + 4:body + 8].decode("ascii", "replace")
            elif cc[:2] == b"00" and cc[2:] in (b"dc", b"db"):
                meta["frames"].append((body, size))

    walk(12, len(data))
    if meta["width"] is None:
        raise ValueError("AVI: missing avih header")
    return meta


def decode_avi_frames(data: bytes, every_n: int = 1) -> List:
    """Decode every `every_n`-th video frame of an MJPEG AVI to numpy
    arrays via the native JPEG decoder. Other codecs raise with the
    fourcc named (pyav/ffmpeg swap-in)."""
    from data_diff_spark.functions.jpeg import decode_jpeg

    meta = parse_avi(data)
    handler = (meta["handler"] or "").upper()
    if handler not in ("MJPG", "MJPEG", "JPEG"):
        raise NotImplementedError(
            f"AVI codec {meta['handler']!r} needs pyav/ffmpeg; only MJPEG "
            "decodes natively"
        )
    out = []
    for i, (start, size) in enumerate(meta["frames"]):
        if i % every_n == 0:
            out.append(decode_jpeg(data[start:start + size]))
    return out


def _chunk(cc: bytes, body: bytes) -> bytes:
    return cc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames, fps: int = 10, quant: int = 8) -> bytes:
    """Build a spec-complete MJPEG AVI from (h, w[, 3]) uint8 frames:
    avih + strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER) + movi with
    one '00dc' JPEG per frame + idx1 keyframe index."""
    from data_diff_spark.functions.jpeg import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quant=quant) for f in frames]
    us = 1_000_000 // fps
    max_size = max(len(p) for p in payloads)

    avih = struct.pack("<IIIIIIIIII", us, max_size * fps, 0, 0x10,  # HASINDEX
                       len(payloads), 0, 1, max_size, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0,
                                            1, fps, 0, len(payloads),
                                            max_size, 0, -1)
            + struct.pack("<HHHH", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_body = b""
    offsets = []
    for p in payloads:
        offsets.append(4 + len(movi_body))  # relative to the 'movi' type tag
        movi_body += _chunk(b"00dc", p)
    movi = _list(b"movi", movi_body)

    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(p))  # AVIIF_KEYFRAME
        for off, p in zip(offsets, payloads)
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
