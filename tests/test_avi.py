"""MJPEG-AVI container (functions/avi.py): the parser pinned against a
HAND-ASSEMBLED byte-level AVI (independent construction — the test builds
the RIFF tree with its own code), plus encoder round-trips through the
native JPEG layer and the codec gate."""

import struct

import numpy as np
import pytest

from data_diff_spark.functions.avi import decode_avi_frames, encode_avi_mjpeg, parse_avi
from data_diff_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _frames(n=4, h=24, w=32, seed=0):
    rng = np.random.default_rng(seed)
    base = (np.add.outer(np.linspace(0, 255, h), np.linspace(0, 255, w)) / 2)
    out = []
    for i in range(n):
        f = np.clip(base + i * 10 + rng.normal(0, 4, (h, w)), 0, 255)
        out.append(np.stack([f, 255 - f, (f + 40 * i) % 256], axis=-1).astype(np.uint8))
    return out


def _hand_avi(jpegs, w, h, fps=5):
    """Independent forward construction: nested RIFF lists assembled
    byte-by-byte with no shared helpers."""
    def ck(cc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cc + struct.pack("<I", len(body)) + body + pad

    avih = struct.pack("<IIIIIIIIII", 1_000_000 // fps, 0, 0, 0x10,
                       len(jpegs), 0, 1, 0, w, h) + bytes(16)
    strh = b"vids" + b"MJPG" + bytes(48)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    strl = ck(b"LIST", b"strl" + ck(b"strh", strh) + ck(b"strf", strf))
    hdrl = ck(b"LIST", b"hdrl" + ck(b"avih", avih) + strl)
    movi = ck(b"LIST", b"movi" + b"".join(ck(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_parser_on_hand_assembled_file():
    frames = _frames(3)
    jpegs = [encode_jpeg(f, quant=6) for f in frames]
    data = _hand_avi(jpegs, 32, 24)
    meta = parse_avi(data)
    assert (meta["width"], meta["height"]) == (32, 24)
    assert meta["n_frames"] == 3 and meta["handler"] == "MJPG"
    assert meta["us_per_frame"] == 200_000
    got = decode_avi_frames(data)
    assert len(got) == 3
    for g, j in zip(got, jpegs):
        assert np.array_equal(g, decode_jpeg(j))


def test_encoder_roundtrip_and_sampling():
    frames = _frames(6)
    data = encode_avi_mjpeg(frames, fps=10, quant=4)
    meta = parse_avi(data)
    assert meta["n_frames"] == 6 and meta["us_per_frame"] == 100_000
    got = decode_avi_frames(data)
    assert len(got) == 6
    # the container adds nothing: each frame decodes exactly as its own JPEG would
    for g, f in zip(got, frames):
        solo = decode_jpeg(encode_jpeg(f, quant=4))
        assert np.array_equal(g, solo)
    every2 = decode_avi_frames(data, every_n=2)
    assert len(every2) == 3 and np.array_equal(every2[1], got[2])


def test_odd_sized_jpeg_padding():
    """A frame whose JPEG payload has odd length forces the RIFF pad byte
    through both the writer and the parser."""
    for seed in range(6):
        frames = _frames(2, h=17, w=19, seed=seed)
        data = encode_avi_mjpeg(frames, fps=3)
        got = decode_avi_frames(data)
        assert len(got) == 2 and got[0].shape == (17, 19, 3)


def test_codec_gate_and_errors():
    frames = _frames(1)
    data = bytearray(encode_avi_mjpeg(frames))
    i = data.find(b"vidsMJPG")
    data[i + 4:i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="H264"):
        decode_avi_frames(bytes(data))
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"nope")
