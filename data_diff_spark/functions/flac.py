"""FLAC decoder, pure Python/numpy — lossless audio for the media pipeline.

Implements the public FLAC format (xiph.org specification / RFC 9639):
fLaC marker + metadata blocks (STREAMINFO parsed, others skipped), frame
headers (sync, blocking strategy, block-size/sample-rate/sample-size
codes incl. end-of-header fields, UTF-8-coded frame number, CRC-8), all
four subframe types — CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders
1-32 with quantized coefficients and signed shift — partitioned Rice
residuals (4- and 5-bit parameters, escape-to-raw partitions), wasted
bits, and all four channel assignments (independent, left/side,
right/side, mid/side), with frame CRC-16 verification.

Pinned in tests/test_flac.py against an INDEPENDENT forward encoder the
test implements straight from the spec (its own bit-writer, Rice coder,
CRCs) — the same two-directions honesty contract as the PNG and
Huffman-JPEG codecs. FLAC is lossless, so decode must recover the exact
sample values. Lossy audio (mp3/ogg) remains the documented gate: no
reference decoder exists in this container to pin against.

The reference diff engine has no media surface; this feeds decode_audio
(functions/multimodal.py) for the training-data pipeline story.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCKSIZE_CODE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                   8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                   13: 8192, 14: 16384, 15: 32768}
_RATE_CODE = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
              7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


class _Bits:
    """MSB-first bit reader with a byte-aligned position for CRC spans."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("flac: truncated stream")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.pos += 1


def crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    """CRC-16 with polynomial 0x8005, init 0."""
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_number(r: _Bits) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 7 bytes)."""
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("flac: bad coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = r.read(8)
        if c >> 6 != 0b10:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def parse_streaminfo(data: bytes) -> dict:
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (fLaC marker missing)")
    pos = 4
    info = None
    while True:
        hdr = data[pos:pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = data[pos + 4:pos + 4 + length]
        if btype == 0:  # STREAMINFO
            r = _Bits(body)
            info = {
                "min_blocksize": r.read(16), "max_blocksize": r.read(16),
                "min_framesize": r.read(24), "max_framesize": r.read(24),
                "sample_rate": r.read(20),
                "channels": r.read(3) + 1,
                "bps": r.read(5) + 1,
                "total_samples": r.read(36),
            }
        pos += 4 + length
        if last:
            break
    if info is None:
        raise ValueError("flac: missing STREAMINFO")
    info["audio_start"] = pos
    return info


def _residuals(r: _Bits, blocksize: int, order: int) -> List[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("flac: bad partition order")
    out: List[int] = []
    for p in range(nparts):
        n = (blocksize >> po) - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(n):
                out.append(r.signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.unary()
                v = (q << param) | (r.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _subframe(r: _Bits, blocksize: int, bps: int) -> List[int]:
    if r.read(1):
        raise ValueError("flac: bad subframe padding bit")
    t = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.unary() + 1
    bps -= wasted
    if t == 0:  # CONSTANT
        out = [r.signed(bps)] * blocksize
    elif t == 1:  # VERBATIM
        out = [r.signed(bps) for _ in range(blocksize)]
    elif 8 <= t <= 12:  # FIXED, order t-8
        order = t - 8
        out = [r.signed(bps) for _ in range(order)]
        res = _residuals(r, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(res):
            pred = sum(c * out[order + i - j - 1] for j, c in enumerate(coefs))
            out.append(e + pred)
    elif t >= 32:  # LPC, order (t & 31) + 1
        order = (t & 31) + 1
        out = [r.signed(bps) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            raise ValueError("flac: invalid LPC precision")
        prec += 1
        shift = r.signed(5)
        if shift < 0:
            raise ValueError("flac: negative LPC shift")
        coefs = [r.signed(prec) for _ in range(order)]
        res = _residuals(r, blocksize, order)
        for i, e in enumerate(res):
            acc = sum(c * out[order + i - j - 1] for j, c in enumerate(coefs))
            out.append(e + (acc >> shift))
    else:
        raise ValueError(f"flac: reserved subframe type {t}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(data: bytes):
    """Decode a FLAC stream to (samples, sample_rate): samples is an
    int32 numpy array of shape (n, channels), exact original values."""
    import numpy as np

    info = parse_streaminfo(data)
    pos = info["audio_start"]
    chans = info["channels"]
    blocks = []
    total = 0
    want = info["total_samples"]
    while pos < len(data) and (not want or total < want):
        r = _Bits(data, pos)
        sync = r.read(14)
        if sync != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        if r.read(1):
            raise ValueError("flac: reserved frame bit set")
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        bps_code = r.read(3)
        if r.read(1):
            raise ValueError("flac: reserved frame bit set")
        _utf8_number(r)
        if bs_code == 0:
            raise ValueError("flac: reserved blocksize code")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if sr_code == 0:
            pass
        elif sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        elif sr_code == 15:
            raise ValueError("flac: invalid sample rate code")
        bps = info["bps"] if bps_code == 0 else _BPS_CODE[bps_code]
        r.align()
        hdr_end = r.pos
        if crc8(data[pos:hdr_end]) != r.read(8):
            raise ValueError("flac: frame header CRC mismatch")

        if ch_code < 8:
            if ch_code + 1 != chans:
                raise ValueError("flac: channel count mismatch")
            subs = [_subframe(r, blocksize, bps) for _ in range(chans)]
        elif ch_code in (8, 9, 10):
            if chans != 2:
                raise ValueError("flac: stereo decorrelation needs 2 channels")
            # the SIDE channel carries one extra bit
            if ch_code == 8:      # left/side
                left = _subframe(r, blocksize, bps)
                side = _subframe(r, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:    # right/side (side first)
                side = _subframe(r, blocksize, bps + 1)
                right = _subframe(r, blocksize, bps)
                subs = [[rr + s for rr, s in zip(right, side)], right]
            else:                 # mid/side
                mid = _subframe(r, blocksize, bps)
                side = _subframe(r, blocksize, bps + 1)
                lr = []
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    lr.append(((m2 + s) >> 1, (m2 - s) >> 1))
                subs = [[x[0] for x in lr], [x[1] for x in lr]]
        else:
            raise ValueError("flac: reserved channel assignment")
        r.align()
        frame_end = r.pos
        if crc16(data[pos:frame_end]) != r.read(16):
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = r.pos
        blocks.append(np.array(subs, dtype=np.int64).T)
        total += blocksize
    if not blocks:
        raise ValueError("flac: no audio frames")
    out = np.concatenate(blocks, axis=0)
    if want:
        out = out[:want]
    return out.astype(np.int32), info["sample_rate"]
