"""Baseline JPEG decoder, pure numpy — no PIL/cv2/libjpeg.

Scope: baseline sequential DCT JPEGs (SOF0), 8-bit, grayscale or YCbCr
with 4:4:4 / 4:2:2 / 4:2:0 subsampling, restart markers supported —
i.e. the overwhelming majority of web-scraped training images.
Progressive (SOF2), arithmetic coding, and 12-bit raise with the PIL
swap-in pointer, same contract as the PNG/netpbm codecs in
functions/multimodal.py.

Pipeline (ITU-T T.81): marker parse (DQT/DHT/SOF0/SOS/DRI) → entropy
decode (Huffman, byte-unstuffed bitstream, per-component DC prediction)
→ dequantize → inverse zigzag → 8x8 IDCT (exact orthonormal DCT-III
matrix product) → plane assembly with per-component sampling factors →
chroma upsample (nearest) → YCbCr→RGB (BT.601) → level clip.

Correctness evidence (tests/test_jpeg.py): the TEST implements the
FORWARD direction — blocks → DCT-II → quantize → zigzag → Huffman
encode with spec Annex K tables → marker stream — with no shared code,
and the decoder must recover the coefficients' exact reconstruction.
The IDCT itself is pinned against the DCT identity on random blocks.

Throughput note: this is a correctness-first scalar/numpy decoder
(~MB/s); at pipeline scale swap in PIL/libjpeg-turbo via decode_image's
documented gate and keep this as the no-dependency fallback.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix():
    import numpy as np

    A = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            c = (1 / (2 * np.sqrt(2))) if k == 0 else 0.5
            A[k, n] = c * np.cos((2 * n + 1) * k * np.pi / 16)
    return A  # forward DCT-II matrix (orthonormal); IDCT = A.T @ X @ A


class _Huff:
    """Canonical Huffman table from a DHT segment: (code-length counts,
    symbols) → dict[(length, code)] = symbol."""

    def __init__(self, counts: List[int], symbols: List[int]):
        self.lut: Dict[Tuple[int, int], int] = {}
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[i]
                code += 1
                i += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; restart markers are consumed by the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def _byte(self) -> int:
        return self.data[self.pos]

    def read_bit(self) -> int:
        b = self._byte()
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt != 0x00:
                raise EOFError("marker inside entropy data")
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1
        return v

    def align_to_marker(self):
        """Skip to the next marker boundary (for RSTn)."""
        if self.bit:
            self.bit = 0
            self.pos += 2 if self._byte() == 0xFF else 1
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1

    def decode_symbol(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid huffman code")

    def receive_extend(self, n: int) -> int:
        if n == 0:
            return 0
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        # T.81 F.2.2.1 EXTEND: values with MSB 0 are negative
        if v < (1 << (n - 1)):
            v -= (1 << n) - 1
        return v


def encode_jpeg(arr, quant: int = 8) -> bytes:
    """Baseline JPEG encoder: (h,w) uint8 -> greyscale SOF0, (h,w,3)
    uint8 RGB -> YCbCr 4:4:4 SOF0. Flat quantization (`quant` per
    coefficient — 1 ≈ near-lossless, 8 ≈ visually clean, 16+ small);
    per-image canonical Huffman tables computed from the data (valid
    JPEG — fixed Annex-K tables are an interchange convention, not a
    requirement). Dimensions are padded to multiples of 8 internally by
    edge replication; the decoder crops back via SOF0's true h/w.

    The write side of the media pipeline (thumbnails, sample dumps);
    decode_jpeg is pinned independently, so the roundtrip test bounds
    this encoder's end-to-end error by the quantization step."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    grey = a.ndim == 2
    h, w = a.shape[:2]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if grey:
        planes = [a.astype(np.float64)]
    else:
        rgb = a.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        planes = [y, cb, cr]
    planes = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    q = np.full(64, int(quant), dtype=np.int32)
    A = _idct_matrix()

    # pass 1: quantized zigzag blocks per plane (DCT-II via the matrix)
    all_blocks = []
    for p in planes:
        blocks = []
        for y0 in range(0, ph, 8):
            for x0 in range(0, pw, 8):
                b = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                coef = A @ b @ A.T
                zz = np.round(coef.flat[ZIGZAG] / q).astype(np.int64)
                blocks.append(zz)
        all_blocks.append(blocks)

    # pass 2: symbol alphabets -> one-length canonical tables
    def category(v: int) -> int:
        return 0 if v == 0 else int(abs(int(v))).bit_length()

    dc_syms, ac_syms = set(), {0x00, 0xF0}
    for blocks in all_blocks:
        pred = 0
        for zz in blocks:
            dc_syms.add(category(int(zz[0]) - pred))
            pred = int(zz[0])
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = (nz[-1] + 1) if len(nz) else 0
            for k in range(1, last + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                run %= 16
                ac_syms.add((run << 4) | category(int(zz[k])))
                run = 0

    def canonical(symbols):
        symbols = sorted(symbols)
        length = max(2, (len(symbols) + 1).bit_length())
        counts = [0] * 16
        counts[length - 1] = len(symbols)
        return counts, symbols, {s: (length, i) for i, s in enumerate(symbols)}

    dc_counts, dc_list, dc_codes = canonical(dc_syms)
    ac_counts, ac_list, ac_codes = canonical(ac_syms)

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0]) + bytes(int(x) for x in q))
    ncomp = 1 if grey else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_list))
    seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_list))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    acc = [0, 0]  # bit accumulator, count

    def bits(value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((value >> i) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out.append(acc[0])
                if acc[0] == 0xFF:
                    out.append(0x00)
                acc[0] = acc[1] = 0

    preds = [0] * ncomp
    n_mcux = pw // 8
    for m in range(len(all_blocks[0])):
        # 4:4:4 / greyscale: MCU = one block of each component, raster order
        assert m < n_mcux * (ph // 8)
        for ci in range(ncomp):
            zz = all_blocks[ci][m]
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            n = category(diff)
            length, code = dc_codes[n]
            bits(code, length)
            if n:
                bits(diff if diff > 0 else diff + (1 << n) - 1, n)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = (nz[-1] + 1) if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, code = ac_codes[0xF0]
                    bits(code, length)
                    run -= 16
                n = category(v)
                length, code = ac_codes[(run << 4) | n]
                bits(code, length)
                bits(v if v > 0 else v + (1 << n) - 1, n)
                run = 0
            if last < 63:
                length, code = ac_codes[0x00]
                bits(code, length)
    while acc[1]:
        bits(1, 1)
    out.extend(b"\xff\xd9")
    return bytes(out)


def decode_jpeg(data: bytes):
    """(h, w, 3) uint8 RGB (or (h, w) for single-component greyscale)."""
    import numpy as np

    if data[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg")
    pos = 2
    qt: Dict[int, "np.ndarray"] = {}
    hufftabs: Dict[Tuple[int, int], _Huff] = {}  # (class 0=DC/1=AC, id)
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables need PIL")
                qt[tq] = np.array(list(body[p + 1:p + 65]), dtype=np.int32)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                counts = list(body[p + 1:p + 17])
                n = sum(counts)
                symbols = list(body[p + 17:p + 17 + n])
                hufftabs[(tc, th)] = _Huff(counts, symbols)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit baseline; use PIL")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i], body[7 + 3 * i], body[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "jpeg: only baseline sequential (SOF0) decodes natively; "
                "progressive/arithmetic need PIL"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan.append({"cs": cs, "dc": tdta >> 4, "ac": tdta & 0xF})
            pos += seglen
            return _decode_scan(
                data, pos, frame, scan, qt, hufftabs, restart_interval
            )
        pos += seglen
    raise ValueError("jpeg: no scan found")


def _decode_scan(data, pos, frame, scan, qt, hufftabs, restart_interval):
    import numpy as np

    if frame is None:
        raise ValueError("jpeg: SOS before SOF0")
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    A = _idct_matrix()

    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))
    by_id = {s["cs"]: s for s in scan}

    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align_to_marker()
                m = data[r.pos + 1]
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError("jpeg: expected restart marker")
                r.pos += 2
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                s = by_id[c["id"]]
                dct_t = hufftabs[(0, s["dc"])]
                act = hufftabs[(1, s["ac"])]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = r.decode_symbol(dct_t)
                        pred[ci] += r.receive_extend(t)
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = r.decode_symbol(act)
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("jpeg: coefficient overrun")
                            coeffs[k] = r.receive_extend(ss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coeffs * q
                        px = A.T @ block.reshape(8, 8) @ A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1

    # upsample to full resolution, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r_ = y + 1.402 * cr
    g_ = y - 0.344136 * cb - 0.714136 * cr
    b_ = y + 1.772 * cb
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
