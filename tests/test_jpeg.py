"""Baseline JPEG decoder (functions/jpeg.py) pinned against a FORWARD
encoder implemented here in the test — DCT-II, quantization, zigzag,
canonical-Huffman entropy coding, byte stuffing, markers, restart
intervals — sharing no code with the decoder. Expected pixels are the
test's own reconstruction of its quantized coefficients; agreement
within 1 LSB (independent float paths)."""

import struct

import numpy as np
import pytest

from data_diff_spark.functions.jpeg import ZIGZAG, decode_jpeg

Q50 = np.array([  # spec Annex K luminance table (public constants)
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QFLAT = np.full(64, 8, dtype=np.int32)


def _dct2(block):
    # forward DCT-II from the textbook double sum — NOT the decoder's
    # matrix formulation
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += block[x, y] * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[u, v] = 0.25 * cu * cv * s
    return out


def _idct2_ref(coef):
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += cu * cv * coef[u, v] * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            out[x, y] = 0.25 * s
    return out


class _Writer:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def pad(self):
        while self.nbits:
            self.bits(1, 1)  # pad with 1s per spec


def _canonical(symbols):
    """All symbols at one code length L (canonical assignment): returns
    (counts[16], symbols, {sym: (L, code)})."""
    symbols = sorted(set(symbols))
    L = max(2, (len(symbols) + 1).bit_length())  # leave all-ones unused
    counts = [0] * 16
    counts[L - 1] = len(symbols)
    codes = {s: (L, i) for i, s in enumerate(symbols)}
    return counts, symbols, codes


def _category(v):
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_value(w, v, codes):
    n = _category(v)
    L, code = codes[n] if isinstance(codes, dict) else codes
    w.bits(code, L)
    if n:
        w.bits(v if v > 0 else v + (1 << n) - 1, n)


def _encode_block(w, coefs_zz, pred, dc_codes, ac_codes):
    diff = coefs_zz[0] - pred
    n = _category(diff)
    L, code = dc_codes[n]
    w.bits(code, L)
    if n:
        w.bits(diff if diff > 0 else diff + (1 << n) - 1, n)
    run = 0
    last_nz = max([k for k in range(1, 64) if coefs_zz[k]], default=0)
    for k in range(1, last_nz + 1):
        v = coefs_zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            L, code = ac_codes[0xF0]
            w.bits(code, L)  # ZRL
            run -= 16
        n = _category(v)
        L, code = ac_codes[(run << 4) | n]
        w.bits(code, L)
        w.bits(v if v > 0 else v + (1 << n) - 1, n)
        run = 0
    if last_nz < 63:
        L, code = ac_codes[0x00]
        w.bits(code, L)  # EOB
    return coefs_zz[0]


def _quantize_plane(plane, q):
    """plane (H,W) -> list of zigzag-quantized blocks in raster order and
    the reconstruction (dequant + reference IDCT + clip)."""
    H, W = plane.shape
    blocks, recon = [], np.zeros_like(plane, dtype=np.float64)
    for y0 in range(0, H, 8):
        for x0 in range(0, W, 8):
            b = plane[y0:y0 + 8, x0:x0 + 8].astype(np.float64) - 128.0
            coef = _dct2(b)
            zz = np.array([int(round(coef.flat[ZIGZAG[k]] / q[k])) for k in range(64)])
            blocks.append(zz)
            deq = np.zeros(64)
            deq[ZIGZAG] = zz * q
            recon[y0:y0 + 8, x0:x0 + 8] = _idct2_ref(deq.reshape(8, 8)) + 128.0
    return blocks, recon


def _segments(frame_comps, qtables, huff_specs, h, w, dri=0):
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload)

    for tq, q in qtables.items():
        seg(0xDB, bytes([tq]) + bytes(int(x) for x in q))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(frame_comps)])
    for cid, hv, tq in frame_comps:
        sof += bytes([cid, hv, tq])
    seg(0xC0, sof)
    for (tc, th), (counts, symbols) in huff_specs.items():
        seg(0xC4, bytes([tc << 4 | th]) + bytes(counts) + bytes(symbols))
    if dri:
        seg(0xDD, struct.pack(">H", dri))
    return out


def test_greyscale_roundtrip_with_restarts():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    blocks, recon = _quantize_plane(img.astype(np.float64), Q50)
    # huffman tables sized to the data
    dc_syms = set()
    ac_syms = {0x00, 0xF0}
    for zz in blocks:
        # dri=1: every MCU restarts, so the DC prediction is always 0
        dc_syms.add(_category(zz[0]))
        run = 0
        last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1; continue
            while run > 15:
                run -= 16
            ac_syms.add((run << 4) | _category(zz[k])); run = 0
    dc_counts, dc_list, dc_codes = _canonical(dc_syms | {0})
    ac_counts, ac_list, ac_codes = _canonical(ac_syms)

    head = _segments([(1, 0x11, 0)], {0: Q50}, {(0, 0): (dc_counts, dc_list),
                                                (1, 0): (ac_counts, ac_list)},
                     16, 16, dri=1)  # restart after EVERY MCU
    head += bytes([0xFF, 0xDA]) + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    w = _Writer()
    body = bytearray()
    pred = 0
    for i, zz in enumerate(blocks):
        if i and 1 and i % 1 == 0:  # dri=1: restart before each MCU after the first
            w.pad()
            body += w.out
            w = _Writer()
            body += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
            pred = 0
        pred = _encode_block(w, zz, pred, dc_codes, ac_codes)
    w.pad()
    body += w.out
    data = bytes(head) + bytes(body) + b"\xff\xd9"

    got = decode_jpeg(data)
    want = np.clip(np.round(recon), 0, 255).astype(np.uint8)
    assert got.shape == (16, 16)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


def test_color_420_roundtrip():
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8).astype(np.float64)
    # BT.601 forward
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
    # 4:2:0: chroma averaged to 8x8
    cb2 = cb.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(8, 2, 8, 2).mean(axis=(1, 3))

    planes = {"y": y, "cb": cb2, "cr": cr2}
    blocks, recon = {}, {}
    for name, p in planes.items():
        blocks[name], recon[name] = _quantize_plane(p, QFLAT)

    syms_dc, syms_ac = {0}, {0x00, 0xF0}
    def collect(bl):
        pred = 0
        for zz in bl:
            syms_dc.add(_category(zz[0] - pred)); pred = zz[0]
            run = 0
            last_nz = max([k for k in range(1, 64) if zz[k]], default=0)
            for k in range(1, last_nz + 1):
                if zz[k] == 0:
                    run += 1; continue
                while run > 15:
                    run -= 16
                syms_ac.add((run << 4) | _category(zz[k])); run = 0
    for bl in blocks.values():
        collect(bl)
    dc_counts, dc_list, dc_codes = _canonical(syms_dc)
    ac_counts, ac_list, ac_codes = _canonical(syms_ac)

    head = _segments(
        [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)], {0: QFLAT},
        {(0, 0): (dc_counts, dc_list), (1, 0): (ac_counts, ac_list)}, 16, 16,
    )
    head += bytes([0xFF, 0xDA]) + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0])
    w = _Writer()
    preds = {"y": 0, "cb": 0, "cr": 0}
    # ONE MCU covers the whole 16x16: 4 Y blocks (2x2, raster within MCU),
    # then 1 Cb, 1 Cr — blocks for Y were produced in plane-raster order,
    # which for a single MCU equals the in-MCU raster order
    for name, order in (("y", [0, 1, 2, 3]), ("cb", [0]), ("cr", [0])):
        for i in order:
            preds[name] = _encode_block(w, blocks[name][i], preds[name],
                                        dc_codes, ac_codes)
    w.pad()
    data = bytes(head) + bytes(w.out) + b"\xff\xd9"

    got = decode_jpeg(data)
    # expected: test-side reconstruction, nearest-upsampled chroma, BT.601 back
    yv = recon["y"]
    cbv = np.repeat(np.repeat(recon["cb"], 2, 0), 2, 1) - 128.0
    crv = np.repeat(np.repeat(recon["cr"], 2, 0), 2, 1) - 128.0
    want = np.stack([
        yv + 1.402 * crv,
        yv - 0.344136 * cbv - 0.714136 * crv,
        yv + 1.772 * cbv,
    ], axis=-1)
    want = np.clip(np.round(want), 0, 255).astype(np.uint8)
    assert got.shape == (16, 16, 3)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


def test_bad_input_gates():
    with pytest.raises(ValueError):
        decode_jpeg(b"nope")
    # SOF2 progressive now decodes natively; a frame with no scan errors
    data = (b"\xff\xd8" + bytes([0xFF, 0xC2]) + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="no scan"):
        decode_jpeg(data)
    # differential DCT (SOF14) decodes natively since r10
    # (test_jpeg_hier_dct*.py); OUTSIDE a hierarchical stream it is a
    # stream error — no reference to difference against — not a missing
    # feature
    data = (b"\xff\xd8" + bytes([0xFF, 0xCE]) + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="differential frame without"):
        decode_jpeg(data)
    # a differential lossless frame OUTSIDE a hierarchical stream is a
    # stream error, not a missing feature
    data = (b"\xff\xd8" + bytes([0xFF, 0xCF]) + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with pytest.raises(ValueError, match="reference"):
        decode_jpeg(data)


def test_encode_decode_roundtrip_grey_near_lossless():
    from data_diff_spark.functions.jpeg import encode_jpeg

    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(13, 21), dtype=np.uint8)  # non-multiple-of-8
    got = decode_jpeg(encode_jpeg(img, quant=1))
    assert got.shape == img.shape
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2


def test_encode_decode_roundtrip_color_psnr():
    from data_diff_spark.functions.jpeg import encode_jpeg

    # smooth gradient: quantization error stays small and PSNR meaningful
    yy, xx = np.mgrid[0:24, 0:32]
    img = np.stack([
        (yy * 5) % 256, (xx * 3) % 256, ((yy + xx) * 4) % 256
    ], axis=-1).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(img, quant=4))
    assert got.shape == img.shape
    mse = float(np.mean((got.astype(float) - img.astype(float)) ** 2))
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 30, psnr


class TestProgressive:
    """SOF2 progressive: the encoder transmits the SAME quantized
    coefficients as baseline through DC first/refine + per-component AC
    first/refine scans (with cross-block EOB runs), so decode(progressive)
    must equal decode(baseline) EXACTLY — any scan-path bug breaks the
    identity."""

    def _roundtrip(self, img, quant):
        from data_diff_spark.functions.jpeg import encode_jpeg

        base = decode_jpeg(encode_jpeg(img, quant=quant))
        prog = decode_jpeg(encode_jpeg(img, quant=quant, progressive=True))
        assert prog.shape == base.shape
        assert np.array_equal(prog, base)
        return base

    def test_grey_identity(self):
        rng = np.random.default_rng(11)
        self._roundtrip(rng.integers(0, 256, size=(13, 21), dtype=np.uint8), 1)

    def test_color_identity(self):
        rng = np.random.default_rng(12)
        self._roundtrip(rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8), 4)

    def test_heavy_quant_long_eob_runs(self):
        # quant 32 on noise zeroes most AC bands -> multi-block EOBn
        # symbols with extension bits exercise the cross-block run paths
        rng = np.random.default_rng(13)
        self._roundtrip(rng.integers(0, 256, size=(64, 64), dtype=np.uint8), 32)

    def test_smooth_gradient_dc_dominated(self):
        yy, xx = np.mgrid[0:48, 0:48]
        self._roundtrip(((yy + xx) // 2).astype(np.uint8), 16)

    def test_single_block(self):
        rng = np.random.default_rng(14)
        self._roundtrip(rng.integers(0, 256, size=(8, 8), dtype=np.uint8), 8)

    def test_progressive_marker_and_scan_count(self):
        from data_diff_spark.functions.jpeg import encode_jpeg

        rng = np.random.default_rng(15)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        data = encode_jpeg(img, quant=8, progressive=True)
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data.split(b"\xff\xda")[0]
        # DC first + DC refine + 3x AC first + 3x AC refine = 8 scans
        n_sos = 0
        i = 2
        while i < len(data) - 1:
            if data[i] == 0xFF and data[i + 1] == 0xDA:
                n_sos += 1
            i += 1
        assert n_sos == 8

    def test_decode_image_routes_progressive(self):
        from data_diff_spark.functions.jpeg import encode_jpeg
        from data_diff_spark.functions.multimodal import decode_image

        rng = np.random.default_rng(16)
        img = rng.integers(0, 256, size=(12, 12), dtype=np.uint8)
        data = encode_jpeg(img, quant=2, progressive=True)
        got = decode_image(data)
        assert np.array_equal(got, decode_jpeg(data))


def test_progressive_420_component_grids():
    """Progressive + 4:2:0: the non-interleaved AC scans walk each
    COMPONENT's own block grid (ceil of its scaled dims), not the
    MCU-padded allocation. 24x24 makes that distinction bite: Y is 3x3
    blocks inside a 4x4 MCU-grid allocation (the padding blocks receive
    DC from the interleaved scan but never appear in the AC scans) while
    chroma is exactly 2x2. Stream hand-built forward from the spec,
    sharing no code with the decoder."""
    rng = np.random.default_rng(21)
    H = W = 24
    rgb = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8).astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
    cb2 = cb.reshape(12, 2, 12, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(12, 2, 12, 2).mean(axis=(1, 3))

    def pad_to(p, s):
        return np.pad(p, ((0, s - p.shape[0]), (0, s - p.shape[1])), mode="edge")

    yp, cbp, crp = pad_to(y, 32), pad_to(cb2, 16), pad_to(cr2, 16)

    def qblocks(plane):
        """dict[(by,bx)] -> zigzag-quantized int block (full padded grid)."""
        out = {}
        nb = plane.shape[0] // 8
        for by in range(nb):
            for bx in range(nb):
                b = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = _dct2(b)
                out[(by, bx)] = np.array(
                    [int(round(coef.flat[ZIGZAG[k]] / QFLAT[k])) for k in range(64)]
                )
        return out

    YB, CBB, CRB = qblocks(yp), qblocks(cbp), qblocks(crp)
    # component AC grids: Y 3x3 (ceil 24/8), chroma 2x2 (ceil 12/8)
    y_grid = [(by, bx) for by in range(3) for bx in range(3)]
    c_grid = [(by, bx) for by in range(2) for bx in range(2)]
    # interleaved MCU walk (2x2 MCUs): per MCU 4 Y blocks then Cb, Cr
    mcu_blocks = []  # (comp_idx, blocks_dict, (by,bx))
    for my in range(2):
        for mx in range(2):
            for v in range(2):
                for hh in range(2):
                    mcu_blocks.append((0, YB, (my * 2 + v, mx * 2 + hh)))
            mcu_blocks.append((1, CBB, (my, mx)))
            mcu_blocks.append((2, CRB, (my, mx)))

    # ---- scan emission (test-side forward implementations) ----
    def dc_first_syms_and_emit(w=None, codes=None):
        syms = set()
        preds = [0, 0, 0]
        for ci, bl, key in mcu_blocks:
            dc = int(bl[key][0]) >> 1
            diff = dc - preds[ci]
            preds[ci] = dc
            n = _category(diff)
            syms.add(n)
            if w is not None:
                L, code = codes[n]
                w.bits(code, L)
                if n:
                    w.bits(diff if diff > 0 else diff + (1 << n) - 1, n)
        return syms

    def ac_first_walk(blocks, grid, w=None, codes=None):
        syms = set()
        for key in grid:
            zz = blocks[key]
            mags = [abs(int(v)) >> 1 for v in zz]
            last = max((k for k in range(1, 64) if mags[k]), default=0)
            run = 0
            for k in range(1, last + 1):
                if mags[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    syms.add(0xF0)
                    if w is not None:
                        L, c = codes[0xF0]; w.bits(c, L)
                    run -= 16
                n = mags[k].bit_length()
                syms.add((run << 4) | n)
                if w is not None:
                    L, c = codes[(run << 4) | n]; w.bits(c, L)
                    val = mags[k] if int(zz[k]) > 0 else -mags[k]
                    w.bits(val if val > 0 else val + (1 << n) - 1, n)
                run = 0
            if last < 63:
                syms.add(0x00)
                if w is not None:
                    L, c = codes[0x00]; w.bits(c, L)
        return syms

    def ac_refine_walk(blocks, grid, w=None, codes=None):
        syms = set()
        for key in grid:
            zz = blocks[key]
            absv = [abs(int(v)) for v in zz]
            hist = [a >> 1 for a in absv]
            run, br = 0, []
            newly = [k for k in range(1, 64) if absv[k] == 1]
            last_new = newly[-1] if newly else 0
            for k in range(1, last_new + 1):
                if hist[k] != 0:
                    br.append(absv[k] & 1)
                    continue
                if absv[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    syms.add(0xF0)
                    if w is not None:
                        L, c = codes[0xF0]; w.bits(c, L)
                        for b in br:
                            w.bits(b, 1)
                    br = []
                    run -= 16
                syms.add((run << 4) | 1)
                if w is not None:
                    L, c = codes[(run << 4) | 1]; w.bits(c, L)
                    w.bits(1 if int(zz[k]) > 0 else 0, 1)
                    for b in br:
                        w.bits(b, 1)
                br = []
                run = 0
            tail = [absv[k] & 1 for k in range(last_new + 1, 64) if hist[k]]
            if last_new < 63:
                syms.add(0x00)
                if w is not None:
                    L, c = codes[0x00]; w.bits(c, L)
                    for b in br + tail:
                        w.bits(b, 1)
        return syms

    # ---- stream assembly ----
    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload)

    seg(0xDB, bytes([0]) + bytes(int(x) for x in QFLAT))
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([3])
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0])
    seg(0xC2, sof)

    def sos(comps, ss, se, ahal):
        body = bytes([len(comps)])
        for cid in comps:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, ahal])
        seg(0xDA, body)

    def emit_scan(walk, tc, comps, ss, se, ahal):
        syms = walk()
        counts, symlist, codes = _canonical(syms or {0})
        seg(0xC4, bytes([tc << 4]) + bytes(counts) + bytes(symlist))
        sos(comps, ss, se, ahal)
        w = _Writer()
        walk(w, codes)
        w.pad()
        out.extend(w.out)

    emit_scan(lambda w=None, c=None: dc_first_syms_and_emit(w, c),
              0, [1, 2, 3], 0, 0, 0x01)
    # DC refine: raw bits, no table
    sos([1, 2, 3], 0, 0, 0x10)
    w = _Writer()
    for ci, bl, key in mcu_blocks:
        w.bits(int(bl[key][0]) & 1, 1)
    w.pad()
    out.extend(w.out)
    for comp, bl, grid in ((1, YB, y_grid), (2, CBB, c_grid), (3, CRB, c_grid)):
        emit_scan(lambda w=None, c=None, b=bl, g=grid: ac_first_walk(b, g, w, c),
                  1, [comp], 1, 63, 0x01)
    for comp, bl, grid in ((1, YB, y_grid), (2, CBB, c_grid), (3, CRB, c_grid)):
        emit_scan(lambda w=None, c=None, b=bl, g=grid: ac_refine_walk(b, g, w, c),
                  1, [comp], 1, 63, 0x10)
    out.extend(b"\xff\xd9")

    got = decode_jpeg(bytes(out))

    # ---- expected: padding blocks carry DC only; AC only inside grids ----
    def recon_plane(blocks, size, grid):
        plane = np.zeros((size, size))
        nb = size // 8
        for by in range(nb):
            for bx in range(nb):
                zz = blocks[(by, bx)].copy()
                if (by, bx) not in grid:
                    zz[1:] = 0  # never visited by the AC scans
                deq = np.zeros(64)
                deq[ZIGZAG] = zz * QFLAT
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    _idct2_ref(deq.reshape(8, 8)) + 128.0
        return plane

    yv = recon_plane(YB, 32, set(y_grid))[:H, :W]
    cbv = np.repeat(np.repeat(recon_plane(CBB, 16, set(c_grid))[:12, :12], 2, 0), 2, 1) - 128.0
    crv = np.repeat(np.repeat(recon_plane(CRB, 16, set(c_grid))[:12, :12], 2, 0), 2, 1) - 128.0
    want = np.stack([
        yv + 1.402 * crv,
        yv - 0.344136 * cbv - 0.714136 * crv,
        yv + 1.772 * cbv,
    ], axis=-1)
    want = np.clip(np.round(want), 0, 255).astype(np.uint8)
    assert got.shape == (H, W, 3)
    assert int(np.abs(got.astype(int) - want.astype(int)).max()) <= 1


class TestWavTelephonyFormats:
    """G.711 mu-law/A-law and IMA ADPCM WAV decode, pinned byte-exact
    against CPython's audioop (an independent public implementation).
    Lives here with the other codec tests."""

    def _wav(self, fmt_tag, bits, payload, block_align=2, rate=8000):
        import struct

        fmt = struct.pack("<HHIIHH", fmt_tag, 1, rate, rate, block_align, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(payload)) + payload)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def test_g711_tables_match_audioop(self):
        import warnings

        import numpy as np

        from data_diff_spark.functions.multimodal import (
            _g711_alaw_table, _g711_ulaw_table)

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop
        all_bytes = bytes(range(256))
        assert np.array_equal(
            _g711_ulaw_table(),
            np.frombuffer(audioop.ulaw2lin(all_bytes, 2), dtype=np.int16),
        )
        assert np.array_equal(
            _g711_alaw_table(),
            np.frombuffer(audioop.alaw2lin(all_bytes, 2), dtype=np.int16),
        )

    def test_g711_wav_decode(self):
        import numpy as np

        from data_diff_spark.functions.multimodal import decode_audio

        payload = bytes(range(256))
        rate, mu = decode_audio(self._wav(7, 8, payload, 1))
        assert rate == 8000 and len(mu) == 256 and mu.dtype == np.int16
        rate, al = decode_audio(self._wav(6, 8, payload, 1))
        assert len(al) == 256 and int(al[0x55]) == -8 and int(al[0xD5]) == 8

    def test_ima_adpcm_matches_audioop(self):
        import struct
        import warnings

        import numpy as np

        from data_diff_spark.functions.multimodal import decode_audio

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            import audioop
        rng = np.random.default_rng(10)
        pcm = rng.integers(-8000, 8000, size=401).astype(np.int16)
        frag, _ = audioop.lin2adpcm(pcm.tobytes(), 2, (0, 0))
        ref = np.frombuffer(audioop.adpcm2lin(frag, 2, (0, 0))[0], dtype=np.int16)
        # repack audioop's high-nibble-first stream into WAV low-first
        nib = []
        for byte in frag:
            nib += [(byte >> 4) & 0xF, byte & 0xF]
        wav_nibs = bytearray(
            nib[i] | (nib[i + 1] << 4) for i in range(0, len(nib) - 1, 2)
        )
        block = struct.pack("<hBB", 0, 0, 0) + bytes(wav_nibs)
        rate, got = decode_audio(self._wav(0x11, 4, bytes(block), len(block)))
        n = min(len(got) - 1, len(ref))
        assert np.array_equal(got[1:n + 1], ref[:n])

    def test_unknown_format_still_gated(self):
        import pytest as _pytest

        from data_diff_spark.functions.multimodal import decode_audio

        with _pytest.raises(NotImplementedError, match="librosa"):
            decode_audio(self._wav(0x55, 16, b"\x00\x00"))  # MPEG tag


def test_sof1_extended_sequential_decodes_as_sof0():
    """B.3: at 8-bit precision the extended sequential process (SOF1) is
    decoded exactly like baseline — the extension is 12-bit precision
    (still guarded by the precision check) and more Huffman tables."""
    from data_diff_spark.functions.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:24, 0:16]
    img = ((yy * 5 + xx * 11) % 256).astype(np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    assert i >= 0
    data[i + 1] = 0xC1
    base = decode_jpeg(encode_jpeg(img))
    got = decode_jpeg(bytes(data))
    assert np.array_equal(got, base)
