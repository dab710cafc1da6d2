"""Native VP8 key-frame decoder (lossy WebP), pure Python + numpy.

Implements the public bitstream specification RFC 6386 end-to-end for
intra-only (key) frames — which is every lossy still WebP image:

  boolean arithmetic decoder (§7)  ->  frame header (§9)  ->  per-MB modes
  (§11)  ->  token/coefficient decoding with left/above contexts (§13)  ->
  dequantization (§14.1)  ->  inverse WHT/DCT (§14.3-14.4)  ->  intra
  prediction (§12)  ->  loop filter, simple and normal (§15).

The output is the normative (Y, U, V) 4:2:0 planes. Conformance is pinned
in tests/test_vp8.py against the system libwebp's WebPDecodeYUV on
libwebp-encoded fixtures: VP8 reconstruction is exact integer arithmetic,
so a correct implementation matches the reference decoder BIT-FOR-BIT —
any deviation is a bug, never "close enough".

Probability/quantizer constants live in vp8_tables.py (normative RFC 6386
tables). The reference diff engine has no media stack; this rounds out the
multimodal ingest path (functions/multimodal.py) for the dominant crawled
image container. Inter frames, the only other VP8 shape, cannot occur in
still WebP and raise.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

from data_diff_spark.functions.vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS,
    COEFF_UPDATE_PROBS,
    DC_QLOOKUP,
    KF_BMODE_PROBS,
)

# --- mode enums (RFC 6386 §11.2) ---------------------------------------------

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# sub-mode numbering follows the reference decoder's enum (RD/VR before
# LD/VL), because KF_BMODE_PROBS is transcribed in that indexing; the tree
# below is the RFC 6386 tree shape with leaves labelled accordingly, so the
# decoded bit patterns are identical either way
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_RD_PRED,
 B_VR_PRED, B_LD_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)
BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)
# 16x16 mode seen as a sub-mode by neighbouring B_PRED context (§11.4)
MODE_AS_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                 H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

# --- token constants (§13.2) --------------------------------------------------

COEFF_TREE = (
    -11, 2,       # dct_eob encoded as 11 here (see _TOKEN_*)
    -0, 4,        # DCT_0
    -1, 6,        # DCT_1
    8, 12,
    -2, 10,       # DCT_2
    -3, -4,       # DCT_3, DCT_4
    14, 16,
    -5, -6,       # cat1, cat2
    18, 20,
    -7, -8,       # cat3, cat4
    -9, -10,      # cat5, cat6
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)
_CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)


# --- boolean decoder (§7.3) ---------------------------------------------------


class BoolDecoder:
    __slots__ = ("buf", "pos", "rng", "val", "cnt")

    def __init__(self, buf: bytes):
        self.buf = buf
        b0 = buf[0] if len(buf) > 0 else 0
        b1 = buf[1] if len(buf) > 1 else 0
        self.val = (b0 << 8) | b1
        self.pos = 2
        self.rng = 255
        self.cnt = 0

    def bit(self, prob: int = 128) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.val >= big:
            ret = 1
            self.rng -= split
            self.val -= big
        else:
            ret = 0
            self.rng = split
        while self.rng < 128:
            self.val <<= 1
            self.rng <<= 1
            self.cnt += 1
            if self.cnt == 8:
                self.cnt = 0
                b = self.buf[self.pos] if self.pos < len(self.buf) else 0
                self.pos += 1
                self.val |= b
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bit() else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


# --- header state --------------------------------------------------------------


class _Segment:
    __slots__ = ("quant", "filt")

    def __init__(self):
        self.quant = 0
        self.filt = 0


def _clamp_q(x: int) -> int:
    return 0 if x < 0 else (127 if x > 127 else x)


class _DequantFactors:
    __slots__ = ("y1", "y2", "uv")

    def __init__(self, qi, y1dc, y2dc, y2ac, uvdc, uvac):
        # (dc, ac) per plane family — RFC 6386 §14.1, including the Y2
        # scaling and the chroma-DC cap
        self.y1 = (DC_QLOOKUP[_clamp_q(qi + y1dc)], AC_QLOOKUP[_clamp_q(qi)])
        y2d = DC_QLOOKUP[_clamp_q(qi + y2dc)] * 2
        y2a = AC_QLOOKUP[_clamp_q(qi + y2ac)] * 155 // 100
        if y2a < 8:
            y2a = 8
        self.y2 = (y2d, y2a)
        uvd = DC_QLOOKUP[_clamp_q(qi + uvdc)]
        if uvd > 132:
            uvd = 132
        self.uv = (uvd, AC_QLOOKUP[_clamp_q(qi + uvac)])


# --- the decoder ----------------------------------------------------------------


# debug hook: when a list, decode_vp8 appends (mb_y, mb_x, kind, payload)
# tuples for conformance triage; None in normal operation
_TRACE = None


def decode_vp8(data: bytes):
    """Decode a VP8 key-frame payload (the 'VP8 ' RIFF chunk body) to
    (Y, U, V) uint8 numpy planes, bit-identical to the reference decoder."""
    import numpy as np

    if len(data) < 10:
        raise ValueError("truncated VP8 payload")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    frame_type = tag & 1
    part0_size = tag >> 5
    if frame_type != 0:
        raise NotImplementedError("VP8 inter frame (impossible in still WebP)")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w_raw, h_raw = struct.unpack_from("<HH", data, 6)
    width, height = w_raw & 0x3FFF, h_raw & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("bad VP8 dimensions")

    part0 = data[10:10 + part0_size]
    bd = BoolDecoder(part0)

    bd.bit()  # color space (must be 0 for the profile we care about)
    bd.bit()  # clamping type (reconstruction clamps regardless)

    # -- segmentation (§9.3)
    segments = [_Segment() for _ in range(4)]
    seg_enabled = bd.bit()
    update_map = 0
    abs_values = 0
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        update_map = bd.bit()
        update_data = bd.bit()
        if update_data:
            abs_values = bd.bit()
            for s in segments:
                s.quant = bd.signed_literal(7) if bd.bit() else 0
            for s in segments:
                s.filt = bd.signed_literal(6) if bd.bit() else 0
        if update_map:
            seg_tree_probs = [bd.literal(8) if bd.bit() else 255
                              for _ in range(3)]

    # -- loop filter header (§9.4)
    filter_type_simple = bd.bit()
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.bit()
    ref_lf_deltas = [0, 0, 0, 0]
    mode_lf_deltas = [0, 0, 0, 0]
    if lf_delta_enabled and bd.bit():  # mode_ref_lf_delta_update
        for i in range(4):
            if bd.bit():
                ref_lf_deltas[i] = bd.signed_literal(6)
        for i in range(4):
            if bd.bit():
                mode_lf_deltas[i] = bd.signed_literal(6)

    # -- token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    part_area = data[10 + part0_size:]
    sizes_len = 3 * (n_parts - 1)
    parts: List[bytes] = []
    off = sizes_len
    for i in range(n_parts - 1):
        psz = part_area[3 * i] | (part_area[3 * i + 1] << 8) | (part_area[3 * i + 2] << 16)
        parts.append(part_area[off:off + psz])
        off += psz
    parts.append(part_area[off:])
    token_bd = [BoolDecoder(p) for p in parts]

    # -- quantizer indices (§9.6)
    y_ac_qi = bd.literal(7)
    y1dc = bd.signed_literal(4) if bd.bit() else 0
    y2dc = bd.signed_literal(4) if bd.bit() else 0
    y2ac = bd.signed_literal(4) if bd.bit() else 0
    uvdc = bd.signed_literal(4) if bd.bit() else 0
    uvac = bd.signed_literal(4) if bd.bit() else 0

    def seg_qi(seg_id: int) -> int:
        if not seg_enabled:
            return y_ac_qi
        q = segments[seg_id].quant
        return q if abs_values else y_ac_qi + q

    dqf = [_DequantFactors(_clamp_q(seg_qi(s)), y1dc, y2dc, y2ac, uvdc, uvac)
           for s in range(4)]

    bd.bit()  # refresh entropy probs (key frame: value irrelevant)

    # -- coefficient probability updates (§13.4)
    cp = bytearray(COEFF_PROBS)
    for i in range(1056):
        if bd.bit(COEFF_UPDATE_PROBS[i]):
            cp[i] = bd.literal(8)

    mb_no_skip = bd.bit()
    prob_skip_false = bd.literal(8) if mb_no_skip else 0

    # -- per-MB modes, whole frame, from partition 1 (§11)
    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4

    mb_seg = [[0] * mb_w for _ in range(mb_h)]
    mb_skip_flag = [[0] * mb_w for _ in range(mb_h)]
    mb_ymode = [[0] * mb_w for _ in range(mb_h)]
    mb_uvmode = [[0] * mb_w for _ in range(mb_h)]
    mb_bmodes: List[List[Optional[List[int]]]] = [[None] * mb_w for _ in range(mb_h)]

    # b-mode context rows: above[mb_x][0..3] = bottom row of sub-modes
    above_bm = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_bm = [B_DC_PRED] * 4
        for mx in range(mb_w):
            if seg_enabled and update_map:
                # segment_id tree: 2 bits, 3 probs (§10)
                if bd.bit(seg_tree_probs[0]):
                    seg_id = 2 + bd.bit(seg_tree_probs[2])
                else:
                    seg_id = bd.bit(seg_tree_probs[1])
                mb_seg[my][mx] = seg_id
            if mb_no_skip:
                mb_skip_flag[my][mx] = bd.bit(prob_skip_false)
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            mb_ymode[my][mx] = ymode
            if ymode == B_PRED:
                bms = [0] * 16
                for b in range(16):
                    a = above_bm[mx][b & 3] if b < 4 else bms[b - 4]
                    l = left_bm[b >> 2] if (b & 3) == 0 else bms[b - 1]
                    probs_off = (a * 10 + l) * 9
                    bms[b] = bd.tree(
                        BMODE_TREE, KF_BMODE_PROBS[probs_off:probs_off + 9])
                mb_bmodes[my][mx] = bms
                above_bm[mx] = bms[12:16]
                left_bm = [bms[3], bms[7], bms[11], bms[15]]
            else:
                bm = MODE_AS_BMODE[ymode]
                above_bm[mx] = [bm] * 4
                left_bm = [bm] * 4
            mb_uvmode[my][mx] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)
            if _TRACE is not None:
                _TRACE.append((my, mx, "modes",
                               (ymode, mb_uvmode[my][mx],
                                mb_skip_flag[my][mx])))

    # -- planes with 1-px top/left reconstruction margin (§12.2 borders)
    yw, yh = mb_w * 16, mb_h * 16
    cw, ch = mb_w * 8, mb_h * 8
    Y = np.empty((yh + 1, yw + 1), np.int32)
    U = np.empty((ch + 1, cw + 1), np.int32)
    V = np.empty((ch + 1, cw + 1), np.int32)
    for P in (Y, U, V):
        P[0, :] = 127   # above row (incl. above-left corner)
        P[:, 0] = 129
        P[0, 0] = 127

    # nonzero contexts: above per mb column, left per mb row
    # y: 4 entries, u: 2, v: 2, y2: 1
    above_nz = [[0] * 9 for _ in range(mb_w)]  # 4 y + 2 u + 2 v + 1 y2
    filt_info = [[None] * mb_w for _ in range(mb_h)]

    coeff_tmp = np.zeros(16, np.int32)

    def decode_coeffs(bd_t: BoolDecoder, block_type: int, ctx: int,
                      first: int, dq: Tuple[int, int]) -> Tuple[np.ndarray, int]:
        """One 4x4 block's dequantized coefficients in raster order; returns
        (array, has_nonzero)."""
        out = coeff_tmp
        out[:] = 0
        base = block_type * 264  # 8 bands * 3 ctx * 11
        ci = first
        nz = 0
        start = 0  # after a ZERO token, EOB cannot follow (§13.3)
        while ci < 16:
            probs_off = base + (COEFF_BANDS[ci] * 3 + ctx) * 11
            probs = cp[probs_off:probs_off + 11]
            tok = bd_t.tree(COEFF_TREE, probs, start)
            if tok == 11:  # EOB
                break
            if tok == 0:
                ctx = 0
                start = 2
                ci += 1
                continue
            start = 0
            if tok <= 4:
                v = tok
            else:
                cat = tok - 5
                v = _CAT_BASE[cat]
                add = 0
                for p in _CAT_PROBS[cat]:
                    add = (add << 1) | bd_t.bit(p)
                v += add
            ctx = 1 if v == 1 else 2
            if bd_t.bit():
                v = -v
            out[ZIGZAG[ci]] = v * dq[1 if ci > 0 else 0]
            nz = 1
            ci += 1
        return out, nz

    # exact integer transforms (§14.3/14.4); python // floors like C >> here
    def iwht4x4(blk: np.ndarray) -> np.ndarray:
        ip = blk.reshape(4, 4).astype(np.int64)
        a1 = ip[0] + ip[3]
        b1 = ip[1] + ip[2]
        c1 = ip[1] - ip[2]
        d1 = ip[0] - ip[3]
        t = np.empty((4, 4), np.int64)
        t[0] = a1 + b1
        t[1] = c1 + d1
        t[2] = a1 - b1
        t[3] = d1 - c1
        a1 = t[:, 0] + t[:, 3]
        b1 = t[:, 1] + t[:, 2]
        c1 = t[:, 1] - t[:, 2]
        d1 = t[:, 0] - t[:, 3]
        o = np.empty((4, 4), np.int64)
        o[:, 0] = (a1 + b1 + 3) >> 3
        o[:, 1] = (c1 + d1 + 3) >> 3
        o[:, 2] = (a1 - b1 + 3) >> 3
        o[:, 3] = (d1 - c1 + 3) >> 3
        return o

    def idct4x4(blk: np.ndarray) -> np.ndarray:
        ip = blk.reshape(4, 4).astype(np.int64)
        t = np.empty((4, 4), np.int64)
        # columns-as-rows pass 1 on rows of the transposed layout: the RFC
        # operates on columns first; blk is raster (row-major), so pass 1
        # runs down each column
        c1, c2 = 20091, 35468
        a1 = ip[0] + ip[2]
        b1 = ip[0] - ip[2]
        t1 = (ip[1] * c2) >> 16
        t2 = ip[3] + ((ip[3] * c1) >> 16)
        c_ = t1 - t2
        t1 = ip[1] + ((ip[1] * c1) >> 16)
        t2 = (ip[3] * c2) >> 16
        d_ = t1 + t2
        t[0] = a1 + d_
        t[3] = a1 - d_
        t[1] = b1 + c_
        t[2] = b1 - c_
        o = np.empty((4, 4), np.int64)
        a1 = t[:, 0] + t[:, 2]
        b1 = t[:, 0] - t[:, 2]
        t1 = (t[:, 1] * c2) >> 16
        t2 = t[:, 3] + ((t[:, 3] * c1) >> 16)
        c_ = t1 - t2
        t1 = t[:, 1] + ((t[:, 1] * c1) >> 16)
        t2 = (t[:, 3] * c2) >> 16
        d_ = t1 + t2
        o[:, 0] = (a1 + d_ + 4) >> 3
        o[:, 3] = (a1 - d_ + 4) >> 3
        o[:, 1] = (b1 + c_ + 4) >> 3
        o[:, 2] = (b1 - c_ + 4) >> 3
        return o

    def pred16_or_8(P: np.ndarray, x: int, y: int, n: int, mode: int,
                    have_above: bool, have_left: bool) -> np.ndarray:
        # P indexed with the +1 margin; (x, y) are margin coords of the
        # block's top-left pixel
        above = P[y - 1, x:x + n]
        left = P[y:y + n, x - 1]
        if mode == DC_PRED:
            if have_above and have_left:
                dc = (int(above.sum()) + int(left.sum()) + n) >> _log2p1(n)
            elif have_above:
                dc = (int(above.sum()) + (n >> 1)) >> _log2(n)
            elif have_left:
                dc = (int(left.sum()) + (n >> 1)) >> _log2(n)
            else:
                dc = 128
            return np.full((n, n), dc, np.int64)
        if mode == V_PRED:
            return np.repeat(above[None, :], n, axis=0).astype(np.int64)
        if mode == H_PRED:
            return np.repeat(left[:, None], n, axis=1).astype(np.int64)
        # TM_PRED — the prediction itself clamps to pixel range BEFORE the
        # residue is added (reference clip_8b in TrueMotion)
        tl = int(P[y - 1, x - 1])
        return np.clip(left[:, None].astype(np.int64)
                       + above[None, :].astype(np.int64) - tl, 0, 255)

    def _log2(n):
        return 4 if n == 16 else 3

    def _log2p1(n):
        return 5 if n == 16 else 4

    def pred_b(P, x, y, mode, tr) -> np.ndarray:
        """4x4 sub-block prediction (§12.3), the spec's explicit per-pixel
        formulas. Edge naming follows the reference decoder: I J K L = left
        column top-to-bottom, X = above-left, A B C D = above row,
        E F G H = the 4 above-right pixels (resolved per the MB-level
        rule and passed in as tr)."""
        A_, B_, C_, D_ = (int(v) for v in P[y - 1, x:x + 4])
        I_, J_, K_, L_ = (int(v) for v in P[y:y + 4, x - 1])
        X_ = int(P[y - 1, x - 1])
        E_, F_, G_, H_ = (int(v) for v in tr)
        a3 = lambda p, q, r: (p + 2 * q + r + 2) >> 2
        a2 = lambda p, q: (p + q + 1) >> 1
        o = np.empty((4, 4), np.int64)
        if mode == B_DC_PRED:
            o[:] = (A_ + B_ + C_ + D_ + I_ + J_ + K_ + L_ + 4) >> 3
        elif mode == B_TM_PRED:
            L4 = np.array([I_, J_, K_, L_], np.int64)
            A4 = np.array([A_, B_, C_, D_], np.int64)
            o[:] = np.clip(L4[:, None] + A4[None, :] - X_, 0, 255)
        elif mode == B_VE_PRED:
            o[:] = np.array([a3(X_, A_, B_), a3(A_, B_, C_),
                             a3(B_, C_, D_), a3(C_, D_, E_)], np.int64)[None, :]
        elif mode == B_HE_PRED:
            o[:] = np.array([a3(X_, I_, J_), a3(I_, J_, K_),
                             a3(J_, K_, L_), a3(K_, L_, L_)], np.int64)[:, None]
        elif mode == B_LD_PRED:
            e = [A_, B_, C_, D_, E_, F_, G_, H_]
            for r in range(4):
                for c in range(4):
                    i = r + c
                    o[r, c] = (a3(e[i], e[i + 1], e[i + 2]) if i < 6
                               else a3(e[6], e[7], e[7]))
        elif mode == B_RD_PRED:
            e = [L_, K_, J_, I_, X_, A_, B_, C_, D_]
            for r in range(4):
                for c in range(4):
                    i = 4 + c - r
                    o[r, c] = a3(e[i - 1], e[i], e[i + 1])
        elif mode == B_VR_PRED:
            o[0, 0] = o[2, 1] = a2(X_, A_)
            o[0, 1] = o[2, 2] = a2(A_, B_)
            o[0, 2] = o[2, 3] = a2(B_, C_)
            o[0, 3] = a2(C_, D_)
            o[1, 0] = o[3, 1] = a3(I_, X_, A_)
            o[1, 1] = o[3, 2] = a3(X_, A_, B_)
            o[1, 2] = o[3, 3] = a3(A_, B_, C_)
            o[1, 3] = a3(B_, C_, D_)
            o[2, 0] = a3(X_, I_, J_)
            o[3, 0] = a3(I_, J_, K_)
        elif mode == B_VL_PRED:
            o[0, 0] = a2(A_, B_)
            o[0, 1] = o[2, 0] = a2(B_, C_)
            o[0, 2] = o[2, 1] = a2(C_, D_)
            o[0, 3] = o[2, 2] = a2(D_, E_)
            o[1, 0] = a3(A_, B_, C_)
            o[1, 1] = o[3, 0] = a3(B_, C_, D_)
            o[1, 2] = o[3, 1] = a3(C_, D_, E_)
            o[1, 3] = o[3, 2] = a3(D_, E_, F_)
            o[2, 3] = a3(E_, F_, G_)
            o[3, 3] = a3(F_, G_, H_)
        elif mode == B_HD_PRED:
            o[0, 0] = o[1, 2] = a2(I_, X_)
            o[0, 1] = o[1, 3] = a3(I_, X_, A_)
            o[0, 2] = a3(X_, A_, B_)
            o[0, 3] = a3(A_, B_, C_)
            o[1, 0] = o[2, 2] = a2(J_, I_)
            o[1, 1] = o[2, 3] = a3(J_, I_, X_)
            o[2, 0] = o[3, 2] = a2(K_, J_)
            o[2, 1] = o[3, 3] = a3(K_, J_, I_)
            o[3, 0] = a2(L_, K_)
            o[3, 1] = a3(L_, K_, J_)
        else:  # B_HU_PRED
            o[0, 0] = a2(I_, J_)
            o[0, 1] = a3(I_, J_, K_)
            o[0, 2] = o[1, 0] = a2(J_, K_)
            o[0, 3] = o[1, 1] = a3(J_, K_, L_)
            o[1, 2] = o[2, 0] = a2(K_, L_)
            o[1, 3] = o[2, 1] = a3(K_, L_, L_)
            o[2, 2] = o[2, 3] = o[3, 0] = o[3, 1] = o[3, 2] = o[3, 3] = L_
        return o

    def clamp_plane(a):
        np.clip(a, 0, 255, out=a)
        return a

    # -- reconstruction ----------------------------------------------------------
    for my in range(mb_h):
        left_nz = [0] * 9
        bd_t = token_bd[my % n_parts]
        for mx in range(mb_w):
            seg_id = mb_seg[my][mx]
            dq = dqf[seg_id]
            ymode = mb_ymode[my][mx]
            has_y2 = ymode != B_PRED
            anz = above_nz[mx]

            coeffs_y = [None] * 16
            coeffs_u = [None] * 4
            coeffs_v = [None] * 4
            dc16 = None
            mb_nz = 0

            if mb_skip_flag[my][mx]:
                # signalled: no coefficients at all. Y/U/V contexts reset;
                # the Y2 context resets ONLY when this MB has a Y2 block —
                # a skipped B_PRED MB leaves its neighbours' Y2 context
                # untouched (reference reset_mb_tokens_context)
                for i in range(8):
                    left_nz[i] = 0
                    anz[i] = 0
                if has_y2:
                    left_nz[8] = 0
                    anz[8] = 0
                skip_mb = True
            else:
                skip_mb = False
                if has_y2:
                    ctx = left_nz[8] + anz[8]
                    blk, nz = decode_coeffs(bd_t, 1, ctx, 0, dq.y2)
                    left_nz[8] = anz[8] = nz
                    mb_nz |= nz
                    dc16 = iwht4x4(blk.copy())
                ytype = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for b in range(16):
                    bx, by = b & 3, b >> 2
                    ctx = left_nz[by] + anz[bx]
                    blk, nz = decode_coeffs(bd_t, ytype, ctx, first, dq.y1)
                    left_nz[by] = anz[bx] = nz
                    mb_nz |= nz
                    c = blk.copy()
                    if has_y2:
                        c[0] = dc16[by, bx]
                    coeffs_y[b] = c
                for pl, coeffs_c in ((0, coeffs_u), (1, coeffs_v)):
                    for b in range(4):
                        bx, by = b & 1, b >> 1
                        li, ai = 4 + 2 * pl + by, 4 + 2 * pl + bx
                        ctx = left_nz[li] + anz[ai]
                        blk, nz = decode_coeffs(bd_t, 2, ctx, 0, dq.uv)
                        left_nz[li] = anz[ai] = nz
                        mb_nz |= nz
                        coeffs_c[b] = blk.copy()
                        if _TRACE is not None:
                            _TRACE.append((my, mx, f"uv{pl}b{b}", blk.copy()))
            # has-no-coefficients for the loop filter's inner-edge rule:
            # skipped, or every token decoded to zero (incl. the Y2 block)
            no_coeffs = skip_mb or not mb_nz
            filt_info[my][mx] = (seg_id, ymode, no_coeffs)

            # luma prediction + residue
            y0, x0 = my * 16 + 1, mx * 16 + 1
            have_above, have_left = my > 0, mx > 0
            if ymode != B_PRED:
                p = pred16_or_8(Y, x0, y0, 16, ymode, have_above, have_left)
                if not skip_mb:
                    for b in range(16):
                        if coeffs_y[b] is None:
                            continue
                        bx, by = (b & 3) * 4, (b >> 2) * 4
                        p[by:by + 4, bx:bx + 4] += idct4x4(coeffs_y[b])
                Y[y0:y0 + 16, x0:x0 + 16] = clamp_plane(p)
            else:
                # resolve the 4 above-right pixels once per MB (§12.3 and
                # the well-known stale-top-right rule for rows 1-3)
                if my == 0:
                    tr_mb = np.full(4, 127, np.int64)
                elif mx == mb_w - 1:
                    tr_mb = np.full(4, int(Y[y0 - 1, x0 + 15]), np.int64)
                else:
                    tr_mb = Y[y0 - 1, x0 + 16:x0 + 20].astype(np.int64)
                bms = mb_bmodes[my][mx]
                if _TRACE is not None:
                    _TRACE.append((my, mx, "bmodes", list(bms)))
                for b in range(16):
                    bx, by = (b & 3) * 4, (b >> 2) * 4
                    px, py = x0 + bx, y0 + by
                    if (b & 3) == 3:       # right-edge subblock
                        tr = tr_mb
                    elif by == 0:          # top row: real above pixels
                        tr = Y[py - 1, px + 4:px + 8].astype(np.int64)
                    else:
                        # above-right inside the MB: the above block's
                        # bottom row is not yet what we need — spec says use
                        # the reconstructed above row, which IS available
                        tr = Y[py - 1, px + 4:px + 8].astype(np.int64)
                    p = pred_b(Y, px, py, bms[b], tr)
                    if not skip_mb and coeffs_y[b] is not None:
                        p += idct4x4(coeffs_y[b])
                    Y[py:py + 4, px:px + 4] = clamp_plane(p)

            # chroma
            uvmode = mb_uvmode[my][mx]
            cy0, cx0 = my * 8 + 1, mx * 8 + 1
            for P, coeffs_c in ((U, coeffs_u), (V, coeffs_v)):
                p = pred16_or_8(P, cx0, cy0, 8, uvmode, have_above, have_left)
                if not skip_mb:
                    for b in range(4):
                        if coeffs_c[b] is None:
                            continue
                        bx, by = (b & 1) * 4, (b >> 1) * 4
                        p[by:by + 4, bx:bx + 4] += idct4x4(coeffs_c[b])
                P[cy0:cy0 + 8, cx0:cx0 + 8] = clamp_plane(p)

    # -- loop filter (§15) --------------------------------------------------------
    if filter_level > 0:
        _loop_filter(Y, U, V, filt_info, mb_w, mb_h, filter_type_simple,
                     filter_level, sharpness, seg_enabled, abs_values,
                     segments, lf_delta_enabled, ref_lf_deltas, mode_lf_deltas)

    y_out = Y[1:height + 1, 1:width + 1].astype(np.uint8)
    cwid, chei = (width + 1) // 2, (height + 1) // 2
    u_out = U[1:chei + 1, 1:cwid + 1].astype(np.uint8)
    v_out = V[1:chei + 1, 1:cwid + 1].astype(np.uint8)
    return y_out, u_out, v_out


# --- loop filter ---------------------------------------------------------------


def _loop_filter(Y, U, V, filt_info, mb_w, mb_h, simple, base_level,
                 sharpness, seg_enabled, abs_values, segments,
                 lf_delta_enabled, ref_lf_deltas, mode_lf_deltas):
    import numpy as np

    def mb_level(seg_id, ymode):
        lvl = base_level
        if seg_enabled:
            lvl = segments[seg_id].filt if abs_values else lvl + segments[seg_id].filt
            lvl = max(0, min(63, lvl))
        if lf_delta_enabled:
            lvl += ref_lf_deltas[0]          # key frame: intra
            if ymode == B_PRED:
                lvl += mode_lf_deltas[0]
        return max(0, min(63, lvl))

    def limits(lvl):
        ilim = lvl
        if sharpness:
            ilim >>= 2 if sharpness > 4 else 1
            if ilim > 9 - sharpness:
                ilim = 9 - sharpness
        if ilim < 1:
            ilim = 1
        hev = 0
        if lvl >= 40:
            hev = 2
        elif lvl >= 15:
            hev = 1
        return ilim, hev

    def c128(x):
        return np.clip(x, -128, 127)

    def normal_edge(p3, p2, p1, p0, q0, q1, q2, q3, E, I, T, mb_edge):
        """Vectorized RFC 6386 §15.2/15.3 normal filter on parallel pixel
        lanes; returns the (possibly) modified 8 lanes."""
        a = np.abs
        mask = ((a(p3 - p2) <= I) & (a(p2 - p1) <= I) & (a(p1 - p0) <= I)
                & (a(q1 - q0) <= I) & (a(q2 - q1) <= I) & (a(q3 - q2) <= I)
                & (a(p0 - q0) * 2 + (a(p1 - q1) >> 1) <= E))
        hev = (a(p1 - p0) > T) | (a(q1 - q0) > T)
        # to signed domain
        P1, P0, Q0, Q1 = (x - 128 for x in (p1, p0, q0, q1))
        P2, Q2 = p2 - 128, q2 - 128

        if not mb_edge:
            # subblock filter: common adjust, then outer taps when !hev
            w = c128(c128(P1 - Q1) * hev + 3 * (Q0 - P0))
            # note: hev as int multiplies the P1-Q1 term in/out
            F1 = c128(w + 4) >> 3
            F2 = c128(w + 3) >> 3
            nQ0 = c128(Q0 - F1)
            nP0 = c128(P0 + F2)
            f = (F1 + 1) >> 1
            nQ1 = np.where(hev, Q1, c128(Q1 - f))
            nP1 = np.where(hev, P1, c128(P1 + f))
            p1n = np.where(mask, nP1 + 128, p1)
            p0n = np.where(mask, nP0 + 128, p0)
            q0n = np.where(mask, nQ0 + 128, q0)
            q1n = np.where(mask, nQ1 + 128, q1)
            return p3, p2, p1n, p0n, q0n, q1n, q2, q3
        # MB edge filter (§15.3): hev lanes get the common adjust, others
        # the 3-tap wide filter
        w_hev = c128(c128(P1 - Q1) + 3 * (Q0 - P0))
        F1 = c128(w_hev + 4) >> 3
        F2 = c128(w_hev + 3) >> 3
        hQ0 = c128(Q0 - F1)
        hP0 = c128(P0 + F2)
        w = c128(c128(P1 - Q1) + 3 * (Q0 - P0))
        aa = c128((27 * w + 63) >> 7)
        wQ0 = c128(Q0 - aa)
        wP0 = c128(P0 + aa)
        aa = c128((18 * w + 63) >> 7)
        wQ1 = c128(Q1 - aa)
        wP1 = c128(P1 + aa)
        aa = c128((9 * w + 63) >> 7)
        wQ2 = c128(Q2 - aa)
        wP2 = c128(P2 + aa)
        p2n = np.where(mask & ~hev, wP2 + 128, p2)
        p1n = np.where(mask & ~hev, wP1 + 128, p1)
        p0n = np.where(mask, np.where(hev, hP0, wP0) + 128, p0)
        q0n = np.where(mask, np.where(hev, hQ0, wQ0) + 128, q0)
        q1n = np.where(mask & ~hev, wQ1 + 128, q1)
        q2n = np.where(mask & ~hev, wQ2 + 128, q2)
        return p3, p2n, p1n, p0n, q0n, q1n, q2n, q3

    def simple_edge(p1, p0, q0, q1, E):
        a = np.abs
        mask = (a(p0 - q0) * 2 + (a(p1 - q1) >> 1)) <= E
        P1, P0, Q0, Q1 = (x - 128 for x in (p1, p0, q0, q1))
        w = c128(c128(P1 - Q1) + 3 * (Q0 - P0))
        F1 = c128(w + 4) >> 3
        F2 = c128(w + 3) >> 3
        q0n = np.where(mask, c128(Q0 - F1) + 128, q0)
        p0n = np.where(mask, c128(P0 + F2) + 128, p0)
        return p0n, q0n

    def filter_v(P, x, y0, n, E, I, T, mb_edge):
        """Vertical edge at column x (margin coords), rows y0..y0+n."""
        cols = [P[y0:y0 + n, x + d] for d in range(-4, 4)]
        out = normal_edge(*cols, E, I, T, mb_edge)
        for d, col in zip(range(-4, 4), out):
            P[y0:y0 + n, x + d] = col

    def filter_h(P, x0, y, n, E, I, T, mb_edge):
        rows = [P[y + d, x0:x0 + n] for d in range(-4, 4)]
        out = normal_edge(*rows, E, I, T, mb_edge)
        for d, row in zip(range(-4, 4), out):
            P[y + d, x0:x0 + n] = row

    def sfilter_v(P, x, y0, n, E):
        p1, p0, q0, q1 = (P[y0:y0 + n, x + d] for d in range(-2, 2))
        p0n, q0n = simple_edge(p1, p0, q0, q1, E)
        P[y0:y0 + n, x - 1] = p0n
        P[y0:y0 + n, x] = q0n

    def sfilter_h(P, x0, y, n, E):
        p1, p0, q0, q1 = (P[y + d, x0:x0 + n] for d in range(-2, 2))
        p0n, q0n = simple_edge(p1, p0, q0, q1, E)
        P[y - 1, x0:x0 + n] = p0n
        P[y, x0:x0 + n] = q0n

    for my in range(mb_h):
        for mx in range(mb_w):
            seg_id, ymode, no_coeffs = filt_info[my][mx]
            lvl = mb_level(seg_id, ymode)
            if lvl == 0:
                continue
            ilim, hev_t = limits(lvl)
            mb_e = ((lvl + 2) * 2) + ilim
            sb_e = (lvl * 2) + ilim
            inner = (not no_coeffs) or ymode == B_PRED
            y0, x0 = my * 16 + 1, mx * 16 + 1
            cy0, cx0 = my * 8 + 1, mx * 8 + 1
            if simple:
                if mx > 0:
                    sfilter_v(Y, x0, y0, 16, mb_e)
                if inner:
                    for dx in (4, 8, 12):
                        sfilter_v(Y, x0 + dx, y0, 16, sb_e)
                if my > 0:
                    sfilter_h(Y, x0, y0, 16, mb_e)
                if inner:
                    for dy in (4, 8, 12):
                        sfilter_h(Y, x0, y0 + dy, 16, sb_e)
                continue
            if mx > 0:
                filter_v(Y, x0, y0, 16, mb_e, ilim, hev_t, True)
                filter_v(U, cx0, cy0, 8, mb_e, ilim, hev_t, True)
                filter_v(V, cx0, cy0, 8, mb_e, ilim, hev_t, True)
            if inner:
                for dx in (4, 8, 12):
                    filter_v(Y, x0 + dx, y0, 16, sb_e, ilim, hev_t, False)
                filter_v(U, cx0 + 4, cy0, 8, sb_e, ilim, hev_t, False)
                filter_v(V, cx0 + 4, cy0, 8, sb_e, ilim, hev_t, False)
            if my > 0:
                filter_h(Y, x0, y0, 16, mb_e, ilim, hev_t, True)
                filter_h(U, cx0, cy0, 8, mb_e, ilim, hev_t, True)
                filter_h(V, cx0, cy0, 8, mb_e, ilim, hev_t, True)
            if inner:
                for dy in (4, 8, 12):
                    filter_h(Y, x0, y0 + dy, 16, sb_e, ilim, hev_t, False)
                filter_h(U, cx0, cy0 + 4, 8, sb_e, ilim, hev_t, False)
                filter_h(V, cx0, cy0 + 4, 8, sb_e, ilim, hev_t, False)
