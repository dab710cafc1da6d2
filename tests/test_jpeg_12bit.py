"""12-bit DCT sample precision (T.81 B.2.2 extended processes) — the last
named raise of the process matrix (VERDICT r10 Next #6).

Mirror-coder discipline as everywhere in this codec family: encode_jpeg
grows precision=12 (SOF1 sequential / SOF2 progressive, Pq=1 16-bit DQT
elements, 2048 level shift, data-derived canonical Huffman tables whose
magnitude categories go wherever 12-bit coefficients reach), and the
round trip pins the decoder's wide dequant/IDCT/clamp path. Reference
tie: the reference engine delegates all media decode to client libraries
(no JPEG surface); this is beyond-reference capability for multimodal
corpus columns."""

import numpy as np
import pytest

from data_diff_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _img12(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 1024 + 1500 * np.sin(yy / 7.0) + 900 * np.cos(xx / 5.0)
    img = base + rng.integers(-300, 301, size=(h, w))
    return np.clip(img, 0, 4095).astype(np.uint16)


@pytest.mark.parametrize("shape", [(24, 24), (17, 31)])
def test_sequential_12bit_roundtrip_near_lossless(shape):
    img = _img12(*shape)
    data = encode_jpeg(img, quant=1, precision=12)
    assert b"\xff\xc1" in data and b"\xff\xc0" not in data  # SOF1, not baseline
    assert data[data.index(b"\xff\xdb") + 4] == 0x10  # Pq=1 16-bit DQT
    got = decode_jpeg(data)
    assert got.dtype == np.uint16 and got.shape == img.shape
    assert int(got.max()) > 255  # actually uses the wide range
    # quant=1: error bounded by coefficient rounding, same bound scale as
    # the 8-bit near-lossless pin (orthonormal DCT, <=0.5/coef)
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2


def test_progressive_12bit_equals_sequential():
    img = _img12(32, 24, seed=9)
    seq = decode_jpeg(encode_jpeg(img, quant=4, precision=12))
    prog_bytes = encode_jpeg(img, quant=4, precision=12, progressive=True)
    assert b"\xff\xc2" in prog_bytes
    prog = decode_jpeg(prog_bytes)
    # same quantized coefficients travel both ways
    np.testing.assert_array_equal(seq, prog)


def test_12bit_color_roundtrip():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 4096, size=(16, 16, 3)).astype(np.uint16)
    got = decode_jpeg(encode_jpeg(img, quant=1, precision=12))
    assert got.dtype == np.uint16 and got.shape == img.shape
    # color transform round trip: loose bound (chroma rounding), but the
    # wide range must survive
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 16
    assert int(got.max()) > 255


def test_wide_quant_table_16bit_elements():
    """Quantizer steps above 255 only exist in Pq=1 territory — legal for
    12-bit and must round-trip through the DQT parse."""
    img = _img12(16, 16, seed=11)
    data = encode_jpeg(img, quant=300, precision=12)
    got = decode_jpeg(data)
    # heavy quantization: just structural sanity + dtype
    assert got.shape == img.shape and got.dtype == np.uint16


def test_baseline_rejects_12bit_and_bad_precisions():
    img = _img12(8, 8)
    data = bytearray(encode_jpeg(img, quant=1, precision=12))
    i = data.index(b"\xff\xc1")
    data[i + 1] = 0xC0  # rebrand the frame as baseline SOF0
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(data))
    data[i + 1] = 0xC1
    data[i + 4] = 10  # P=10 is not a DCT precision
    with pytest.raises(ValueError, match="precision 10"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="8 or 12"):
        encode_jpeg(img, precision=10)


def test_8bit_streams_unchanged():
    """The precision plumbing must not disturb the 8-bit path: same bytes
    as before for an 8-bit encode (SOF0, Pq=0), uint8 out."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(16, 16)).astype(np.uint8)
    data = encode_jpeg(img, quant=2)
    assert b"\xff\xc0" in data
    assert data[data.index(b"\xff\xdb") + 4] == 0x00
    got = decode_jpeg(data)
    assert got.dtype == np.uint8
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 4


def test_arith_sequential_12bit_roundtrip():
    """SOF9 at P=12: the arithmetic twin, built with the same mirror QM
    encoder the SOF13/14 tests pin (decode side libjpeg-conformance-pinned
    at 8-bit; the entropy layer is precision-agnostic — only the header,
    level shift and clamp widen)."""
    import struct

    import data_diff_spark.functions.jpeg as J
    from test_jpeg_hier_dct_arith import _enc_ac_band, _enc_dc
    from test_jpeg_lossless_arith import _QMEnc

    img = _img12(24, 16, seed=7)
    q = np.full(64, 1, dtype=np.int32)
    A = J._idct_matrix()
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(img.astype(np.float64), ((0, ph - h), (0, pw - w)),
               mode="edge") - 2048.0

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x10]) + struct.pack(">64H", *(int(x) for x in q)))
    seg(0xC9, bytes([12]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    enc = _QMEnc()
    dcs, acs = bytearray(64), bytearray(256)
    fixed = bytearray([J._FIXED_STATE])
    ctx, pred = [0], 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            coef = A @ p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] @ A.T
            zz = np.round(coef.flat[J.ZIGZAG] / q).astype(np.int64)
            dc = int(zz[0])
            _enc_dc(enc, dcs, ctx, 0, dc - pred)
            pred = dc
            _enc_ac_band(enc, acs, fixed, zz)
    out.extend(enc.flush())
    out.extend(b"\xff\xd9")
    got = J.decode_jpeg(bytes(out))
    assert got.dtype == np.uint16 and got.shape == img.shape
    assert int(got.max()) > 255
    assert int(np.abs(got.astype(int) - img.astype(int)).max()) <= 2
