"""Arithmetic-coded JPEG decoder conformance (functions/jpeg.py Annex D/F/G).

The oracle is the system libjpeg, which ships the arithmetic entropy
codecs: tools/jpeg_arith_shim.c (compiled here at run time, skipped when
gcc/libjpeg are absent) encodes pixels as SOF9 (sequential) / SOF10
(progressive) arithmetic JPEGs and dumps any JPEG's raw quantized DCT
coefficients via jpeg_read_coefficients. The pin is EXACT coefficient
equality — the rounding-free comparison point between independent JPEG
implementations (pixel output depends on each decoder's IDCT flavor).
"""

import os
import shutil
import struct
import subprocess

import numpy as np
import pytest

import data_diff_spark.functions.jpeg as J
from data_diff_spark.functions.jpeg import ZIGZAG, decode_jpeg


@pytest.fixture(scope="module")
def shim(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("gcc not available to build the libjpeg oracle shim")
    exe = tmp_path_factory.mktemp("jshim") / "jshim"
    src = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "tools", "jpeg_arith_shim.c")
    r = subprocess.run(["gcc", "-O1", "-o", str(exe), src, "-ljpeg"],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"libjpeg oracle shim did not build: {r.stderr[:200]}")
    return str(exe)


def _encode(shim, tmp, img, q, progressive, restart):
    pnm = tmp / "in.pnm"
    jpg = tmp / "out.jpg"
    if img.ndim == 2:
        hdr = f"P5 {img.shape[1]} {img.shape[0]} 255\n".encode()
    else:
        hdr = f"P6 {img.shape[1]} {img.shape[0]} 255\n".encode()
    pnm.write_bytes(hdr + img.tobytes())
    subprocess.run([shim, "encode", str(pnm), str(jpg), str(q),
                    str(int(progressive)), str(restart)], check=True)
    return jpg.read_bytes()


def _oracle_coefs(shim, tmp, data):
    jpg = tmp / "o.jpg"
    out = tmp / "o.bin"
    jpg.write_bytes(data)
    subprocess.run([shim, "coef", str(jpg), str(out)], check=True)
    raw = out.read_bytes()
    off = 0
    (nc,) = struct.unpack_from("<i", raw, off)
    off += 4
    comps = []
    for _ in range(nc):
        bw, bh = struct.unpack_from("<ii", raw, off)
        off += 8
        n = bw * bh * 64
        comps.append(np.frombuffer(raw, np.int16, n, off).reshape(bh, bw, 64))
        off += 2 * n
    return comps


def _my_coefs(data):
    cap = {}
    orig = J._reconstruct

    def hook(frame, store, qt):
        cap["store"] = store
        return orig(frame, store, qt)

    J._reconstruct = hook
    try:
        pix = decode_jpeg(data)
    finally:
        J._reconstruct = orig
    return cap["store"], pix


def assert_coef_exact(shim, tmp, data):
    oracle = _oracle_coefs(shim, tmp, data)
    mine, _ = _my_coefs(data)
    assert data[3] in (0xC9, 0xCA) or any(  # fixture really is arithmetic
        data[i] == 0xFF and data[i + 1] in (0xC9, 0xCA) for i in range(len(data) - 1))
    for ci, (m, o) in enumerate(zip(mine, oracle)):
        nat = np.zeros_like(m)
        nat[:, :, ZIGZAG] = m  # store is zigzag-ordered; oracle natural
        bh, bw = o.shape[:2]
        assert np.array_equal(nat[:bh, :bw], o.astype(np.int32)), \
            f"component {ci} coefficients differ"


@pytest.mark.parametrize("q", [30, 75, 95])
@pytest.mark.parametrize("progressive", [0, 1], ids=["SOF9", "SOF10"])
def test_color_conformance(shim, tmp_path, q, progressive):
    img = np.random.default_rng(q + progressive).integers(
        0, 256, (24, 32, 3), dtype=np.uint8)
    assert_coef_exact(shim, tmp_path, _encode(shim, tmp_path, img, q, progressive, 0))


@pytest.mark.parametrize("restart", [1, 2, 3])
def test_restart_intervals(shim, tmp_path, restart):
    """RSTn in arithmetic scans: statistics AND the decoder re-initialize
    per interval (F.2.1.3) — both sequential and progressive."""
    img = np.random.default_rng(restart).integers(0, 256, (48, 64, 3), dtype=np.uint8)
    assert_coef_exact(shim, tmp_path, _encode(shim, tmp_path, img, 70, 0, restart))
    assert_coef_exact(shim, tmp_path, _encode(shim, tmp_path, img, 70, 1, restart))


@pytest.mark.parametrize("shape", [(8, 8), (17, 23), (64, 48)])
def test_sizes_and_partial_mcus(shim, tmp_path, shape):
    img = np.random.default_rng(sum(shape)).integers(0, 256, shape + (3,), dtype=np.uint8)
    for progressive in (0, 1):
        assert_coef_exact(shim, tmp_path, _encode(shim, tmp_path, img, 75, progressive, 0))


def test_greyscale(shim, tmp_path):
    img = np.random.default_rng(9).integers(0, 256, (40, 56), dtype=np.uint8)
    for progressive in (0, 1):
        assert_coef_exact(shim, tmp_path, _encode(shim, tmp_path, img, 70, progressive, 0))


def test_smooth_content_dc_conditioning(shim, tmp_path):
    """Smooth gradients drive the DC conditioning categories (zero/small/
    large diff) through their transitions — the context-reclassification
    path random noise rarely exercises."""
    x, y = np.linspace(0, 255, 64), np.linspace(0, 255, 48)
    img = np.stack(np.meshgrid(x, y) + [np.add.outer(y, x) / 2],
                   axis=-1).astype(np.uint8)
    for q in (30, 90):
        assert_coef_exact(shim, tmp_path, _encode(shim, tmp_path, img, q, 0, 0))


def test_pixel_output_sane(shim, tmp_path):
    """Full decode (coefficients + our IDCT) reconstructs the source
    closely at high quality — the end-to-end sanity on top of the exact
    coefficient pin."""
    x, y = np.linspace(40, 215, 24), np.linspace(40, 215, 24)
    img = np.stack(np.meshgrid(x, y) + [np.add.outer(y, x) / 2],
                   axis=-1).astype(np.uint8)
    data = _encode(shim, tmp_path, img, 95, 0, 0)
    _, pix = _my_coefs(data)
    assert pix.shape == img.shape
    assert np.abs(pix.astype(int) - img.astype(int)).mean() < 4


def test_sequential_and_progressive_agree(shim, tmp_path):
    """The same pixels through SOF9 and SOF10 reconstruct identically when
    the quantized coefficients agree — transmission order must not leak
    into the output (the same identity the huffman tests pin)."""
    img = np.random.default_rng(6).integers(0, 256, (32, 40, 3), dtype=np.uint8)
    a = decode_jpeg(_encode(shim, tmp_path, img, 80, 0, 0))
    b = decode_jpeg(_encode(shim, tmp_path, img, 80, 1, 0))
    assert np.array_equal(a, b)


def test_state_table_mutation_breaks_conformance(shim, tmp_path, monkeypatch):
    """Same honesty contract as the VP8 tables: corrupting one transcribed
    T.81 D.3 entry must break the exact-coefficient pin (state 1 is on the
    adaptation path of every frame)."""
    img = np.random.default_rng(8).integers(0, 256, (24, 24, 3), dtype=np.uint8)
    data = _encode(shim, tmp_path, img, 75, 0, 0)
    oracle = _oracle_coefs(shim, tmp_path, data)
    tab = list(J._ARITH_TAB)
    qe, nl, nm, sw = tab[1]
    tab[1] = (qe ^ 0x40, nl, nm, sw)
    monkeypatch.setattr(J, "_ARITH_TAB", tuple(tab))
    try:
        mine, _ = _my_coefs(data)
        m0 = np.zeros_like(mine[0])
        m0[:, :, ZIGZAG] = mine[0]
        same = np.array_equal(m0[:oracle[0].shape[0], :oracle[0].shape[1]],
                              oracle[0].astype(np.int32))
    except Exception:
        same = False  # a crash is also "detected"
    assert not same, "mutating _ARITH_TAB[1] went undetected"
