"""Golden tests for the NumPy scalar reference (the WaveletDemo oracle).

Reproduces the reference's WaveletDemo pipeline (`Example/WaveletDemo/
wavelets.c`) on data/testpatt.pgm and checks the published PSNR gate
(~54.386 dB, reference README.md:103-112), plus perfect-reconstruction
properties of the 2-6 DWT without quantization.
"""

import numpy as np
import pytest

from tests.conftest import TESTPATT
from cineform_tpu.ref import scalar
from cineform_tpu.utils.metrics import psnr
from cineform_tpu.utils.pgm import read_pgm


def test_h26_perfect_reconstruction():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 4096, size=(32, 64), dtype=np.int32)
    low, high = scalar.h26_forward(x)
    rec = scalar.h26_inverse(low, high)
    np.testing.assert_array_equal(rec, x)


def test_v26_perfect_reconstruction():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 4096, size=(64, 48), dtype=np.int32)
    low, high = scalar.v26_forward(x)
    rec = scalar.v26_inverse(low, high)
    np.testing.assert_array_equal(rec, x)


def test_v22_perfect_reconstruction():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 4096, size=(16, 24), dtype=np.int32)
    low, high = scalar.v22_forward(x)
    rec = scalar.v22_inverse(low, high)
    np.testing.assert_array_equal(rec, x)


def test_pyramid_lossless_without_quant():
    """3-level forward+inverse with quantization disabled (the demo's
    QUANTIZE_HIGHPASS=0 mode) and no prescale is perfectly lossless."""
    rng = np.random.default_rng(3)
    x = rng.integers(0, 4096, size=(64, 96), dtype=np.int32)
    prescale = [0] * 7
    co = scalar.forward_pyramid(x, 3, False, prescale)
    rec = scalar.inverse_pyramid(co, 3, False, prescale, dc_offset=0)
    np.testing.assert_array_equal(rec, x)


def test_companding_tables_roundtrip():
    from cineform_tpu.spec.quant import build_companding_tables

    fwd, inv = build_companding_tables()
    assert fwd.shape == (1025,) and inv.shape == (257,)
    assert fwd[0] == 0 and fwd[1024] == 256
    # code -> mag -> same code (inv picks the largest mag per code)
    for code in [0, 1, 5, 50, 128, 255]:
        assert fwd[inv[code]] == code
    # monotone non-decreasing
    assert np.all(np.diff(fwd[:1024]) >= 0)


def test_quantize_dequantize_sign_symmetry():
    v = np.array([-5000, -100, -1, 0, 1, 100, 5000], dtype=np.int32)
    q = 24
    c = scalar.quantize_band(v, q)
    assert np.array_equal(c, -scalar.quantize_band(-v, q) * 1)
    d = scalar.dequantize_band(c, q)
    assert np.all(np.sign(d) == np.sign(c))


@pytest.mark.slow
def test_waveletdemo_psnr_gate():
    """Full WaveletDemo model on testpatt.pgm hits the published ~54.386 dB."""
    from cineform_tpu.utils.glibc_random import glibc_rand_sequence

    img = read_pgm(TESTPATT)
    h, w = img.shape
    assert (w % 8, h % 8) == (0, 0)
    depth = 12
    noise = glibc_rand_sequence(w * h) & ((1 << (depth - 8)) - 1)
    deep = (img.astype(np.int64) << (depth - 8)) + noise.reshape(h, w)
    deep = deep.astype(np.int32)

    co = scalar.forward_pyramid(deep, levels=3, bitdepth=depth)
    rec = scalar.inverse_pyramid(co, levels=3, bitdepth=depth)
    got = psnr(rec, deep, depth)
    # README gate: PSNR = 54.386 (README.md:103-112). Allow small tolerance
    # for the rand() model; bit-exact stream tests come from the C oracle.
    assert abs(got - 54.386) < 0.2, f"PSNR {got}"
