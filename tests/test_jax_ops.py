"""Bit-exactness of JAX ops vs the NumPy scalar oracle."""

import numpy as np
import pytest

import tests.conftest  # noqa: F401  (forces CPU platform before jax import)
import jax
import jax.numpy as jnp

from cineform_tpu.ref import scalar
from cineform_tpu.ops import dwt, quant, pyramid
from cineform_tpu.spec.quant import build_companding_tables, demo_quant_tables


def _rand(shape, lo=-20000, hi=20000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=shape, dtype=np.int32)


@pytest.mark.parametrize("shape", [(8, 16), (34, 64), (135, 240), (540, 960)])
def test_h26_forward_matches_oracle(shape):
    x = _rand(shape)
    low_np, high_np = scalar.h26_forward(x)
    low_j, high_j = jax.jit(dwt.h26_forward)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(low_j), low_np)
    np.testing.assert_array_equal(np.asarray(high_j), high_np)


@pytest.mark.parametrize("shape", [(8, 16), (34, 64), (135, 240)])
def test_h26_inverse_matches_oracle(shape):
    low = _rand(shape, seed=1)
    high = _rand(shape, -5000, 5000, seed=2)
    rec_np = scalar.h26_inverse(low, high)
    rec_j = jax.jit(dwt.h26_inverse)(jnp.asarray(low), jnp.asarray(high))
    np.testing.assert_array_equal(np.asarray(rec_j), rec_np)


@pytest.mark.parametrize("shape", [(16, 24), (64, 48), (270, 480)])
def test_v26_matches_oracle(shape):
    x = _rand(shape, seed=3)
    low_np, high_np = scalar.v26_forward(x)
    low_j, high_j = jax.jit(dwt.v26_forward)(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(low_j), low_np)
    np.testing.assert_array_equal(np.asarray(high_j), high_np)
    rec_j = jax.jit(dwt.v26_inverse)(low_j, high_j)
    np.testing.assert_array_equal(np.asarray(rec_j), x)


def test_batched_dims():
    x = _rand((3, 2, 32, 64), seed=4)
    low_j, high_j = jax.jit(dwt.h26_forward)(jnp.asarray(x))
    for b in range(3):
        for c in range(2):
            low_np, high_np = scalar.h26_forward(x[b, c])
            np.testing.assert_array_equal(np.asarray(low_j[b, c]), low_np)
            np.testing.assert_array_equal(np.asarray(high_j[b, c]), high_np)


def test_compand_forward_exhaustive():
    fwd_table, inv_table = build_companding_tables()
    mags = jnp.arange(1025, dtype=jnp.int32)
    codes = np.asarray(jax.jit(quant.compand_forward)(mags))
    np.testing.assert_array_equal(codes, fwd_table)


def test_compand_inverse_exhaustive():
    _, inv_table = build_companding_tables()
    codes = jnp.arange(256, dtype=jnp.int32)
    mags = np.asarray(jax.jit(quant.compand_inverse)(codes))
    np.testing.assert_array_equal(mags, inv_table[:256])


@pytest.mark.parametrize("q", [1, 6, 12, 24, 48, 72, 255])
def test_quantize_matches_oracle(q):
    v = _rand((64, 64), -32768, 32768, seed=q)
    c_np = scalar.quantize_band(v, q)
    c_j = np.asarray(jax.jit(quant.quantize_band, static_argnums=1)(jnp.asarray(v), q))
    np.testing.assert_array_equal(c_j, c_np)
    d_np = scalar.dequantize_band(c_np, q)
    d_j = np.asarray(
        jax.jit(quant.dequantize_band, static_argnums=1)(jnp.asarray(c_j), q)
    )
    np.testing.assert_array_equal(d_j, d_np)


def test_full_pyramid_matches_oracle():
    """3-level fused pyramid == packed-layout scalar model, subband by subband."""
    depth = 12
    x = _rand((96, 160), 0, 4096, seed=7)
    qt, ps = demo_quant_tables(depth)

    fwd = jax.jit(pyramid.forward_intra, static_argnums=(1, 2, 3))
    pyr = fwd(jnp.asarray(x), 3, tuple(qt), tuple(ps))

    packed = scalar.forward_pyramid(x, 3, qt, ps, depth)
    h, w = x.shape
    # deepest lowpass
    np.testing.assert_array_equal(
        np.asarray(pyr.lowpass), packed[: h >> 3, : w >> 3]
    )
    # subbands at each level: pyr.highs[0] is deepest (level index 2)
    for i, (lh, hl, hh) in enumerate(pyr.highs):
        level = 2 - i
        rh, rw = h >> (level + 1), w >> (level + 1)
        np.testing.assert_array_equal(np.asarray(lh), packed[:rh, rw : 2 * rw])
        np.testing.assert_array_equal(np.asarray(hl), packed[rh : 2 * rh, :rw])
        np.testing.assert_array_equal(
            np.asarray(hh), packed[rh : 2 * rh, rw : 2 * rw]
        )

    inv = jax.jit(pyramid.inverse_intra, static_argnums=(1, 2, 3, 4))
    rec_j = np.asarray(inv(pyr, tuple(qt), tuple(ps), depth, 4))
    rec_np = scalar.inverse_pyramid(packed, 3, qt, ps, depth, dc_offset=4)
    np.testing.assert_array_equal(rec_j, rec_np)
