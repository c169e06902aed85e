"""Fused Pallas DWT kernels vs the NumPy oracle (interpreter mode on CPU).

Two formulations:

- `pallas_dwt.dwt2d_forward_pallas` (v1): DMAs its overlapping input row
  window from ANY memory.  Bit-exact in interpret mode, but this
  environment's Mosaic service rejects the manual DMA.
- `pallas_dwt2.dwt2d_forward_pallas2` (v2): halos as separate blocked
  inputs + even/odd columns pre-split by XLA (the lane-axis pair
  deinterleave was bisected as the other Mosaic crash).  Compiles AND
  runs bit-exactly on the real TPU.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cineform_tpu.ops.pallas_dwt import dwt2d_forward_pallas
from cineform_tpu.ops.pallas_dwt2 import dwt2d_forward_pallas2
from cineform_tpu.ref import intra as xf

CASES = [
    (64, 128, 0, (24, 24, 36)),
    (64, 128, 2, (6, 6, 3)),
    (270, 960, 0, (24, 24, 12)),
    (30, 128, 0, (1, 1, 1)),
]


@pytest.mark.parametrize("h,w,prescale,quant", CASES)
def test_pallas_forward_bit_exact(h, w, prescale, quant):
    rng = np.random.default_rng(h + w)
    x = rng.integers(0, 1021, (2, h, w)).astype(np.int32)
    ll, (lh, hl, hh) = dwt2d_forward_pallas(
        jnp.asarray(x), prescale, quant, interpret=True)
    for i in range(2):
        rll, rbs = xf.dwt2d_forward(x[i], prescale, quant)
        assert np.array_equal(np.asarray(ll[i]), rll)
        for got, want in zip((lh[i], hl[i], hh[i]), rbs):
            assert np.array_equal(np.asarray(got), want)


@pytest.mark.parametrize("h,w,prescale,quant", CASES)
@pytest.mark.parametrize("tile_out", [16, 64])
def test_pallas2_forward_bit_exact(h, w, prescale, quant, tile_out):
    rng = np.random.default_rng(3 * h + w)
    x = rng.integers(-1200, 1200, (2, h, w)).astype(np.int32)
    ll, (lh, hl, hh) = dwt2d_forward_pallas2(
        jnp.asarray(x), prescale, quant, tile_out=tile_out, interpret=True)
    for i in range(2):
        rll, rbs = xf.dwt2d_forward(x[i], prescale, quant)
        assert np.array_equal(np.asarray(ll[i]), rll)
        for got, want in zip((lh[i], hl[i], hh[i]), rbs):
            assert np.array_equal(np.asarray(got), want)
