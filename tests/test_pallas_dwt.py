"""Fused Pallas DWT kernel vs the NumPy oracle (interpreter mode on CPU).

The kernel is bit-exact in Pallas interpret mode; compiling through this
environment's remote Mosaic service currently fails with an internal
error, so the production pipeline keeps the XLA path until that is
resolved (tracked for the next round).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cineform_tpu.ops.pallas_dwt import dwt2d_forward_pallas
from cineform_tpu.ref import intra as xf


@pytest.mark.parametrize("h,w,prescale,quant", [
    (64, 128, 0, (24, 24, 36)),
    (64, 128, 2, (6, 6, 3)),
    (270, 960, 0, (24, 24, 12)),
    (30, 128, 0, (1, 1, 1)),
])
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
