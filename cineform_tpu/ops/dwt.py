"""Batched 2-6 wavelet transforms as JAX ops (bit-exact vs ref/scalar.py).

Design notes (TPU-first):
- All ops are int32 elementwise adds/shifts on the VPU; there is no matmul,
  so the work is HBM-bandwidth-bound.  Ops take arbitrary leading batch dims
  (frames, channels) and vectorize trivially — XLA fuses the shifted-slice
  arithmetic into a handful of fused loops.
- Horizontal filters deinterleave via reshape (..., W/2, 2) rather than
  stride-2 lane slicing; vertical filters are sublane shifts.
- Shifts use jnp's arithmetic right shift on signed ints, matching C.

Behavioral contract: `Example/WaveletDemo/utils.c:251-401` (the production
SSE2 kernels in `Codec/spatial.c` implement the same math).
"""

from __future__ import annotations

import jax.numpy as jnp

from cineform_tpu.spec.wavelet import ROUNDING

_R = ROUNDING


def _split_even_odd_last(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(..., W) -> even, odd each (..., W/2) via reshape-deinterleave."""
    shp = x.shape[:-1] + (x.shape[-1] // 2, 2)
    pairs = x.reshape(shp)
    return pairs[..., 0], pairs[..., 1]


def _interleave_last(even: jnp.ndarray, odd: jnp.ndarray) -> jnp.ndarray:
    out = jnp.stack([even, odd], axis=-1)
    return out.reshape(even.shape[:-1] + (even.shape[-1] * 2,))


def h26_forward(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward 2-6 DWT along the last axis. x: (..., W) int32, W even >= 6.

    Returns (low, high), each (..., W/2).
    """
    even, odd = _split_even_odd_last(x)
    low = even + odd
    diff = even - odd
    # interior: ((-low[k-1] + low[k+1] + 4) >> 3) + diff[k]
    interior = ((-low[..., :-2] + low[..., 2:] + _R) >> 3) + diff[..., 1:-1]
    first = (
        5 * even[..., 0] - 11 * odd[..., 0]
        + 4 * even[..., 1] + 4 * odd[..., 1]
        - even[..., 2] - odd[..., 2] + _R
    ) >> 3
    last = (
        11 * even[..., -1] - 5 * odd[..., -1]
        - 4 * odd[..., -2] - 4 * even[..., -2]
        + odd[..., -3] + even[..., -3] + _R
    ) >> 3
    high = jnp.concatenate(
        [first[..., None], interior, last[..., None]], axis=-1
    )
    return low, high


def h26_inverse(low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2-6 DWT along the last axis. Returns (..., 2*half)."""
    te = (low[..., :-2] - low[..., 2:] + _R) >> 3
    to = (-low[..., :-2] + low[..., 2:] + _R) >> 3
    even_i = (te + low[..., 1:-1] + high[..., 1:-1]) >> 1
    odd_i = (to + low[..., 1:-1] - high[..., 1:-1]) >> 1
    t0e = (11 * low[..., 0] - 4 * low[..., 1] + low[..., 2] + _R) >> 3
    t0o = (5 * low[..., 0] + 4 * low[..., 1] - low[..., 2] + _R) >> 3
    even_f = (t0e + high[..., 0]) >> 1
    odd_f = (t0o - high[..., 0]) >> 1
    tke = (5 * low[..., -1] + 4 * low[..., -2] - low[..., -3] + _R) >> 3
    tko = (11 * low[..., -1] - 4 * low[..., -2] + low[..., -3] + _R) >> 3
    even_l = (tke + high[..., -1]) >> 1
    odd_l = (tko - high[..., -1]) >> 1
    even = jnp.concatenate([even_f[..., None], even_i, even_l[..., None]], -1)
    odd = jnp.concatenate([odd_f[..., None], odd_i, odd_l[..., None]], -1)
    return _interleave_last(even, odd)


def _swap_last_two(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.swapaxes(x, -1, -2)


def v26_forward(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward 2-6 DWT along the second-to-last axis (rows)."""
    even, odd = x[..., 0::2, :], x[..., 1::2, :]
    low = even + odd
    diff = even - odd
    interior = ((-low[..., :-2, :] + low[..., 2:, :] + _R) >> 3) + diff[..., 1:-1, :]
    first = (
        5 * even[..., 0:1, :] - 11 * odd[..., 0:1, :]
        + 4 * even[..., 1:2, :] + 4 * odd[..., 1:2, :]
        - even[..., 2:3, :] - odd[..., 2:3, :] + _R
    ) >> 3
    last = (
        11 * even[..., -1:, :] - 5 * odd[..., -1:, :]
        - 4 * odd[..., -2:-1, :] - 4 * even[..., -2:-1, :]
        + odd[..., -3:-2, :] + even[..., -3:-2, :] + _R
    ) >> 3
    high = jnp.concatenate([first, interior, last], axis=-2)
    return low, high


def v26_inverse(low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2-6 DWT along the second-to-last axis."""
    te = (low[..., :-2, :] - low[..., 2:, :] + _R) >> 3
    to = (-low[..., :-2, :] + low[..., 2:, :] + _R) >> 3
    even_i = (te + low[..., 1:-1, :] + high[..., 1:-1, :]) >> 1
    odd_i = (to + low[..., 1:-1, :] - high[..., 1:-1, :]) >> 1
    t0e = (11 * low[..., 0:1, :] - 4 * low[..., 1:2, :] + low[..., 2:3, :] + _R) >> 3
    t0o = (5 * low[..., 0:1, :] + 4 * low[..., 1:2, :] - low[..., 2:3, :] + _R) >> 3
    even_f = (t0e + high[..., 0:1, :]) >> 1
    odd_f = (t0o - high[..., 0:1, :]) >> 1
    tke = (
        5 * low[..., -1:, :] + 4 * low[..., -2:-1, :] - low[..., -3:-2, :] + _R
    ) >> 3
    tko = (
        11 * low[..., -1:, :] - 4 * low[..., -2:-1, :] + low[..., -3:-2, :] + _R
    ) >> 3
    even_l = (tke + high[..., -1:, :]) >> 1
    odd_l = (tko - high[..., -1:, :]) >> 1
    even = jnp.concatenate([even_f, even_i, even_l], axis=-2)
    odd = jnp.concatenate([odd_f, odd_i, odd_l], axis=-2)
    h2 = even.shape[-2] * 2
    out_shape = even.shape[:-2] + (h2,) + even.shape[-1:]
    out = jnp.stack([even, odd], axis=-2)  # (..., half, 2, W)
    return out.reshape(out_shape)


def v22_forward(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2-2 Haar along the second-to-last axis (temporal/interlaced,
    `Codec/temporal.c:71`)."""
    a, b = x[..., 0::2, :], x[..., 1::2, :]
    return a + b, a - b


def v22_inverse(low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
    a = (low + high) >> 1
    b = (low - high) >> 1
    out = jnp.stack([a, b], axis=-2)
    return out.reshape(a.shape[:-2] + (a.shape[-2] * 2,) + a.shape[-1:])


def t22_forward(f0: jnp.ndarray, f1: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2-2 Haar between two GOP frames (`Codec/temporal.c:71`)."""
    return f0 + f1, f0 - f1


def t22_inverse(low: jnp.ndarray, high: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    return (low + high) >> 1, (low - high) >> 1


def dwt2d_forward(x: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """One 2D level: horizontal then vertical (`wavelets.c:214-215`).

    Returns (LL, LH, HL, HH) where LH = horizontal-high/vertical-low,
    HL = horizontal-low/vertical-high, HH = both-high — matching the
    reference's quadrant naming (qh quantizes LH, qv HL, qd HH).
    """
    low, high = h26_forward(x)
    ll, hl = v26_forward(low)
    lh, hh = v26_forward(high)
    return ll, lh, hl, hh


def dwt2d_inverse(
    ll: jnp.ndarray, lh: jnp.ndarray, hl: jnp.ndarray, hh: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of one 2D level: vertical then horizontal."""
    low = v26_inverse(ll, hl)
    high = v26_inverse(lh, hh)
    return h26_inverse(low, high)
