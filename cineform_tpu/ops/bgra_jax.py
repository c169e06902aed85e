"""Device (JAX) port of the fused BGRA output kernel.

Bit-identical port of `cineform_tpu.ref.intra.strip_to_bgra` (the exact
model of `InvertHorizontalStripYUV16sToPackedRGB32`,
`Codec/spatial.c:29577`): the final-level horizontal 2-6 inverse fused
with the 8-bit CG 709 YUV->RGB conversion.  All int32 lane math on the
VPU with static shapes; the three regimes (saturating SSE region, plain
scalar mid region, border bracket) are computed everywhere and selected
with masks, which XLA fuses into a couple of elementwise kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _sat16(v):
    return jnp.clip(v, -32768, 32767)


def _subs_epu16(x, y):
    return jnp.maximum((x & 0xFFFF) - y, 0)


def _stream(low, high, post, descale):
    """Per-pair (even, odd) value stream with the three regimes.

    low/high: (..., h, n).  Returns (..., h, 2n) int32."""
    n = low.shape[-1]
    low = low.astype(jnp.int32)
    high = high.astype(jnp.int32)
    lm1, l0, lp1 = low[..., :-2], low[..., 1:-1], low[..., 2:]
    h0 = high[..., 1:-1]

    # SSE regime (saturating lanes, logical descale)
    e = _sat16(_sat16(_sat16(lm1 - lp1) + 4) >> 3)
    e = _sat16(e + l0)
    e_sse = _subs_epu16(_sat16(_sat16(e + 2048) + h0), 2048) >> 1
    o = _sat16(_sat16(_sat16(lp1 - lm1) + 4) >> 3)
    o = _sat16(o + l0)
    o_sse = _subs_epu16(_sat16(_sat16(o + 2048) - h0), 2048) >> 1
    e_sse = (e_sse & 0xFFFF) >> descale
    o_sse = (o_sse & 0xFFFF) >> descale

    # scalar regime (plain integer)
    e_scl = ((((lm1 - lp1 + 4) >> 3) + l0 + h0) >> 1) >> descale
    o_scl = ((((lp1 - lm1 + 4) >> 3) + l0 - h0) >> 1) >> descale

    j = jnp.arange(1, n - 1)
    use_sse = j < post
    ev = jnp.where(use_sse, e_sse, e_scl)
    od = jnp.where(use_sse, o_sse, o_scl)

    # borders
    be = ((((11 * low[..., 0] - 4 * low[..., 1] + low[..., 2] + 4) >> 3)
           + high[..., 0]) >> 1) >> descale
    bo = ((((5 * low[..., 0] + 4 * low[..., 1] - low[..., 2] + 4) >> 3)
           - high[..., 0]) >> 1) >> descale
    re = ((((5 * low[..., -1] + 4 * low[..., -2] - low[..., -3] + 4) >> 3)
           + high[..., -1]) >> 1) >> descale
    ro = ((((11 * low[..., -1] - 4 * low[..., -2] + low[..., -3] + 4) >> 3)
           - high[..., -1]) >> 1) >> descale

    s = jnp.zeros(low.shape[:-1] + (2 * n,), jnp.int32)
    s = s.at[..., 2:-2:2].set(ev)
    s = s.at[..., 3:-2:2].set(od)
    s = s.at[..., 0].set(be)
    s = s.at[..., 1].set(bo)
    s = s.at[..., -2].set(re)
    s = s.at[..., -1].set(ro)
    return s


@partial(jax.jit, static_argnames=("precision",))
def strip_to_bgra(y_low, y_high, u_low, u_high, v_low, v_high,
                  precision: int = 10):
    """Fused final-level inverse + YUV->RGB -> (h, 2*width, 4) uint8
    BGRA rows (not flipped).  Bit-identical to ref.intra.strip_to_bgra.
    """
    descale = precision - 8
    ymult, r_vmult, g_vmult, g_umult, b_umult = 19072, 230, 137, 55, 135

    width = y_low.shape[-1]
    last_column = width - 2
    post = width - (width % 16)
    while post > last_column - 2:
        post -= 16

    yv = _stream(y_low, y_high, post, descale)
    uv = _stream(u_low, u_high, post // 2, descale)
    vv = _stream(v_low, v_high, post // 2, descale)

    w_out = 2 * width
    px = jnp.arange(w_out)
    uu = uv[..., px // 2]
    vx = vv[..., px // 2]

    def as_i16(v):
        v = v & 0xFFFF
        return jnp.where(v >= 0x8000, v - 0x10000, v)

    y16, u16, v16 = as_i16(yv), as_i16(uu), as_i16(vx)
    lim = 0x7FFF - 0xFF
    yy = _subs_epu16(_sat16(_sat16(y16 - 16) + lim), lim)
    uc = _sat16(_subs_epu16(_sat16(u16 + lim), lim) - 128)
    vc = _sat16(_subs_epu16(_sat16(v16 + lim), lim) - 128)
    yy = as_i16(yy << 7)
    yy = ((yy * ymult) >> 16) << 1

    def mullo(a, c):
        return as_i16(a * c)

    r_sse = _sat16(_sat16(yy + (mullo(vc, r_vmult) >> 1)) + 32) >> 6
    g_sse = _sat16(_sat16(_sat16(yy - (mullo(vc, g_vmult) >> 2))
                          - (mullo(uc, g_umult) >> 2)) + 32) >> 6
    b_sse = _sat16(_sat16(yy + mullo(uc, b_umult)) + 32) >> 6

    ys = ((yv - 16) * ymult) >> 7
    us, vs = uu - 128, vx - 128
    r_scl = (ys + r_vmult * vs + 64) >> 7
    g_scl = (2 * ys - g_umult * us - g_vmult * vs + 128) >> 8
    b_scl = (ys + 2 * b_umult * us + 64) >> 7

    sse_px = px < 2 * post
    r = jnp.where(sse_px, r_sse, r_scl)
    g = jnp.where(sse_px, g_sse, g_scl)
    b = jnp.where(sse_px, b_sse, b_scl)

    out = jnp.stack([jnp.clip(b, 0, 255), jnp.clip(g, 0, 255),
                     jnp.clip(r, 0, 255),
                     jnp.full_like(r, 255)], axis=-1)
    return out.astype(jnp.uint8)
