"""Fused Pallas forward 2D DWT level, halo-as-input formulation.

Variant of ops/pallas_dwt.py shaped around two limitations of this
environment's Mosaic compiler (both found by bisection, see
tests/test_pallas_dwt.py):

- manual DMA from ANY memory crashes it -> the overlapping row halos are
  materialized host-side as small per-tile arrays (n_tiles x HALO x W,
  built by cheap XLA slices) and passed as ordinary non-overlapping
  blocked inputs;
- a lane-axis pair deinterleave (reshape (..., W/2, 2) + squeeze) crashes
  it -> the even/odd column split for the horizontal 2-6 filter is done
  outside the kernel by XLA strided slices, and the kernel consumes the
  two half-width planes with only lane-local shifted slices
  (`_h26_pairs`).

Fuses, per level: horizontal 2-6 (with prescale) -> vertical 2-6 with
image borders -> dead-zone quantization of the three highpass bands, all
in VMEM — the TPU analog of the reference's `FilterSpatialQuant16s`
(Codec/spatial.c:9425).  Bit-exact vs the NumPy oracle (ref/intra.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cineform_tpu.ops.pallas_dwt import _h26_pairs, _quantize, _sat16, ROUNDING

HALO = 8  # rows of context on each side (>= 4 needed; 8 is tiling-legal)


def _make_kernel(tile_out: int, h_out_true: int, prescale: int, quant: tuple):
    def kernel(be_ref, bo_ref, te_ref, to_ref, ge_ref, go_ref,
               ll_ref, lh_ref, hl_ref, hh_ref):
        t = pl.program_id(1)
        xe = jnp.concatenate([te_ref[0, 0], be_ref[0, 0], ge_ref[0, 0]],
                             axis=0).astype(jnp.int32)
        xo = jnp.concatenate([to_ref[0, 0], bo_ref[0, 0], go_ref[0, 0]],
                             axis=0).astype(jnp.int32)
        low, high = _h26_pairs(xe, xo, prescale)

        def vertical(src):
            base = HALO
            wcols = src.shape[-1]

            def rowpair(off):
                seg = jax.lax.slice_in_dim(src, off, off + 2 * tile_out, axis=0)
                seg = seg.reshape(tile_out, 2, wcols)
                return (jnp.squeeze(jax.lax.slice_in_dim(seg, 0, 1, axis=1), 1),
                        jnp.squeeze(jax.lax.slice_in_dim(seg, 1, 2, axis=1), 1))

            even, odd = rowpair(base)
            evenp, oddp = rowpair(base - 2)
            evenpp, oddpp = rowpair(base - 4)
            evend, oddd = rowpair(base + 2)
            vlow = even + odd
            interior = ((-(evenp + oddp) + (evend + oddd) + ROUNDING) >> 3) \
                + (even - odd)
            first = (5 * src[base] - 11 * src[base + 1] + 4 * src[base + 2]
                     + 4 * src[base + 3] - src[base + 4] - src[base + 5]
                     + ROUNDING) >> 3
            last_all = (11 * even - 5 * odd - 4 * oddp - 4 * evenp
                        + oddpp + evenpp + ROUNDING) >> 3
            row_ids = (jax.lax.broadcasted_iota(jnp.int32, interior.shape, 0)
                       + t * tile_out)
            vhigh = jnp.where(row_ids == 0, first[None, :], interior)
            vhigh = jnp.where(row_ids == h_out_true - 1, last_all, vhigh)
            return _sat16(vlow), _sat16(vhigh)

        ll, hl = vertical(low)
        lh, hh = vertical(high)
        ll_ref[0] = ll.astype(jnp.int32)
        lh_ref[0] = _quantize(lh, quant[0]).astype(jnp.int32)
        hl_ref[0] = _quantize(hl, quant[1]).astype(jnp.int32)
        hh_ref[0] = _quantize(hh, quant[2]).astype(jnp.int32)

    return kernel


def _windows(xp: jnp.ndarray, n_tiles: int, tile_out: int):
    """Split a halo-padded (B, Hp, Wc) plane into per-tile body/top/bot."""
    b, _, wc = xp.shape
    h_pad = n_tiles * tile_out
    body = xp[:, HALO:HALO + 2 * h_pad].reshape(b, n_tiles, 2 * tile_out, wc)
    top = jnp.stack([jax.lax.dynamic_slice_in_dim(xp, s, HALO, axis=1)
                     for s in range(0, 2 * h_pad, 2 * tile_out)], axis=1)
    bot = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(xp, s + HALO + 2 * tile_out, HALO, axis=1)
         for s in range(0, 2 * h_pad, 2 * tile_out)], axis=1)
    return body, top, bot


@partial(jax.jit, static_argnames=("prescale", "quant", "tile_out", "interpret"))
def dwt2d_forward_pallas2(x: jnp.ndarray, prescale: int = 0,
                          quant: tuple | None = None, tile_out: int = 64,
                          interpret: bool = False):
    """x (B, H, W) int32 -> (ll, (lh, hl, hh)); bit-exact vs the oracle."""
    b, h, w = x.shape
    h_out, w_out = h // 2, w // 2
    if quant is None:
        quant = (1, 1, 1)
    n_tiles = -(-h_out // tile_out)
    h_pad = n_tiles * tile_out
    pad_bottom = (h_pad - h_out) * 2 + HALO
    xp = jnp.pad(x, ((0, 0), (HALO, pad_bottom), (0, 0)), mode="edge")

    body_e, top_e, bot_e = _windows(xp[..., 0::2], n_tiles, tile_out)
    body_o, top_o, bot_o = _windows(xp[..., 1::2], n_tiles, tile_out)

    kernel = _make_kernel(tile_out, h_out, prescale, quant)
    out_shape = [jax.ShapeDtypeStruct((b, h_pad, w_out), jnp.int32)] * 4
    band_spec = pl.BlockSpec((1, tile_out, w_out), lambda i, t: (i, t, 0),
                             memory_space=pltpu.VMEM)
    body_spec = pl.BlockSpec((1, 1, 2 * tile_out, w_out),
                             lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((1, 1, HALO, w_out), lambda i, t: (i, t, 0, 0),
                             memory_space=pltpu.VMEM)
    ll, lh, hl, hh = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[body_spec, body_spec, halo_spec, halo_spec, halo_spec,
                  halo_spec],
        out_specs=[band_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(body_e, body_o, top_e, top_o, bot_e, bot_o)
    if h_pad != h_out:
        ll, lh, hl, hh = (a[:, :h_out] for a in (ll, lh, hl, hh))
    return ll, (lh, hl, hh)
