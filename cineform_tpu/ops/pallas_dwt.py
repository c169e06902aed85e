"""Fused Pallas TPU kernel for one forward 2D 2-6 DWT level + quantization.

The XLA path (ops/intra_transform.py) materializes the horizontal low/high
planes and several temporaries in HBM; this kernel computes all four
quantized bands in VMEM from one read of the input tile, writing only the
band outputs — the TPU equivalent of the reference's fused
`FilterSpatialQuant16s` strip kernels (`Codec/spatial.c:9425`).

Grid: (batch, row-tiles).  Each program DMAs its input row window (with a
4-row halo for the vertical 6-tap borders) from HBM into VMEM scratch,
computes the horizontal then vertical filters, quantizes, and writes one
row-tile of each band.  Bit-exact vs the NumPy oracle (ref/intra.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROUNDING = 4


def _sat16(x):
    return jnp.clip(x, -32768, 32767)


def _quant_const(q: int):
    mult = (1 << 16) // q
    mid = q // 2
    if mid:
        mid -= 1
    return mult, mid


def _quantize(v, q: int):
    if q <= 1:
        return v
    mult, mid = _quant_const(q)
    mag = (((jnp.abs(v) + mid) & 0xFFFF) * mult) >> 16
    return jnp.sign(v) * mag


def _h26(x, prescale: int):
    """Horizontal 2-6 on (..., rows, W): returns (low, high) (..., rows, W/2)."""
    shp = x.shape[:-1] + (x.shape[-1] // 2, 2)
    pairs = x.reshape(shp)
    even = jnp.squeeze(pairs[..., 0:1], -1)
    odd = jnp.squeeze(pairs[..., 1:2], -1)
    return _h26_pairs(even, odd, prescale)


def _h26_pairs(even, odd, prescale: int):
    """Horizontal 2-6 from pre-deinterleaved even/odd columns.

    The lane-axis pair reshape in `_h26` is rejected by this environment's
    Mosaic compiler, so device kernels take the columns already split
    (a cheap strided slice in the XLA wrapper) and use only lane-local
    shifted slices here.
    """
    if prescale:
        r = (1 << prescale) - 1
        pe = (even + r) >> prescale
        po = (odd + r) >> prescale
        low = (even + odd + r) >> prescale
    else:
        pe, po = even, odd
        low = even + odd
    plow = pe + po
    diff = pe - po
    interior = ((-plow[..., :-2] + plow[..., 2:] + ROUNDING) >> 3) + diff[..., 1:-1]
    first = (5 * pe[..., :1] - 11 * po[..., :1] + 4 * pe[..., 1:2]
             + 4 * po[..., 1:2] - pe[..., 2:3] - po[..., 2:3] + ROUNDING) >> 3
    last = (11 * pe[..., -1:] - 5 * po[..., -1:] - 4 * po[..., -2:-1]
            - 4 * pe[..., -2:-1] + po[..., -3:-2] + pe[..., -3:-2] + ROUNDING) >> 3
    high = jnp.concatenate([first, interior, last], axis=-1)
    return _sat16(low), _sat16(high)


def _make_kernel(tile_out: int, halo_rows: int, n_tiles: int, h_out_true: int,
                 prescale: int, quant: tuple, win_rows: int):
    """Kernel DMAs its overlapping (win_rows, W) input window from HBM."""

    def kernel(x_hbm, ll_ref, lh_ref, hl_ref, hh_ref, xwin, sem):
        i = pl.program_id(0)
        t = pl.program_id(1)
        start = t * (2 * tile_out)   # into the halo-padded input
        copy = pltpu.make_async_copy(
            x_hbm.at[i, pl.ds(start, win_rows), :], xwin, sem)
        copy.start()
        copy.wait()
        x = xwin[...].astype(jnp.int32)
        low, high = _h26(x, prescale)          # (rows, W/2)

        def vertical(src):
            """2-6 vertical over the window; returns (tile_out, W/2) each.

            Row pairs are extracted with contiguous reshape+slice (Mosaic
            has no strided sublane slice).  Window row of input row g is
            g - tile_start + halo; output row k uses input rows
            2k+halo-4 .. 2k+halo+3 of the window.
            """
            base = halo_rows
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
            up = evenp + oddp
            dn = evend + oddd
            interior = ((-up + dn + ROUNDING) >> 3) + (even - odd)

            # image-border variants, computed vectorized for every row and
            # selected by true row index (the true last output row may sit
            # anywhere inside the padded last tile)
            first = (5 * src[base] - 11 * src[base + 1] + 4 * src[base + 2]
                     + 4 * src[base + 3] - src[base + 4] - src[base + 5]
                     + ROUNDING) >> 3
            last_all = (11 * even - 5 * odd - 4 * oddp - 4 * evenp
                        + oddpp + evenpp + ROUNDING) >> 3

            row_ids = (jax.lax.broadcasted_iota(jnp.int32, interior.shape, 0)
                       + t * tile_out)
            vhigh = interior
            vhigh = jnp.where(row_ids == 0, first[None, :], vhigh)
            vhigh = jnp.where(row_ids == h_out_true - 1, last_all, vhigh)
            return _sat16(vlow), _sat16(vhigh)

        ll, hl = vertical(low)
        lh, hh = vertical(high)
        ll_ref[0] = ll.astype(jnp.int32)
        lh_ref[0] = _quantize(lh, quant[0]).astype(jnp.int32)
        hl_ref[0] = _quantize(hl, quant[1]).astype(jnp.int32)
        hh_ref[0] = _quantize(hh, quant[2]).astype(jnp.int32)

    return kernel


@partial(jax.jit, static_argnames=("prescale", "quant", "tile_out", "interpret"))
def dwt2d_forward_pallas(x: jnp.ndarray, prescale: int = 0,
                         quant: tuple | None = None, tile_out: int = 8,
                         interpret: bool = False):
    """Fused forward level: x (B, H, W) int32 -> (ll, (lh, hl, hh)).

    Bit-exact vs ref/intra.dwt2d_forward for in-range video data.  Falls
    back to requiring H/2 % tile_out == 0 (pad upstream if needed).
    """
    b, h, w = x.shape
    h_out, w_out = h // 2, w // 2
    if quant is None:
        quant = (1, 1, 1)
    n_tiles = -(-h_out // tile_out)
    h_pad = n_tiles * tile_out
    halo = 4  # two input row pairs above/below

    # pad rows with edge copies so every window is in range; image-border
    # formulas are selected inside the kernel by true row index, so pad
    # values only feed taps that get masked away or interior halos.
    pad_bottom = (h_pad - h_out) * 2 + halo
    xp = jnp.pad(x, ((0, 0), (halo, pad_bottom), (0, 0)), mode="edge")
    win_rows = 2 * tile_out + 2 * halo

    kernel = _make_kernel(tile_out, halo, n_tiles, h_out, prescale, quant,
                          win_rows)
    out_shape = [jax.ShapeDtypeStruct((b, h_pad, w_out), jnp.int32)] * 4
    band_spec = pl.BlockSpec((1, tile_out, w_out),
                             lambda i, t: (i, t, 0),
                             memory_space=pltpu.VMEM)
    ll, lh, hl, hh = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[band_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((win_rows, w), x.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(xp)
    if h_pad != h_out:
        ll, lh, hl, hh = (a[:, :h_out] for a in (ll, lh, hl, hh))
    return ll, (lh, hl, hh)
