"""TPU demosaic / RAW develop: the exact DemosaicRAW chain as one
jittable JAX program.

Device counterpart of `cineform_tpu.ref.demosaic` (the pinned byte-exact
model of `Codec/bayer.c:9339` + `DemoasicFrames.cpp`): the
ColorDifference2Bayer un-difference, the CF-enhanced 5x5 debayer with
its exact border bracket, the horizontal/vertical Advanced Detail
sharpening, and the 1D-LUT develop stage (Curve2Linear -> linear matrix
-> Linear2Curve).  All integer arithmetic in int32 lanes on the VPU, LUT
lookups as gathers, the develop matrix as a small dot — XLA fuses the
chain into a handful of kernels, and the program is batchable over
frames with vmap/pjit like the YUV codec's device path.

Bit-identical to the host model (tests/test_demosaic_jax.py).  int32 is
safe: the largest cell numerator is ~1.05e9 < 2^31.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _trunc_div(num, den):
    """C integer division (truncate toward zero), den > 0."""
    q = jnp.abs(num) // den
    return jnp.where(num < 0, -q, q)


def color_difference_to_bayer(G, RG, BG, GD):
    """ColorDifference2Bayer (SSE path, full rows; RED_GRN order)."""
    g14 = (G >> 2).astype(jnp.int32)
    rg14 = (RG >> 2).astype(jnp.int32)
    bg14 = (BG >> 2).astype(jnp.int32)

    def sat16(v):
        return jnp.clip(v, -32768, 32767)

    gd14 = sat16((GD >> 2).astype(jnp.int32) - 8192)
    protect = 0x7FFF - 0x3FFF

    def sse_limit(v):
        x = sat16(v + protect)
        xu = jnp.where(x < 0, x + 0x10000, x)
        return jnp.maximum(xu - protect, 0)

    r = sat16(sat16(sat16(rg14 - 8192) << 1) + g14)
    b = sat16(sat16(sat16(bg14 - 8192) << 1) + g14)
    g1 = sat16(g14 + gd14)
    g2 = sat16(g14 - gd14)

    r = sse_limit(r) << 2
    b = sse_limit(b) << 2
    g1 = sse_limit(g1) << 2
    g2 = sse_limit(g2) << 2

    h, w = G.shape
    out = jnp.zeros((2 * h, 2 * w), jnp.int32)
    out = out.at[0::2, 0::2].set(r)
    out = out.at[0::2, 1::2].set(g1)
    out = out.at[1::2, 0::2].set(g2)
    out = out.at[1::2, 1::2].set(b)
    return out


def _debayer(bayer):
    """The full debayer (interior 5x5 cells + the exact border bracket)
    -> (h, w, 3) int32 RGB."""
    h, w = bayer.shape
    b = bayer
    p = lambda dy, dx: jnp.roll(b, (-dy, -dx), axis=(0, 1))
    sat = lambda v: jnp.clip(v, 0, 65535)
    up, dn, lf, rt = p(-1, 0), p(1, 0), p(0, -1), p(0, 1)
    ul, ur, dl, dr = p(-1, -1), p(-1, 1), p(1, -1), p(1, 1)
    avg2 = lambda x, y: (x + y + 1) >> 1
    avg4 = lambda a_, b_, c_, d_: (a_ + b_ + c_ + d_ + 2) >> 2

    # ---- CF-enhanced 5x5 cells (interior) --------------------------------
    # REDCELL
    diffR = jnp.abs(p(0, -2) - p(0, 2)) >> 10
    diffG = jnp.abs(lf - rt) >> 10
    diffB = jnp.abs(ul - dr) >> 10
    fR = 2 + (2 * diffR * diffR) // (2 + diffG * diffG)
    fB = 4 + (4 * diffG * diffG) // (2 + diffB * diffB)
    red = (b & 0xFFFF,
           sat(_trunc_div(-p(-2, 0) + up * fR - p(0, -2) + lf * fR + b * 4
                          + rt * fR - p(0, 2) + dn * fR - p(2, 0), 4 * fR)),
           sat(_trunc_div(-3 * p(-2, 0) + ul * fB + ur * fB - 3 * p(0, -2)
                          + 12 * b - 3 * p(0, 2) + dl * fB + dr * fB
                          - 3 * p(2, 0), 4 * fB)))
    # GRNREDCELL
    diffR = jnp.abs(lf - rt) >> 10
    diffG = jnp.abs(p(0, -2) - p(0, 2)) >> 10
    diffB = jnp.abs(up - dn) >> 10
    fR = 8 + (4 * diffG * diffG) // (2 + diffR * diffR)
    fB = 8 + (4 * diffG * diffG) // (2 + diffB * diffB)
    grnred = (sat(_trunc_div(p(-2, 0) - 2 * ul - 2 * ur - 2 * p(0, -2)
                             + lf * fR + 10 * b + rt * fR - 2 * p(0, 2)
                             - 2 * dl - 2 * dr + p(2, 0), fR * 2)),
              b & 0xFFFF,
              sat(_trunc_div(-2 * p(-2, 0) - 2 * ul + up * fB - 2 * ur
                             + p(0, -2) + 10 * b + p(0, 2) - 2 * dl
                             + dn * fB - 2 * dr - 2 * p(2, 0), fB * 2)))
    # GRNBLUCELL
    diffR = jnp.abs(up - dn) >> 10
    diffG = jnp.abs(p(-2, 0) - p(2, 0)) >> 10
    diffB = jnp.abs(lf - rt) >> 10
    fR = 8 + (4 * diffG * diffG) // (2 + diffR * diffR)
    fB = 8 + (4 * diffG * diffG) // (2 + diffB * diffB)
    grnblu = (sat(_trunc_div(-2 * p(-2, 0) - 2 * ul + up * fR - 2 * ur
                             + p(0, -2) + 10 * b + p(0, 2) - 2 * dl
                             + dn * fR - 2 * dr - 2 * p(2, 0), fR * 2)),
              b & 0xFFFF,
              sat(_trunc_div(p(-2, 0) - 2 * ul - 2 * ur - 2 * p(0, -2)
                             + lf * fB + 10 * b + rt * fB - 2 * p(0, 2)
                             - 2 * dl - 2 * dr + p(2, 0), fB * 2)))
    # BLUCELL
    diffR = jnp.abs(ul - dr) >> 10
    diffG = jnp.abs(lf - rt) >> 10
    diffB = jnp.abs(p(0, -2) - p(0, 2)) >> 10
    fR = 4 + (4 * diffG * diffG) // (2 + diffR * diffR)
    fB = 2 + (2 * diffB * diffB) // (2 + diffG * diffG)
    blu = (sat(_trunc_div(-3 * p(-2, 0) + ul * fR + ur * fR - 3 * p(0, -2)
                          + 12 * b - 3 * p(0, 2) + dl * fR + dr * fR
                          - 3 * p(2, 0), fR * 4)),
           sat(_trunc_div(-p(-2, 0) + up * fB - p(0, -2) + lf * fB + b * 4
                          + rt * fB - p(0, 2) + dn * fB - p(2, 0), fB * 4)),
           b & 0xFFFF)

    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    even_row = (ys % 2) == 0
    even_col = (xs % 2) == 0

    def sel(e, o):
        return [jnp.where(even_col, ec, oc) for ec, oc in zip(e, o)]

    er = sel(red, grnred)
    od = sel(grnblu, blu)
    r = jnp.where(even_row, er[0], od[0])
    g = jnp.where(even_row, er[1], od[1])
    bl = jnp.where(even_row, er[2], od[2])

    # ---- generic 3x3 bracket (fallback rows + frame ring) ------------------
    # even row red sites / odd row blue sites use 4-averages; green sites
    # use the 2-averages — identical to the hq rows' x=1 / x=w-2 columns
    gr_e = sel((b, avg4(lf, rt, up, dn), avg4(ul, ur, dl, dr)),
               (avg2(lf, rt), b, avg2(up, dn)))
    gr_o = sel((avg2(up, dn), b, avg2(lf, rt)),
               (avg4(ul, ur, dl, dr), avg4(lf, rt, up, dn), b))
    br = jnp.where(even_row, gr_e[0], gr_o[0])
    bg = jnp.where(even_row, gr_e[1], gr_o[1])
    bb = jnp.where(even_row, gr_e[2], gr_o[2])

    # interior = where the 5x5 applies: even rows 2..h-4, odd rows 3..h-3,
    # cols 2..w-3
    in_row = jnp.where(even_row, (ys >= 2) & (ys < h - 2),
                       (ys >= 3) & (ys < h - 1))
    in_col = (xs >= 2) & (xs < w - 2)
    inside = in_row & in_col
    r = jnp.where(inside, r, br)
    g = jnp.where(inside, g, bg)
    bl = jnp.where(inside, bl, bb)

    # ---- explicit edges (wrap-unsafe positions) ----------------------------
    # column 0
    er_idx = slice(2, h - 1, 2)   # even rows >= 2
    orx = slice(1, h - 1, 2)      # odd rows < h-1
    r = r.at[er_idx, 0].set(b[er_idx, 0])
    g = g.at[er_idx, 0].set(avg2(b[1:h - 2:2, 0], b[3:h:2, 0]))
    bl = bl.at[er_idx, 0].set(avg2(b[1:h - 2:2, 1], b[3:h:2, 1]))
    r = r.at[orx, 0].set(avg2(b[0:h - 2:2, 0], b[2:h:2, 0]))
    g = g.at[orx, 0].set(b[orx, 0])
    bl = bl.at[orx, 0].set(b[orx, 1])
    # column w-1
    r = r.at[er_idx, w - 1].set(b[er_idx, w - 2])
    g = g.at[er_idx, w - 1].set(b[er_idx, w - 1])
    bl = bl.at[er_idx, w - 1].set(avg2(b[1:h - 2:2, w - 1], b[3:h:2, w - 1]))
    r = r.at[orx, w - 1].set(avg2(b[0:h - 2:2, w - 2], b[2:h:2, w - 2]))
    g = g.at[orx, w - 1].set(avg2(b[0:h - 2:2, w - 1], b[2:h:2, w - 1]))
    bl = bl.at[orx, w - 1].set(b[orx, w - 1])
    # row 0 (first-row bracket)
    xo = slice(1, w - 1, 2)
    xe = slice(2, w - 1, 2)
    r = r.at[0, xo].set(avg2(b[0, 0:w - 2:2], b[0, 2:w:2]))
    g = g.at[0, xo].set(b[0, xo])
    bl = bl.at[0, xo].set(b[1, xo])
    r = r.at[0, xe].set(b[0, xe])
    g = g.at[0, xe].set(avg2(b[0, 1:w - 2:2], b[0, 3:w:2]))
    bl = bl.at[0, xe].set(avg2(b[1, 1:w - 2:2], b[1, 3:w:2]))
    r = r.at[0, 0].set(b[0, 0])
    g = g.at[0, 0].set(avg2(b[0, 1], b[1, 0]))
    bl = bl.at[0, 0].set(b[1, 1])
    r = r.at[0, w - 1].set(b[0, w - 2])
    g = g.at[0, w - 1].set(b[0, w - 1])
    bl = bl.at[0, w - 1].set(b[1, w - 1])
    # row h-1 (last-row bracket)
    r = r.at[h - 1, xo].set(avg2(b[h - 2, 0:w - 2:2], b[h - 2, 2:w:2]))
    g = g.at[h - 1, xo].set(avg2(b[h - 1, 0:w - 2:2], b[h - 1, 2:w:2]))
    bl = bl.at[h - 1, xo].set(b[h - 1, xo])
    r = r.at[h - 1, xe].set(b[h - 2, xe])
    g = g.at[h - 1, xe].set(b[h - 1, xe])
    bl = bl.at[h - 1, xe].set(avg2(b[h - 1, 1:w - 2:2], b[h - 1, 3:w:2]))
    r = r.at[h - 1, 0].set(b[h - 2, 0])
    g = g.at[h - 1, 0].set(b[h - 1, 0])
    bl = bl.at[h - 1, 0].set(b[h - 1, 1])
    r = r.at[h - 1, w - 1].set(b[h - 2, w - 2])
    g = g.at[h - 1, w - 1].set(b[h - 1, w - 2])
    bl = bl.at[h - 1, w - 1].set(b[h - 1, w - 1])

    return jnp.stack([r, g, bl], axis=-1)


@partial(jax.jit, static_argnames=("sharpening",))
def demosaic_develop(G, RG, BG, GD, c2l, l2c, lcm, sharpening: int = 1):
    """Full RAW decode pipeline on the device: un-difference, debayer,
    H+V Advanced Detail sharpening, then the integer 1D-LUT develop
    (Curve2Linear -> 3x4 matrix -> Linear2Curve) -> uint16 RGB rows.

    c2l: (49152,) int32; l2c: (65536,) int32; lcm: (3, 4) int32.
    """
    bayer = color_difference_to_bayer(G.astype(jnp.int32),
                                      RG.astype(jnp.int32),
                                      BG.astype(jnp.int32),
                                      GD.astype(jnp.int32))
    h, w = bayer.shape
    rgb = _debayer(bayer)

    # horizontal sharpen (-1, B, C, B, -1) >> shift, 1-2-1 blur at 1/w-2
    shift, Bc, Cc = {1: (4, 4, 10), 2: (3, 2, 6), 3: (2, 1, 4)}[sharpening]
    rl = lambda dx: jnp.roll(rgb, -dx, axis=1)
    sharp = jnp.clip((-rl(-2) + Bc * rl(-1) + Cc * rgb + Bc * rl(1)
                      - rl(2)) >> shift, 0, 65535)
    blur = (rl(-1) + 2 * rgb + rl(1)) >> 2
    col = jnp.arange(w)[None, :, None]
    rgb = jnp.where((col >= 2) & (col < w - 2), sharp,
                    jnp.where((col == 1) | (col == w - 2), blur, rgb))

    # vertical sharpen: per output row t of pair y=t//2, the tap rows are
    # A=t-2, B=t-1 (clamped to t in the first pair), D=t+1, E=t+2
    # (clamped to t in the last pair) — DemosaicRAW job3's pointer walk
    prescale = 4 if sharpening in (1, 2) else 3
    preshift = 1 if sharpening == 1 else 0
    Bv, Cv = Bc >> preshift, Cc >> preshift
    shiftsse2 = shift - prescale - preshift

    t = jnp.arange(h)
    pair = t // 2
    first_pair = pair == 0
    last_pair = pair == (h // 2 - 1)
    A = jnp.where(first_pair, t, t - 2)
    B = jnp.where(first_pair, t, t - 1)
    D = jnp.where(last_pair, t, t + 1)
    E = jnp.where(last_pair, t, t + 2)

    av = rgb[A] >> prescale
    bv = rgb[B] >> prescale
    cv = rgb >> prescale
    dv = rgb[D] >> prescale
    ev = rgb[E] >> prescale
    if preshift:
        av = av >> preshift
        ev = ev >> preshift
    mix = (cv * Cv) & 0xFFFF
    mix = jnp.maximum(mix - av, 0)
    mix = jnp.maximum(mix - ev, 0)
    mix = jnp.minimum(mix + ((bv * Bv) & 0xFFFF), 0xFFFF)
    mix = jnp.minimum(mix + ((dv * Bv) & 0xFFFF), 0xFFFF)
    mix = jnp.maximum(jnp.minimum(mix + 0x8000, 0xFFFF) - 0x8000, 0)
    if shiftsse2 < 0:
        out16 = (mix << (-shiftsse2)) & 0xFFFF
    else:
        out16 = mix >> shiftsse2

    # develop: Curve2Linear -> matrix -> Linear2Curve
    v13 = out16 >> 3
    lin = jnp.take(c2l, v13 + 16384)
    n = jnp.einsum("ij,hwj->hwi", lcm[:, :3], lin,
                   preferred_element_type=jnp.int32) >> 13
    n = jnp.clip(n + lcm[:, 3][None, None, :], -16384, 49151)
    out13 = jnp.take(l2c, n + 16384)
    return jnp.clip(out13 << 3, 0, 65535).astype(jnp.uint16)


def develop_tables(matrix=None, curve_base: float = 90.0):
    """Host-side LUT/matrix preparation for demosaic_develop (the tables
    are tiny and built once per decoder, like the reference's
    Build1DCurves2Linear / Build1DLinear2Curves)."""
    from cineform_tpu.ref import demosaic as dm

    c2l = jnp.asarray(dm.curve2linear_lut(curve_base), jnp.int32)
    l2c = jnp.asarray(dm.linear2curve_lut(curve_base), jnp.int32)
    m = np.eye(3, 4) if matrix is None else np.asarray(matrix, np.float64)
    lcm = jnp.asarray(np.trunc(m * 8192.0), jnp.int32)
    return c2l, l2c, lcm
