"""Exact model of the reference Bayer demosaic / RAW develop chain.

Mirrors the full-resolution RAW decode pipeline (`DemosaicRAW`,
`Codec/bayer.c:9339`) driven when a Bayer-encoded sample is decoded to an
RGB output format:

- ``color_difference_to_bayer``  <- ColorDifference2Bayer
      (Codec/DemoasicFrames.cpp:4653): SSE 14-bit un-difference of the
      (G, RG, BG, GD) Row16u channel rows into two bayer mosaic rows.
      The SSE path quantizes through >>2 / <<2 with saturating adds; the
      scalar tail (width % 8) keeps full 16-bit math.
- ``debayer_line``  <- DebayerLine -> DoDEBAYER_ORDER_RED_GRN
      (DemoasicFrames.cpp:2916): the CF-enhanced 5x5 demosaic
      (REDCELL/GRNREDCELL/GRNBLUCELL/BLUCELL, DemoasicFrames.cpp:154-345)
      for interior rows, 3x3 averages on the borders, then the in-place
      horizontal blur/sharpen (FastSharpeningBlurHinplace).
- ``fast_sharpening_blur_v``  <- FastSharpeningBlurV (bayer.c:9238):
      the SSE unsigned-saturating 5-tap vertical sharpen.
- ``generate_byr2_components`` <- GenerateBYR2 (bayer.c:13237): the
      full-16-bit scalar un-difference used for BYR4/BYR2 output, with
      the BYR4LinearRestore curve (decoder.c:10714-10790).
- ``log2lin_lut``  <- BYR4LinearRestore table build: log-curve inverse
      (CURVE_LOG2LIN, Common/AVIExtendedHeader.h:148).

All stages are pinned byte-exact against the reference binary decoding
the same sample (tests/test_bayer_decode.py).
"""

from __future__ import annotations

import numpy as np


def _sat16u(v: np.ndarray) -> np.ndarray:
    return np.clip(v, 0, 65535)


def _trunc_div(num: np.ndarray, den: np.ndarray) -> np.ndarray:
    """C integer division: truncation toward zero (numerators can be
    negative; denominators are positive)."""
    q = np.abs(num) // den
    return np.where(num < 0, -q, q)


def log2lin_lut(curve_base: float = 90.0) -> np.ndarray:
    """BYR4LinearRestore: 16384-entry log-to-linear LUT
    (decoder.c:10742-10785 with CURVE_LOG2LIN's float truncation)."""
    j = np.arange(16384, dtype=np.float64)
    i32 = (j.astype(np.float32) / np.float32(16384.0)).astype(np.float64)
    lin = (np.power(curve_base, i32) - 1.0) / (curve_base - 1.0)
    val = (lin.astype(np.float32) * np.float32(65535.0)).astype(np.float32)
    return np.clip(np.trunc(val).astype(np.int64), 0, 65535).astype(np.uint16)


def generate_byr2_components(G, RG, BG, GD, lut=None):
    """GenerateBYR2's scalar un-difference -> (r, g1, g2, b) planes.

    With ``lut`` (BYR4LinearRestore) each value maps through
    ``lut[v >> 2]``; without, the low bit is masked (``& 0xfffe``)."""
    g = G.astype(np.int64)
    gd = GD.astype(np.int64) - 32768
    r = np.clip(((RG.astype(np.int64) - 32768) << 1) + g, 0, 0xFFFF)
    b = np.clip(((BG.astype(np.int64) - 32768) << 1) + g, 0, 0xFFFF)
    g1 = np.clip(g + gd, 0, 0xFFFF)
    g2 = np.clip(g - gd, 0, 0xFFFF)
    if lut is not None:
        return (lut[r >> 2].astype(np.int64), lut[g1 >> 2].astype(np.int64),
                lut[g2 >> 2].astype(np.int64), lut[b >> 2].astype(np.int64))
    return r & 0xFFFE, g1 & 0xFFFE, g2 & 0xFFFE, b & 0xFFFE


def color_difference_to_bayer(G, RG, BG, GD, bayer_format: int = 0):
    """ColorDifference2Bayer over all rows -> (2h, 2w) bayer mosaic.

    SSE path for the first width & ~7 columns: all four channels are
    quantized to 14 bits (>>2), mixed with saturating int16 adds, zero
    clamped via the +0x4000 adds/subs_epu16 trick, and restored with <<2;
    the scalar tail keeps the full 16-bit math of GenerateBYR2.
    bayer_format 0 = BAYER_FORMAT_RED_GRN: line A = [r g1 ...],
    line B = [g2 b ...].
    """
    h, w = G.shape
    sse_w = w & ~7

    def sat16(v):
        return np.clip(v, -32768, 32767)

    g14 = (G.astype(np.int64) >> 2)
    rg14 = (RG.astype(np.int64) >> 2)
    bg14 = (BG.astype(np.int64) >> 2)
    gd14 = sat16((GD.astype(np.int64) >> 2) - 8192)

    protect = 0x7FFF - 0x3FFF

    def clamp14(v):
        # adds_epi16(+protect) then subs_epu16(protect): clamp [0, 16383]
        x = sat16(v + protect)
        return np.maximum(x, protect) - protect  # subs_epu16 needs x>=0

    r = sat16(sat16((sat16(rg14 - 8192)) << 1) + g14)
    b = sat16(sat16((sat16(bg14 - 8192)) << 1) + g14)
    g1 = sat16(g14 + gd14)
    g2 = sat16(g14 - gd14)

    # subs_epu16 semantics on the int16 lane: reinterpret as uint16
    def subs_epu16(x, y):
        xu = np.asarray(x) & 0xFFFF
        return np.maximum(xu - y, 0)

    def sse_limit(v):
        x = sat16(v + protect)
        return subs_epu16(x, protect)

    r = (sse_limit(r) << 2) & 0xFFFF
    b = (sse_limit(b) << 2) & 0xFFFF
    g1 = (sse_limit(g1) << 2) & 0xFFFF
    g2 = (sse_limit(g2) << 2) & 0xFFFF

    # scalar tail: full 16-bit math
    if sse_w < w:
        rs, g1s, g2s, bs = generate_byr2_components(
            G[:, sse_w:], RG[:, sse_w:], BG[:, sse_w:], GD[:, sse_w:])
        # the scalar path does not mask the low bit here
        g = G[:, sse_w:].astype(np.int64)
        gd = GD[:, sse_w:].astype(np.int64) - 32768
        rs = np.clip(((RG[:, sse_w:].astype(np.int64) - 32768) << 1) + g,
                     0, 0xFFFF)
        bs = np.clip(((BG[:, sse_w:].astype(np.int64) - 32768) << 1) + g,
                     0, 0xFFFF)
        g1s = np.clip(g + gd, 0, 0xFFFF)
        g2s = np.clip(g - gd, 0, 0xFFFF)
        r[:, sse_w:] = rs
        b[:, sse_w:] = bs
        g1[:, sse_w:] = g1s
        g2[:, sse_w:] = g2s

    out = np.zeros((2 * h, 2 * w), dtype=np.int64)
    if bayer_format == 0:        # RED_GRN
        out[0::2, 0::2] = r
        out[0::2, 1::2] = g1
        out[1::2, 0::2] = g2
        out[1::2, 1::2] = b
    elif bayer_format == 1:      # GRN_RED
        out[0::2, 0::2] = g1
        out[0::2, 1::2] = r
        out[1::2, 0::2] = b
        out[1::2, 1::2] = g2
    elif bayer_format == 2:      # GRN_BLU
        out[0::2, 0::2] = g1
        out[0::2, 1::2] = b
        out[1::2, 0::2] = r
        out[1::2, 1::2] = g2
    else:                        # BLU_GRN
        out[0::2, 0::2] = b
        out[0::2, 1::2] = g1
        out[1::2, 0::2] = g2
        out[1::2, 1::2] = r
    return out


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg4(a, b, c, d):
    return (a + b + c + d + 2) >> 2


def _red_cell(p, width):
    """REDCELL (DemoasicFrames.cpp:154): CF-enhanced 5x5 at a red site.

    ``p(dy, dx)`` returns the neighbor plane slice."""
    diffR = np.abs(p(0, -2) - p(0, 2)) >> 10
    diffG = np.abs(p(0, -1) - p(0, 1)) >> 10
    diffB = np.abs(p(-1, -1) - p(1, 1)) >> 10
    factorR = 2 + (2 * diffR * diffR) // (2 + diffG * diffG)
    factorB = 4 + (4 * diffG * diffG) // (2 + diffB * diffB)
    r = p(0, 0)
    gnum = (-p(-2, 0) + p(-1, 0) * factorR
            - p(0, -2) + p(0, -1) * factorR + p(0, 0) * 4
            + p(0, 1) * factorR - p(0, 2)
            + p(1, 0) * factorR - p(2, 0))
    g = _trunc_div(gnum, 4 * factorR)
    bnum = (-3 * p(-2, 0) + p(-1, -1) * factorB + p(-1, 1) * factorB
            - 3 * p(0, -2) + 12 * p(0, 0) - 3 * p(0, 2)
            + p(1, -1) * factorB + p(1, 1) * factorB - 3 * p(2, 0))
    b = _trunc_div(bnum, 4 * factorB)
    return r & 0xFFFF, _sat16u(g), _sat16u(b)


def _grn_red_cell(p, width):
    """GRNREDCELL: green site on a red row."""
    diffR = np.abs(p(0, -1) - p(0, 1)) >> 10
    diffG = np.abs(p(0, -2) - p(0, 2)) >> 10
    diffB = np.abs(p(-1, 0) - p(1, 0)) >> 10
    factorR = 8 + (4 * diffG * diffG) // (2 + diffR * diffR)
    factorB = 8 + (4 * diffG * diffG) // (2 + diffB * diffB)
    rnum = (p(-2, 0) - 2 * p(-1, -1) - 2 * p(-1, 1)
            - 2 * p(0, -2) + p(0, -1) * factorR + 10 * p(0, 0)
            + p(0, 1) * factorR - 2 * p(0, 2)
            - 2 * p(1, -1) - 2 * p(1, 1) + p(2, 0))
    r = _trunc_div(rnum, factorR * 2)
    g = p(0, 0)
    bnum = (-2 * p(-2, 0) - 2 * p(-1, -1) + p(-1, 0) * factorB
            - 2 * p(-1, 1) + p(0, -2) + 10 * p(0, 0) + p(0, 2)
            - 2 * p(1, -1) + p(1, 0) * factorB - 2 * p(1, 1)
            - 2 * p(2, 0))
    b = _trunc_div(bnum, factorB * 2)
    return _sat16u(r), g & 0xFFFF, _sat16u(b)


def _grn_blu_cell(p, width):
    """GRNBLUCELL: green site on a blue row."""
    diffR = np.abs(p(-1, 0) - p(1, 0)) >> 10
    diffG = np.abs(p(-2, 0) - p(2, 0)) >> 10
    diffB = np.abs(p(0, -1) - p(0, 1)) >> 10
    factorR = 8 + (4 * diffG * diffG) // (2 + diffR * diffR)
    factorB = 8 + (4 * diffG * diffG) // (2 + diffB * diffB)
    rnum = (-2 * p(-2, 0) - 2 * p(-1, -1) + p(-1, 0) * factorR
            - 2 * p(-1, 1) + p(0, -2) + 10 * p(0, 0) + p(0, 2)
            - 2 * p(1, -1) + p(1, 0) * factorR - 2 * p(1, 1)
            - 2 * p(2, 0))
    r = _trunc_div(rnum, factorR * 2)
    g = p(0, 0)
    bnum = (p(-2, 0) - 2 * p(-1, -1) - 2 * p(-1, 1)
            - 2 * p(0, -2) + p(0, -1) * factorB + 10 * p(0, 0)
            + p(0, 1) * factorB - 2 * p(0, 2)
            - 2 * p(1, -1) - 2 * p(1, 1) + p(2, 0))
    b = _trunc_div(bnum, factorB * 2)
    return _sat16u(r), g & 0xFFFF, _sat16u(b)


def _blu_cell(p, width):
    """BLUCELL: blue site."""
    diffR = np.abs(p(-1, -1) - p(1, 1)) >> 10
    diffG = np.abs(p(0, -1) - p(0, 1)) >> 10
    diffB = np.abs(p(0, -2) - p(0, 2)) >> 10
    factorR = 4 + (4 * diffG * diffG) // (2 + diffR * diffR)
    factorB = 2 + (2 * diffB * diffB) // (2 + diffG * diffG)
    rnum = (-3 * p(-2, 0) + p(-1, -1) * factorR + p(-1, 1) * factorR
            - 3 * p(0, -2) + 12 * p(0, 0) - 3 * p(0, 2)
            + p(1, -1) * factorR + p(1, 1) * factorR - 3 * p(2, 0))
    r = _trunc_div(rnum, factorR * 4)
    gnum = (-p(-2, 0) + p(-1, 0) * factorB
            - p(0, -2) + p(0, -1) * factorB + 4 * p(0, 0)
            + p(0, 1) * factorB - p(0, 2)
            + p(1, 0) * factorB - p(2, 0))
    g = _trunc_div(gnum, factorB * 4)
    b = p(0, 0)
    return _sat16u(r), _sat16u(g), b & 0xFFFF


def _sharpen_h(row_rgb: np.ndarray, sharpening: int) -> np.ndarray:
    """FastSharpeningBlurHinplace (DemoasicFrames.cpp:345): per-channel
    horizontal 5-tap sharpen on an interleaved (w, 3) row.  Pixels 0 and
    w-1 keep their values, pixels 1 and w-2 get the 1-2-1 blur, the
    interior gets (-1, B, C, B, -1) >> shift with SATURATE16."""
    shift, B, C = {1: (4, 4, 10), 2: (3, 2, 6), 3: (2, 1, 4)}[sharpening]
    w = row_rgb.shape[0]
    out = row_rgb.copy()
    if w < 4:
        return out
    out[1] = (row_rgb[0] + 2 * row_rgb[1] + row_rgb[2]) >> 2
    out[w - 2] = (row_rgb[w - 3] + 2 * row_rgb[w - 2] + row_rgb[w - 1]) >> 2
    if w > 4:
        mid = (-row_rgb[0:w - 4]
               + B * row_rgb[1:w - 3]
               + C * row_rgb[2:w - 2]
               + B * row_rgb[3:w - 1]
               - row_rgb[4:w]) >> shift
        out[2:w - 2] = _sat16u(mid)
    return out


def debayer_line_red_grn(bayer: np.ndarray, y: int, highquality: int = 1,
                         sharpening: int = 1) -> np.ndarray:
    """DoDEBAYER_ORDER_RED_GRN for one mosaic row pair.

    ``bayer``: the (2h, 2w) mosaic (int64); ``y``: EVEN bayer row index.
    Returns the two demosaiced rows as (2, 2w, 3) int64, after the
    horizontal blur/sharpen pass."""
    height, width = bayer.shape
    row = y
    oddrow = row + 1
    out = np.zeros((2, width, 3), dtype=np.int64)

    def prow(r, base_row):
        def p(dy, dx):
            rr = base_row + dy
            return bayer[rr, 2 + dx: width - 2 + dx]
        return p

    # --- even row (red/green) -------------------------------------------
    even_hq = highquality and 0 < row < height - 2
    if even_hq:
        b = bayer
        o = out[0]
        # first red cell
        o[0, 0] = b[row, 0]
        o[0, 1] = _avg2(b[row - 1, 0], b[row + 1, 0])
        o[0, 2] = _avg2(b[row - 1, 1], b[row + 1, 1])
        # first green cell
        o[1, 0] = _avg2(b[row, 0], b[row, 2])
        o[1, 1] = b[row, 1]
        o[1, 2] = _avg2(b[row - 1, 1], b[row + 1, 1])
        # interior: red cells at even x, green cells at odd x
        p = prow(row, row)
        r, g, bl = _red_cell(p, width)
        o[2:width - 2:2, 0] = r[0:width - 4:2]
        o[2:width - 2:2, 1] = g[0:width - 4:2]
        o[2:width - 2:2, 2] = bl[0:width - 4:2]
        r, g, bl = _grn_red_cell(p, width)
        o[3:width - 2:2, 0] = r[1:width - 4:2]
        o[3:width - 2:2, 1] = g[1:width - 4:2]
        o[3:width - 2:2, 2] = bl[1:width - 4:2]
        # last red cell (x = width-2)
        x = width - 2
        o[x, 0] = b[row, x]
        o[x, 1] = _avg4(b[row, x - 1], b[row, x + 1],
                        b[row - 1, x], b[row + 1, x])
        o[x, 2] = _avg4(b[row - 1, x - 1], b[row - 1, x + 1],
                        b[row + 1, x - 1], b[row + 1, x + 1])
        # last green cell (x = width-1)
        x = width - 1
        o[x, 0] = b[row, x - 1]
        o[x, 1] = b[row, x]
        o[x, 2] = _avg2(b[row - 1, x], b[row + 1, x])
    else:
        b = bayer
        o = out[0]
        if row > 0:
            o[0, 0] = b[row, 0]
            o[0, 1] = _avg2(b[row - 1, 0], b[row + 1, 0])
            o[0, 2] = _avg2(b[row - 1, 1], b[row + 1, 1])
            xs = np.arange(1, width - 1, 2)
            o[xs, 0] = _avg2(b[row, xs - 1], b[row, xs + 1])
            o[xs, 1] = b[row, xs]
            o[xs, 2] = _avg2(b[row - 1, xs], b[row + 1, xs])
            xr = np.arange(2, width - 1, 2)
            o[xr, 0] = b[row, xr]
            o[xr, 1] = _avg4(b[row, xr - 1], b[row, xr + 1],
                             b[row - 1, xr], b[row + 1, xr])
            o[xr, 2] = _avg4(b[row - 1, xr - 1], b[row - 1, xr + 1],
                             b[row + 1, xr - 1], b[row + 1, xr + 1])
            x = width - 1
            o[x, 0] = b[row, x - 1]
            o[x, 1] = b[row, x]
            o[x, 2] = _avg2(b[row - 1, x], b[row + 1, x])
        else:
            o[0, 0] = b[row, 0]
            o[0, 1] = _avg2(b[row, 1], b[row + 1, 0])
            o[0, 2] = b[row + 1, 1]
            xs = np.arange(1, width - 1, 2)
            o[xs, 0] = _avg2(b[row, xs - 1], b[row, xs + 1])
            o[xs, 1] = b[row, xs]
            o[xs, 2] = b[row + 1, xs]
            xr = np.arange(2, width - 1, 2)
            o[xr, 0] = b[row, xr]
            o[xr, 1] = _avg2(b[row, xr - 1], b[row, xr + 1])
            o[xr, 2] = _avg2(b[row + 1, xr - 1], b[row + 1, xr + 1])
            x = width - 1
            o[x, 0] = b[row, x - 1]
            o[x, 1] = b[row, x]
            o[x, 2] = b[row + 1, x]

    # --- odd row (green/blue) -------------------------------------------
    odd_hq = highquality and 1 < oddrow < height - 1
    b = bayer
    o = out[1]
    if odd_hq:
        o[0, 0] = _avg2(b[oddrow - 1, 0], b[oddrow + 1, 0])
        o[0, 1] = b[oddrow, 0]
        o[0, 2] = b[oddrow, 1]
        o[1, 0] = _avg4(b[oddrow - 1, 0], b[oddrow - 1, 2],
                        b[oddrow + 1, 0], b[oddrow + 1, 2])
        o[1, 1] = _avg4(b[oddrow, 0], b[oddrow, 2],
                        b[oddrow - 1, 1], b[oddrow + 1, 1])
        o[1, 2] = b[oddrow, 1]
        p = prow(oddrow, oddrow)
        r, g, bl = _grn_blu_cell(p, width)
        o[2:width - 2:2, 0] = r[0:width - 4:2]
        o[2:width - 2:2, 1] = g[0:width - 4:2]
        o[2:width - 2:2, 2] = bl[0:width - 4:2]
        r, g, bl = _blu_cell(p, width)
        o[3:width - 2:2, 0] = r[1:width - 4:2]
        o[3:width - 2:2, 1] = g[1:width - 4:2]
        o[3:width - 2:2, 2] = bl[1:width - 4:2]
        x = width - 2
        o[x, 0] = _avg2(b[oddrow - 1, x], b[oddrow + 1, x])
        o[x, 1] = b[oddrow, x]
        o[x, 2] = _avg2(b[oddrow, x - 1], b[oddrow, x + 1])
        x = width - 1
        o[x, 0] = _avg2(b[oddrow - 1, x - 1], b[oddrow + 1, x - 1])
        o[x, 1] = _avg2(b[oddrow - 1, x], b[oddrow + 1, x])
        o[x, 2] = b[oddrow, x]
    else:
        if oddrow < height - 1:
            o[0, 0] = _avg2(b[oddrow - 1, 0], b[oddrow + 1, 0])
            o[0, 1] = b[oddrow, 0]
            o[0, 2] = b[oddrow, 1]
            xb = np.arange(1, width - 1, 2)
            o[xb, 0] = _avg4(b[oddrow - 1, xb - 1], b[oddrow - 1, xb + 1],
                             b[oddrow + 1, xb - 1], b[oddrow + 1, xb + 1])
            o[xb, 1] = _avg4(b[oddrow, xb - 1], b[oddrow, xb + 1],
                             b[oddrow - 1, xb], b[oddrow + 1, xb])
            o[xb, 2] = b[oddrow, xb]
            xg = np.arange(2, width - 1, 2)
            o[xg, 0] = _avg2(b[oddrow - 1, xg], b[oddrow + 1, xg])
            o[xg, 1] = b[oddrow, xg]
            o[xg, 2] = _avg2(b[oddrow, xg - 1], b[oddrow, xg + 1])
            x = width - 1
            o[x, 0] = _avg2(b[oddrow - 1, x - 1], b[oddrow + 1, x - 1])
            o[x, 1] = _avg2(b[oddrow - 1, x], b[oddrow + 1, x])
            o[x, 2] = b[oddrow, x]
        else:
            o[0, 0] = b[oddrow - 1, 0]
            o[0, 1] = b[oddrow, 0]
            o[0, 2] = b[oddrow, 1]
            xb = np.arange(1, width - 1, 2)
            o[xb, 0] = _avg2(b[oddrow - 1, xb - 1], b[oddrow - 1, xb + 1])
            o[xb, 1] = _avg2(b[oddrow, xb - 1], b[oddrow, xb + 1])
            o[xb, 2] = b[oddrow, xb]
            xg = np.arange(2, width - 1, 2)
            o[xg, 0] = b[oddrow - 1, xg]
            o[xg, 1] = b[oddrow, xg]
            o[xg, 2] = _avg2(b[oddrow, xg - 1], b[oddrow, xg + 1])
            # final blue cell: grn comes from the SAME row's x-1
            # (DemoasicFrames.cpp last-row tail)
            x = width - 1
            o[x, 0] = b[oddrow - 1, x - 1]
            o[x, 1] = b[oddrow, x - 1]
            o[x, 2] = b[oddrow, x]

    if sharpening == 0:
        raise NotImplementedError("FastBlurHinplace")
    elif sharpening in (1, 2, 3):
        out[0] = _sharpen_h(out[0], sharpening)
        out[1] = _sharpen_h(out[1], sharpening)
    return out


def fast_sharpening_blur_v(A, B, C, D, E, sharpening: int = 1):
    """FastSharpeningBlurV (bayer.c:9238): the SSE 5-tap vertical sharpen
    on interleaved RGB rows (uint16 lanes).

    sharpening=1: lanes are prescaled >>4, A/E further >>1, taps
    (B, C) = (2, 5) via mullo, accumulated with unsigned saturating
    adds/subs, clamped to 0x7fff by the +-0x8000 trick, then <<1."""
    params = {1: (4, 4, 10, 1, 4), 2: (3, 2, 6, 0, 4), 3: (2, 1, 4, 0, 3)}
    shift, Bc, Cc, preshift, prescale = params[sharpening]
    shiftsse2 = shift - prescale
    if preshift:
        Bc >>= preshift
        Cc >>= preshift
        shiftsse2 -= preshift
    a = A.astype(np.int64) >> prescale
    b = B.astype(np.int64) >> prescale
    c = C.astype(np.int64) >> prescale
    d = D.astype(np.int64) >> prescale
    e = E.astype(np.int64) >> prescale
    if preshift:
        a >>= preshift
        e >>= preshift
    mix = (c * Cc) & 0xFFFF
    mix = np.maximum(mix - a, 0)                 # subs_epu16
    mix = np.maximum(mix - e, 0)
    mix = np.minimum(mix + ((b * Bc) & 0xFFFF), 0xFFFF)   # adds_epu16
    mix = np.minimum(mix + ((d * Bc) & 0xFFFF), 0xFFFF)
    mix = np.minimum(mix + 0x8000, 0xFFFF)       # clamp to 0x7fff
    mix = np.maximum(mix - 0x8000, 0)
    return (mix << (-shiftsse2)) & 0xFFFF if shiftsse2 < 0 else \
        (mix >> shiftsse2)


def demosaic_raw_rg48(G, RG, BG, GD, bayer_format: int = 0,
                      sharpening: int = 1) -> np.ndarray:
    """Full DemosaicRAW chain for 16-bit RGB output (highquality 5x5,
    Advanced Detail 1): ColorDifference2Bayer -> DebayerLine (with the
    horizontal sharpen) -> FastSharpeningBlurV -> interleaved RGB48 rows
    (the RG48 whitepoint-16 store is a direct copy, bayer.c:1393-1401).

    Returns (2h, 2w, 3) uint16."""
    bayer = color_difference_to_bayer(G, RG, BG, GD, bayer_format)
    h2, w2 = bayer.shape
    h = h2 // 2

    rgb = np.zeros((h2, w2, 3), dtype=np.int64)
    for y in range(h):
        rgb[2 * y:2 * y + 2] = debayer_line_red_grn(
            bayer, 2 * y, highquality=1, sharpening=sharpening)

    flat = rgb.reshape(h2, -1)
    out = np.zeros_like(flat)
    for y in range(h):
        C = 2 * y
        Br = C - 1 if y >= 1 else C
        Ar = Br - 1 if y >= 1 else Br
        Dr = C + 1 if y < h - 1 else C
        Er = Dr + 1 if y < h - 1 else Dr
        out[2 * y] = fast_sharpening_blur_v(
            flat[Ar], flat[Br], flat[C], flat[Dr], flat[Er], sharpening)
        out[2 * y + 1] = fast_sharpening_blur_v(
            flat[Ar + 1], flat[Br + 1], flat[C + 1],
            flat[min(Dr + 1, h2 - 1)], flat[min(Er + 1, h2 - 1)],
            sharpening)
    return out.reshape(h2, w2, 3).astype(np.uint16)


# ---------------------------------------------------------------------------
# ApplyActiveMetaData: the 1D-LUT develop path (white balance / matrix)
# ---------------------------------------------------------------------------

def curve2linear_lut(curve_base: float = 90.0) -> np.ndarray:
    """decoder->Curve2Linear (Build1DCurves2Linear, bayer.c:5196-5262):
    49152-entry signed 13-bit curve-to-linear table over [-2, +4)."""
    k = np.arange(-16384, 32768, dtype=np.float64)
    i32 = (k.astype(np.float32) / np.float32(8192.0)).astype(np.float64)
    lin = (np.power(curve_base, i32) - 1.0) / (curve_base - 1.0)
    val = (lin.astype(np.float32) * np.float32(8192.0)).astype(np.float32)
    return np.clip(np.trunc(val).astype(np.int64), -16384, 32767)


def linear2curve_lut(curve_base: float = 90.0,
                     gamma_tweak: float = 1.0) -> np.ndarray:
    """decoder->Linear2CurveRed (Build1DLinear2Curves, bayer.c:5289-5527,
    cg-unity branch): 65536-entry signed 13-bit linear-to-curve table
    over [-2, +6)."""
    j = np.arange(65536, dtype=np.float64)
    intensity = (j - 16384.0).astype(np.float32)
    x = (intensity / np.float32(8192.0)).astype(np.float64)
    if gamma_tweak != 1.0:
        x = np.where(x >= 0, np.power(x, 1.0 / gamma_tweak),
                     -np.power(-x, 1.0 / gamma_tweak))
    x = x.astype(np.float32).astype(np.float64)
    b = float(curve_base)
    pos = np.log10(np.maximum(x, 0) * (b - 1.0) + 1.0) / np.log10(b)
    neg = -np.log10(np.maximum(-x, 0) * (b - 1.0) + 1.0) / np.log10(b)
    cur = np.where(x >= 0.0, pos, neg).astype(np.float32)
    val = (cur * np.float32(8192.0)).astype(np.float32)
    return np.clip(np.trunc(val).astype(np.int64), -16384, 32767)


def normalize_white_balance(wb) -> np.ndarray:
    """The reference's white-balance conditioning (bayer.c:4395-4427):
    floor gains at 0.4 and cap at 10.0 (the renormalize-below-1.0 block
    is compiled out with `#if 0`)."""
    wb = np.maximum(np.asarray(wb, np.float64)[:3], 0.4)
    return np.minimum(wb, 10.0)


def apply_active_metadata_wb(rgb16: np.ndarray, wb,
                             curve_base: float = 90.0) -> np.ndarray:
    """ApplyActiveMetaData's integer 1D-LUT path for a linear diagonal
    matrix (CURVES_PROCESSING_MACRO, bayer.c:7164-7330, useFloatCC=0):

        v13 = v16 >> 3
        lin = Curve2Linear[v13 + 16384]
        n   = ((lcm . lin) >> 13) + lcm[3], clamped to [-16384, 49151]
        out = Linear2CurveRed[n + 16384]      (signed 13-bit)

    Returns the signed 13-bit rows (whitebitdepth 13); the RG48 store
    shifts them <<3 with a [0, 65535] clamp (bayer.c:1286-1301)."""
    c2l = curve2linear_lut(curve_base)
    l2c = linear2curve_lut(curve_base)
    wb = normalize_white_balance(wb)
    lcm = np.trunc(wb * 8192.0).astype(np.int64)   # (int)(gain * 8192.0)

    v13 = rgb16.astype(np.int64) >> 3
    lin = c2l[v13 + 16384]
    n = (lcm[None, None, :] * lin) >> 13
    n = np.clip(n, -16384, 49151)
    return l2c[n + 16384]


def demosaic_raw_rg48_wb(G, RG, BG, GD, wb, bayer_format: int = 0,
                         sharpening: int = 1) -> np.ndarray:
    """DemosaicRAW + ApplyActiveMetaData white balance -> RG48 rows
    (whitepoint-13 store: value << 3, clamp [0, 65535])."""
    rgb = demosaic_raw_rg48(G, RG, BG, GD, bayer_format, sharpening)
    out13 = apply_active_metadata_wb(rgb, wb)
    return np.clip(out13 << 3, 0, 65535).astype(np.uint16)


def apply_active_metadata_matrix(rgb16: np.ndarray, matrix,
                                 curve_base: float = 90.0) -> np.ndarray:
    """ApplyActiveMetaData's integer 1D-LUT path for a full linear 3x4
    matrix (COLM + optional WB column gains):

        lin = Curve2Linear[(v16 >> 3) + 16384]
        n_i = ((lcm[i0]*r + lcm[i1]*g + lcm[i2]*b) >> 13) + lcm[i3]
        out = Linear2CurveRed[clip(n, -16384, 49151) + 16384]

    lcm = (int)(m * 8192.0); the offset column is 13-bit linear."""
    c2l = curve2linear_lut(curve_base)
    l2c = linear2curve_lut(curve_base)
    m = np.asarray(matrix, np.float64).reshape(3, 4)
    lcm = np.trunc(m * 8192.0).astype(np.int64)

    v13 = rgb16.astype(np.int64) >> 3
    lin = c2l[v13 + 16384]
    n = np.einsum('ij,hwj->hwi', lcm[:, :3], lin) >> 13
    n = n + lcm[:, 3][None, None, :]
    n = np.clip(n, -16384, 49151)
    return l2c[n + 16384]


def compose_develop_matrix(colm=None, saturation: float = 1.0,
                           exposure: float = 1.0, wb=None) -> np.ndarray:
    """NeedCube's linear matrix composition (bayer.c:4431-4530), float32:

    - start from COLM (use_base_matrix defaults to the custom matrix) or
      identity
    - saturation blends toward the desat / fullsat matrices
      (sat = SATU payload; <1 desaturates, >1 amplifies via
      ((sat-1)/3)*fullsat + ((4-sat)/3)*m)
    - exposure scales every column
    - white balance scales column j by wb[j] and the offset of row j by
      wb[j]
    """
    m = np.eye(3, 4, dtype=np.float32) if colm is None else \
        np.asarray(colm, np.float32).reshape(3, 4).copy()
    sat = np.float32(saturation)
    if sat != np.float32(1.0):
        desat = np.array([[0.309, 0.609, 0.082]] * 3, np.float32)
        fullsat = np.array([[4.042, -2.681, -0.361],
                            [-1.358, 2.719, -0.361],
                            [-1.358, -2.681, 5.039]], np.float32)
        if sat < 1.0:
            m[:, :3] = ((np.float32(1.0) - sat) * desat
                        + sat * m[:, :3]).astype(np.float32)
        else:
            m[:, :3] = (((sat - np.float32(1.0)) / np.float32(3.0)) * fullsat
                        + ((np.float32(4.0) - sat) / np.float32(3.0))
                        * m[:, :3]).astype(np.float32)
    exp = np.float32(exposure)
    if exp != np.float32(1.0):
        m = (m * exp).astype(np.float32)
    if wb is not None:
        wbn = normalize_white_balance(wb).astype(np.float32)
        m[:, :3] = (m[:, :3] * wbn[None, :]).astype(np.float32)
        m[:, 3] = (m[:, 3] * wbn).astype(np.float32)
    return m.astype(np.float64)


def gamma_contrast_lut(gamma: float = 1.0,
                       contrast: float = 1.0) -> np.ndarray:
    """decoder->GammaContrastRed/Grn/Blu (Build1DLinear2Curves cg branch,
    bayer.c:5322-5345): 65536-entry signed 13-bit gamma tweak table —
    lin2gam (exponent 1.0/(double)(float)g, linear negative extension),
    then calc_contrast when contrast != 1, *8192 float truncation."""
    gf = float(np.float32(gamma))
    j = np.arange(65536, dtype=np.float64)
    intensity = (j - 16384.0).astype(np.float32)
    x = (intensity / np.float32(8192.0)).astype(np.float64)
    exponent = np.float64(np.float32(1.0 / gf))
    v = np.where(x >= 0, np.power(np.maximum(x, 0), exponent),
                 x * 100.0 * np.power(0.01, exponent)).astype(np.float32)
    if contrast != 1.0:
        v = _calc_contrast(v, contrast)
    val = (v.astype(np.float32) * np.float32(8192.0)).astype(np.float32)
    return np.clip(np.trunc(val).astype(np.int64), -16384, 32767)


def apply_gamma_tweaks(rgb16: np.ndarray, rgb_gamma,
                       contrast: float = 1.0) -> np.ndarray:
    """The no-matrix gamma-tweaks branch of CURVES_PROCESSING_MACRO:
    out13 = GammaContrast_c[(v16 >> 3) + 16384] per channel."""
    v13 = rgb16.astype(np.int64) >> 3
    return np.stack([gamma_contrast_lut(g, contrast)[v13[..., c] + 16384]
                     for c, g in enumerate(rgb_gamma)], axis=-1)


# RGB -> YUV coefficient tables (bayer.c:446-469), 1.15 fixed point
_RGB2YUV_709 = ((0.183, 0.614, 0.062), (-0.101, -0.338, 0.439),
                (0.439, -0.399, -0.040))
_RGB2YUV_601 = ((0.257, 0.504, 0.098), (-0.148, -0.291, 0.439),
                (0.439, -0.368, -0.071))
_RGB2YUV_VS709 = ((0.213, 0.715, 0.072), (-0.117, -0.394, 0.511),
                  (0.511, -0.464, -0.047))
_RGB2YUV_VS601 = ((0.299, 0.587, 0.114), (-0.172, -0.339, 0.511),
                  (0.511, -0.428, -0.083))


def convert_rgb16_to_yuyv(rgb16: np.ndarray, linenum0: int = 0,
                          coeffs=_RGB2YUV_709, uyvy: bool = False,
                          parity=None, whitepoint: int = 16) -> bytes:
    """ConvertLinesToOutput's YUYV branch for 16-bit RGB input
    (bayer.c:3200-3400, NEWDITHER=0 so fully deterministic): rows >>3 to
    13 bits, 1.15 mulhi color matrix with saturating adds, the fixed
    per-lane ordered dither (luma pattern swaps with row parity), 4:2:2
    chroma down-filter as current+previous lane WITHIN each 8-pixel SSE
    block (lane 0 of every block adds 0), >>4 (+16) luma / >>5 (+128)
    chroma, and the +0x7f00 byte clamp."""
    h, w = rgb16.shape[:2]
    assert w % 8 == 0, "SSE-only path (width multiple of 8)"

    def sat16(v):
        return np.clip(v, -32768, 32767)

    def mulhi(a, coeff):
        c = int(np.trunc(np.float32(coeff) * np.float32(32768.0)))
        prod = a * c
        return prod >> 16

    if whitepoint == 16:
        v13 = rgb16.astype(np.int64) >> 3
        yoffset = 16
    else:
        # 13-bit signed input (post-ApplyActiveMetaData).  The whitepoint
        # 13 path selects the VIDEO-SAFE matrix with cg2vs range
        # conversion first (ConvertCGRGBtoVSRGB, convert.c:12045:
        # mulhi by 32767*219/255, <<1, +512 saturating) and yoffset 0
        v = rgb16.astype(np.int64)
        v = sat16((((v * 28141) >> 16) << 1) + 512)
        # then the saturate clamp [0, 0x1fff]
        t = sat16(v + (0x7FFF - 0x1FFF))
        v13 = np.maximum(np.asarray(t) & 0xFFFF, 0x7FFF - 0x1FFF) \
            - (0x7FFF - 0x1FFF)
        coeffs = _RGB2YUV_VS709 if coeffs is _RGB2YUV_709 else coeffs
        yoffset = 0
    r, g, b = v13[..., 0], v13[..., 1], v13[..., 2]

    def channel(cs):
        return sat16(sat16(mulhi(r, cs[0]) + mulhi(g, cs[1]))
                     + mulhi(b, cs[2]))

    y = channel(coeffs[0])
    u = channel(coeffs[1])
    v = channel(coeffs[2])

    def blockprev(x):
        p = np.zeros_like(x)
        p[:, 1:] = x[:, :-1]
        p[:, 0::8] = 0
        return p

    u = sat16(u + blockprev(u))
    v = sat16(v + blockprev(v))

    # ordered dither lanes (_mm_set_epi16 args are HIGH-to-LOW;
    # bayer.c:3222-3232 — the luma/chroma patterns swap on odd rows)
    d_y_odd = np.array([9, 7, 11, 5, 13, 3, 15, 1])
    d_y_even = np.array([1, 15, 3, 13, 5, 11, 7, 9])
    d_a = np.array([18, 14, 22, 10, 26, 6, 30, 2])
    d_b = np.array([2, 30, 6, 26, 10, 22, 14, 18])
    if parity is None:
        rows = ((np.arange(h) + linenum0) & 1)[:, None]
    else:
        rows = (np.asarray(parity).reshape(h) & 1)[:, None]
    dy = np.where(rows == 1, np.tile(d_y_odd, w // 8),
                  np.tile(d_y_even, w // 8))
    # the chroma patterns swap with row parity: odd rows U=d_a/V=d_b,
    # even rows U=d_b/V=d_a
    du = np.where(rows == 1, np.tile(d_a, w // 8), np.tile(d_b, w // 8))
    dv = np.where(rows == 1, np.tile(d_b, w // 8), np.tile(d_a, w // 8))

    y = sat16(sat16(y + dy) >> 4)
    y = sat16(y + yoffset)
    u = sat16(sat16(u + du) >> 5) + 128
    v = sat16(sat16(v + dv) >> 5) + 128

    def clamp255(x):
        t = np.asarray(sat16(x + (0x7FFF - 0xFF))) & 0xFFFF
        return np.maximum(t, 0x7FFF - 0xFF) - (0x7FFF - 0xFF)

    y = clamp255(y)
    u = clamp255(u)
    v = clamp255(v)

    out = np.empty((h, w, 2), np.uint8)
    if uyvy:
        out[:, 0::2, 0] = u[:, 1::2]
        out[:, 0::2, 1] = y[:, 0::2]
        out[:, 1::2, 0] = v[:, 1::2]
        out[:, 1::2, 1] = y[:, 1::2]
    else:
        out[:, 0::2, 0] = y[:, 0::2]
        out[:, 0::2, 1] = u[:, 1::2]
        out[:, 1::2, 0] = y[:, 1::2]
        out[:, 1::2, 1] = v[:, 1::2]
    return out.tobytes()


def demosaic_bilinear_rgb(G, RG, BG, GD, bayer_format: int = 0) -> np.ndarray:
    """The 8-bit output demosaic: highquality=0 (bilinear 3x3 bracket),
    no sharpening — what DemosaicRAW uses for YUY2/RGB24-class outputs
    (debayerfilter default 0 -> "bilinear", sharpening -1)."""
    bayer = color_difference_to_bayer(G, RG, BG, GD, bayer_format)
    h2, w2 = bayer.shape
    rgb = np.zeros((h2, w2, 3), np.int64)
    for y in range(h2 // 2):
        rgb[2 * y:2 * y + 2] = debayer_line_red_grn(
            bayer, 2 * y, highquality=0, sharpening=-1)
    return rgb


def bayer_yuyv_parity(height: int) -> np.ndarray:
    """Output-row dither parity for the Bayer YUY2 path: DemosaicRAW
    calls ConvertLinesToOutput(width*2, 2, y) once per MOSAIC row, so
    output row t uses lines = y + (t & 1) -> parity (t//2 + t%2) & 1."""
    t = np.arange(height)
    return ((t // 2) + (t & 1)) & 1


def fast_vignette_wp13(out13: np.ndarray, vgn_start: float, vgn_end: float,
                       vgn_gain: float) -> np.ndarray:
    """FastVignetteInplaceWP13 over a whole (H, W, 3) WP13 frame, exact
    float32 model (`Codec/DemoasicFrames.cpp:421-545`, mono call site
    `decoder.c:7874`: displayWidth = width = frame width):

    - vig_diag = sqrtf(1 + (h/w)^2); r1 = ((start+1)*diag)^2,
      r2 = ((end+1)*diag)^2 (squared inside the function)
    - per line: ypos = (2*(h/2 - y)/w)^2; xpos marches from -1.0 by
      2/w in float32 (sequential accumulation), walking pixel columns
      from BOTH edges inward, two at a time, BREAKING at the first
      column with r = xpos^2 + ypos <= r1 (the frame center is
      untouched)
    - ring columns: Af = softstep((r2-r)/(r2-r1)) * (1-gain) + gain
      (or plain gain outside r2; zeroed when gain == 0), applied as
      sign(v) * (int)sqrtf(v*v*Af) per component
    """
    f32 = np.float32
    h, w, _ = out13.shape
    diag = np.sqrt(f32(1.0) + (f32(h) / f32(w)) * (f32(h) / f32(w)),
                   dtype=f32)
    r1 = (f32(vgn_start) + f32(1.0)) * diag
    r2 = (f32(vgn_end) + f32(1.0)) * diag
    r1, r2 = r1 * r1, r2 * r2
    gain = f32(vgn_gain)
    xstep = f32(2.0) / f32(w)
    # xpos sequence: sequential float32 accumulation from -1.0
    xpos = np.empty(w // 2, f32)
    v = f32(-1.0)
    for i in range(w // 2):
        xpos[i] = v
        v = f32(v + xstep)
    out = out13.astype(np.int64).copy()
    for y in range(h):
        ypos = f32(2.0) * f32(h // 2 - y) / f32(w)
        ypos = ypos * ypos
        r = xpos * xpos + ypos
        inside = np.nonzero(r <= r1)[0]
        nproc = int(inside[0]) if inside.size else w // 2
        if nproc == 0:
            continue
        rr = r[:nproc]
        af = (r2 - rr) / (r2 - r1)
        af = (af - f32(0.5)) * f32(2.0)
        af = af / (f32(1.0) + np.abs(af))
        af = af + f32(0.5)
        af = af * (f32(1.0) - gain) + gain
        af = np.where(r2 < rr, gain, af).astype(f32)
        for cols, a in ((np.arange(nproc), af),
                        (w - 1 - np.arange(nproc), af)):
            if gain == 0.0:
                zero_cols = cols[r2 < rr]
                out[y, zero_cols] = 0
                ring_cols = cols[(r2 >= rr)]
                a_ring = a[(r2 >= rr)]
            else:
                ring_cols, a_ring = cols, a
            vv = out[y, ring_cols].astype(f32)
            mag = np.sqrt(vv * vv * a_ring[:, None], dtype=f32)
            out[y, ring_cols] = np.sign(out[y, ring_cols]) * \
                mag.astype(np.int64)
    return out


def _sharpen_wp13_weights(sharpness: float) -> tuple[int, np.ndarray]:
    """Per-row FIR size and weights for FastSharpeningBlurVWP13 at full
    resolution, mono (taps=5, BLEND_NONE; `Codec/DemoasicFrames.cpp:1361`).

    Returns (FIRsize, weights) where weights spans the FIR symmetrically:
    FIRsize 5 -> [af, bf, cf, bf, af] over rows (y-2, y-1, y, y+1, y+2);
    FIRsize 7 -> [af, bf*5.., af]; FIRsize 9 -> [af, bf*7.., af].  All
    arithmetic float32, matching the C expressions exactly."""
    f32 = np.float32
    s = f32(sharpness)
    if s >= 0:
        s5 = s * f32(5.0)
        diff = f32(s5 - f32(int(s5)))
        adiff = f32(f32(1.0) - diff)
        table = {
            0: (f32(0.000) * adiff - f32(0.0625) * diff,
                f32(0.000) * adiff + f32(0.2500) * diff,
                f32(1.000) * adiff + f32(0.6250) * diff),
            1: (f32(-0.0625) * adiff - f32(0.1250) * diff,
                f32(0.2500) * adiff + f32(0.2500) * diff,
                f32(0.6250) * adiff + f32(0.7500) * diff),
            2: (f32(-0.1250) * adiff - f32(0.2500) * diff,
                f32(0.2500) * adiff + f32(0.2500) * diff,
                f32(0.7500) * adiff + f32(1.0000) * diff),
            3: (f32(-0.2500) * adiff - f32(0.5000) * diff,
                f32(0.2500) * adiff + f32(0.5000) * diff,
                f32(1.0000) * adiff + f32(1.0000) * diff),
            4: (f32(-0.5000) * adiff - f32(0.5000) * diff,
                f32(0.5000) * adiff + f32(0.0000) * diff,
                f32(1.0000) * adiff + f32(2.0000) * diff),
            5: (f32(-0.5000), f32(0.0000), f32(2.0000)),
        }
        af, bf, cf = table[min(int(s5), 5)]
        return 5, np.array([af, bf, cf, bf, af], f32)
    # blur branch (sharpness < 0), taps == 5
    s4 = -s * f32(4.0)
    case = -1 + int(s * f32(4.0))
    diff = f32(s4 - f32(int(s4)))
    adiff = f32(f32(1.0) - diff)
    if case <= -4:  # FIRsize 9 (case -5 sets diff=1 and falls through)
        if case == -5:
            diff = f32(1.0)
        af = f32(f32(1.0) / f32(9.0) * diff)
        bf = f32((f32(1.0) - af * f32(2.0)) / f32(7.0))
        return 9, np.array([af] + [bf] * 7 + [af], f32)
    if case == -3:  # FIRsize 7
        af = f32(f32(1.0) / f32(7.0) * diff)
        bf = f32((f32(1.0) - af * f32(2.0)) / f32(5.0))
        return 7, np.array([af] + [bf] * 5 + [af], f32)
    if case == -2:
        af = f32(0.125) * diff
        bf = f32(0.25) * adiff + f32(0.25) * diff
        cf = f32(0.50) * adiff + f32(0.25) * diff
    else:  # case -1 (default)
        af = f32(0.0)
        bf = f32(0.25) * diff
        cf = f32(1.00) * adiff + f32(0.50) * diff
    return 5, np.array([af, bf, cf, bf, af], f32)


def fast_sharpening_blur_v_wp13(buf13: np.ndarray,
                                sharpness: float) -> np.ndarray:
    """FastSharpeningBlurVWP13 over a whole (H, W, 3) WP13 frame at full
    resolution, mono decode (`Codec/DemoasicFrames.cpp:1361-2124`; call
    site `decoder.c:8838`, default BLEND_NONE row setup `decoder.c:8739`).

    Per output row y the decoder clamps the 5 base rows to the frame
    (A=y-2 if y>=2 else y, B=y-1 if y>=1 else y, C=y, D/E mirror at the
    bottom) and sets edgenear for y<=4 or y>=h-4 (which demotes the blur
    FIR 7/9 to an equal-weight FIR 5).  The SSE kernel lifts int16 WP13
    values into the high 16 bits (exact *65536 in float32), accumulates
    the weighted taps in float32 in fixed order (A, +B, +C, +D, +E [,+
    outer rows]), rounds to nearest-even (cvtps_epi32), >>16, saturates
    to int16.  Lanes beyond (3*W) & ~7 are never written by the SSE loop
    (callers here keep 3*W % 8 == 0)."""
    f32 = np.float32
    h, w, _ = buf13.shape
    assert (3 * w) % 8 == 0, "model requires 3*W divisible by 8"
    rows = buf13.reshape(h, 3 * w).astype(np.int32)
    firsize, weights = _sharpen_wp13_weights(sharpness)
    out = np.empty_like(rows)
    eq5 = np.full(5, f32(0.2))
    for y in range(h):
        a_i = y - 2 if y >= 2 else y
        b_i = y - 1 if y >= 1 else y
        d_i = y + 1 if y < h - 1 else y
        e_i = y + 2 if y < h - 2 else y
        edgenear = (y <= 4) or (y >= h - 4)
        fs, wts = firsize, weights
        if fs in (7, 9) and edgenear:
            fs, wts = 5, eq5
        # accumulation ORDER matters (float32 is not associative): the
        # SSE code starts from row A's product, then adds the outer rows
        # (A2, A1), then B, C, D, E, then (E1, E2)
        if fs == 5:
            order = [(a_i, wts[0]), (b_i, wts[1]), (y, wts[2]),
                     (d_i, wts[3]), (e_i, wts[4])]
        elif fs == 7:
            af, bf = wts[0], wts[1]
            order = [(a_i, bf), (a_i - 1, af), (b_i, bf), (y, bf),
                     (d_i, bf), (e_i, bf), (e_i + 1, af)]
        else:  # 9
            af, bf = wts[0], wts[1]
            order = [(a_i, bf), (a_i - 2, af), (a_i - 1, bf), (b_i, bf),
                     (y, bf), (d_i, bf), (e_i, bf), (e_i + 1, bf),
                     (e_i + 2, af)]
        # strict per-op float32 (cvtepi32_ps of v<<16 is exact):
        # int32*f32 in numpy silently promotes to float64, which rounds
        # differently at the 2^24 mantissa boundary
        acc = rows[order[0][0]].astype(f32) * f32(65536.0) * order[0][1]
        for ridx, wt in order[1:]:
            acc = (acc + rows[ridx].astype(f32) * f32(65536.0) * wt
                   ).astype(f32)
        # cvtps_epi32: round-to-nearest-even on the float32 accumulator
        q = np.rint(acc).astype(np.int64)
        out[y] = np.clip(q >> 16, -32768, 32767)
    return out.reshape(h, w, 3)


def _sharpen_h_coeffs(sharpness: float) -> tuple[int, int, int, int]:
    """(A, B, C, shift) for FastSharpeningBlurHinplaceWP13 at full
    resolution (taps=5, pixelsize 6; `Codec/DemoasicFrames.cpp:996-1076`).
    diff = (int)(256 * frac(sharpness*5)) for the positive branch."""
    f32 = np.float32
    s = f32(sharpness)
    s5 = s * f32(5.0)
    diff = int(f32(256.0) * f32(s5 - f32(int(s5))))
    adiff = 256 - diff
    case = int(s5)
    table = {
        -5: (2 * adiff + 2 * diff, 4 * adiff + 4 * diff,
             4 * adiff + 4 * diff, 12),
        -4: (2 * adiff + 2 * diff, 4 * adiff + 4 * diff,
             4 * adiff + 4 * diff, 12),
        -3: (0 * adiff + 2 * diff, 4 * adiff + 4 * diff,
             8 * adiff + 4 * diff, 12),
        -2: (0 * adiff + 2 * diff, 4 * adiff + 4 * diff,
             8 * adiff + 4 * diff, 12),
        -1: (0, 0 * adiff + 4 * diff, 16 * adiff + 8 * diff, 12),
        0: (0 * adiff - 1 * diff, 0 * adiff + 4 * diff,
            16 * adiff + 10 * diff, 12),
        1: (-1 * adiff - 2 * diff, 4 * adiff + 4 * diff,
            10 * adiff + 12 * diff, 12),
        2: (-2 * adiff - 4 * diff, 4 * adiff + 4 * diff,
            12 * adiff + 16 * diff, 12),
        3: (-4 * adiff - 8 * diff, 4 * adiff + 8 * diff,
            16 * adiff + 16 * diff, 12),
        4: (-8 * adiff - 8 * diff, 8 * adiff + 0 * diff,
            16 * adiff + 32 * diff, 12),
        5: (-8, 0, 32, 4),
    }
    return table[max(-5, min(case, 5))]


def fast_sharpening_blur_h_wp13(buf13: np.ndarray,
                                sharpness: float) -> np.ndarray:
    """FastSharpeningBlurHinplaceWP13 over a whole (H, W, 3) WP13 frame,
    full resolution mono (`Codec/DemoasicFrames.cpp:555,980-1120`; call
    site `decoder.c:7880`, the geometric/vignette pass).

    Positive-branch semantics (the negative/blur cases with their own
    row layouts share the same 5-tap inner loop for cases -1/-2):
    - pixel 0 is copied through; pixel 1 becomes a 1-2-1 blur of the
      ORIGINAL pixels 0..2 (computed before any clamping)
    - the in-place loop clamps each pixel i+2 (i.e. pixels 4..W-1) to
      >= 0 in the source BEFORE it is ever read as a filter tap
    - out[i] = (p[i-2]*A + p[i-1]*B + p[i]*C + p[i+1]*B + p[i+2]*A)
      >> shift (arithmetic, no saturation) for i in [2, W-2)
    - pixel W-2 becomes a 1-2-1 blur of (clamped) pixels W-3..W-1;
      pixel W-1 is the (clamped) copy."""
    s = float(sharpness)
    h, w, _ = buf13.shape
    if s < 0.0:
        return fast_sharpening_blur_h_wp13_neg(buf13, s)
    A, B, C, shift = _sharpen_h_coeffs(s)
    x = buf13.astype(np.int64)
    first = x[:, 0].copy()
    blur1 = (x[:, 0] + 2 * x[:, 1] + x[:, 2]) >> 2
    xc = x.copy()
    xc[:, 4:] = np.maximum(xc[:, 4:], 0)
    out = xc.copy()
    out[:, 0] = first
    out[:, 1] = blur1
    acc = (xc[:, 0:w - 4] * A + xc[:, 1:w - 3] * B + xc[:, 2:w - 2] * C
           + xc[:, 3:w - 1] * B + xc[:, 4:w] * A)
    out[:, 2:w - 2] = acc >> shift
    out[:, w - 2] = (xc[:, w - 3] + 2 * xc[:, w - 2] + xc[:, w - 1]) >> 2
    out[:, w - 1] = xc[:, w - 1]
    return out


def _blur_h_wp13_row(row: np.ndarray, sharpness: float) -> np.ndarray:
    """Negative-sharpness FastSharpeningBlurHinplaceWP13 on one
    interleaved RGB row (pixelsize 6, taps=5 full-res;
    `Codec/DemoasicFrames.cpp:592-778`), faithful in-place simulation.

    diff = (int)(256 * frac(-s*4)); case = -1 + (int)(s*4).  Cases
    -1/-2 are 5-tap integer FIRs (margin 2); -3 is a 7-tap (margin 3,
    A = 4096/7*diff/256, B = (4096-2A)/5); -4/-5 are 9-tap (margin 4,
    A = 4096/9*diff/256, B = (4096-2A)/7; -5 forces diff=256).  The
    trailing in-place write + shift-back-by-margin leaves the LEFT
    margin pixels equal to the first filtered pixel and the RIGHT
    (2*margin) pixels untouched."""
    f32 = np.float32
    s = f32(sharpness)
    w = row.shape[0] // 3
    x = row.astype(np.int64).copy()
    p = x.reshape(w, 3)
    diff = int(f32(256.0) * f32((-s) * f32(4.0)
                                - f32(int((-s) * f32(4.0)))))
    adiff = 256 - diff
    case = -1 + int(s * f32(4.0))
    out = p.copy()
    if case <= -4:
        if case <= -5:
            diff = 256
        margin, shift = 4, 12
        A = 4096 // 9 * diff // 256
        B = (4096 - A * 2) // 7
        filt = (
            (p[0:w - 8] + p[8:w]) * A
            + (p[1:w - 7] + p[2:w - 6] + p[3:w - 5] + p[4:w - 4]
               + p[5:w - 3] + p[6:w - 2] + p[7:w - 1]) * B) >> shift
    elif case == -3:
        margin, shift = 3, 12
        A = 4096 // 7 * diff // 256
        B = (4096 - A * 2) // 5
        filt = (
            (p[0:w - 6] + p[6:w]) * A
            + (p[1:w - 5] + p[2:w - 4] + p[3:w - 3] + p[4:w - 2]
               + p[5:w - 1]) * B) >> shift
    else:
        margin, shift = 2, 12
        if case == -2:
            A = 0 * adiff + 2 * diff
            B = 4 * adiff + 4 * diff
            C = 8 * adiff + 4 * diff
        else:  # case -1 (default for tiny blurs)
            A = 0
            B = 0 * adiff + 4 * diff
            C = 16 * adiff + 8 * diff
        filt = (p[0:w - 4] * A + p[1:w - 3] * B + p[2:w - 2] * C
                + p[3:w - 1] * B + p[4:w] * A) >> shift
    # filt[k] is the FIR centred at pixel k+margin, for
    # k in [0, w-2*margin); shift-back leaves:
    #   out[margin .. w-2*margin-1] = FIR at the same pixel
    #   out[0 .. margin-1]          = FIR at pixel `margin`
    #   out[w-2*margin .. w-1]      = original pixels
    out[margin:w - 2 * margin] = filt[:w - 3 * margin]
    out[:margin] = filt[0]
    return out.reshape(-1)


def fast_sharpening_blur_h_wp13_neg(buf13: np.ndarray,
                                    sharpness: float) -> np.ndarray:
    """Negative-sharpness horizontal pass over a (H, W, 3) frame."""
    h, w, _ = buf13.shape
    rows = buf13.reshape(h, 3 * w)
    out = np.stack([_blur_h_wp13_row(r, sharpness) for r in rows])
    return out.reshape(h, w, 3)


# Protune preview 1D curve, built into the decoder for LOOK CRC
# 0x3f6f5788 (`Codec/DemoasicFrames.cpp:5017-5092`): expanded to a
# separable 32^3 float LUT with entry (b,g,r) -> (curve[b],curve[g],
# curve[r]) in the build order, which the (b*32^2+g*32+r) reader then
# sees as out_c = curve[coord_c].
PROTUNE_LOOK_CRC = 0x3F6F5788
_PROTUNE_CURVE = np.array([
    0.000000, 0.002565, 0.010235, 0.022930, 0.040521, 0.062827,
    0.089618, 0.120621, 0.155517, 0.193947, 0.235518, 0.279803,
    0.326347, 0.374674, 0.424286, 0.474675, 0.525325, 0.575714,
    0.625326, 0.673653, 0.720197, 0.764482, 0.806053, 0.844483,
    0.879379, 0.910382, 0.937173, 0.959479, 0.977070, 0.989765,
    0.997435, 1.000000], np.float32)


def protune_look_lut() -> tuple[np.ndarray, int]:
    """(LUT, size): float32 (size^3, 3) array indexed
    (b*size^2 + g*size + r) like LoadCube64_3DLUT's flat layout."""
    size = 32
    c = _PROTUNE_CURVE
    # build order r,g,b with entries (curve[b], curve[g], curve[r]);
    # flat index r*size^2 + g*size + b
    lut = np.empty((size, size, size, 3), np.float32)
    r = np.arange(size)
    lut[..., 0] = c[r][None, None, :]            # reader's red = curve[r]
    lut[..., 1] = c[r][None, :, None]            # green = curve[g]
    lut[..., 2] = c[r][:, None, None]            # blue = curve[b]
    # reader indexes (b,g,r) over the builder's (r,g,b) loops; for this
    # separable fill both orders agree, so store in reader order (b,g,r)
    return lut.reshape(-1, 3), size


def build_raw_cube(lut: np.ndarray, lutsize: int,
                   cube_base: int = 6) -> np.ndarray:
    """BuildCube for the no-develop-change case (`Codec/bayer.c:4720`,
    `change == 0` branch): lattice coords rf = r/cube_depth (float32),
    trilinear float sample of the look LUT (LUTscale = size-1-1e-5,
    truncated source index, mix clamped to [-1, 4]), scaled by 8192.0f
    and truncated to int16.  Returns ((depth+1)^3, 3) int16 in
    (b, g, r) raster order (stride depth+1)."""
    f32 = np.float32
    depth = 1 << cube_base
    n = depth + 1
    coord = (np.arange(n, dtype=np.int32).astype(f32) / f32(depth))
    scale = f32(f32(lutsize - 1) - f32(0.00001))
    s = coord * scale
    src = s.astype(np.int32)
    src = np.clip(src, 0, lutsize - 2)
    mix = np.clip(s - src.astype(f32), f32(-1.0), f32(4.0))
    b_i, g_i, r_i = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                                indexing='ij')
    rs, gs, bs = src[r_i], src[g_i], src[b_i]
    rm, gm, bm = mix[r_i], mix[g_i], mix[b_i]
    L = lut.reshape(lutsize, lutsize, lutsize, 3)

    def at(db, dg, dr):
        return L[bs + db, gs + dg, rs + dr]

    rm = rm[..., None]
    gm = gm[..., None]
    bm = bm[..., None]
    one = f32(1.0)
    val = (((at(0, 0, 0) * (one - rm) + at(0, 0, 1) * rm) * (one - gm)
            + (at(0, 1, 0) * (one - rm) + at(0, 1, 1) * rm) * gm)
           * (one - bm)
           + ((at(1, 0, 0) * (one - rm) + at(1, 0, 1) * rm) * (one - gm)
              + (at(1, 1, 0) * (one - rm) + at(1, 1, 1) * rm) * gm) * bm
           ).astype(f32)
    q = np.trunc(val * f32(8192.0)).astype(np.int64)
    return np.clip(q, -32768, 32767).astype(np.int16).reshape(-1, 3)


def apply_raw_cube_wp13(buf13: np.ndarray, cube: np.ndarray,
                        cube_base: int = 6) -> np.ndarray:
    """ApplyActiveMetaData's RawCube integer trilinear on signed 13-bit
    WP13 values (`Codec/bayer.c:7849-7930`): v16 = clip(v13 << 3,
    0, 65535); idx = v16 >> (16-base), mix = low bits; nested integer
    lerps with an arithmetic >> (16-base) after every stage."""
    depth = (1 << cube_base) + 1
    shift = 16 - cube_base
    mask = (1 << shift) - 1
    c = cube.reshape(depth, depth, depth, 3).astype(np.int64)
    v16 = np.clip(buf13.astype(np.int64) << 3, 0, 65535)
    mix = v16 & mask
    idx = v16 >> shift
    mixd = mask + 1 - mix
    ri, gi, bi = idx[..., 0], idx[..., 1], idx[..., 2]
    rm, gm, bm = mix[..., 0], mix[..., 1], mix[..., 2]
    rmd, gmd, bmd = mixd[..., 0], mixd[..., 1], mixd[..., 2]
    out = np.empty_like(buf13, dtype=np.int64)
    for ch in range(3):
        def at(db, dg, dr):
            return c[bi + db, gi + dg, ri + dr, ch]
        lo = ((((at(0, 0, 0) * rmd + at(0, 0, 1) * rm) >> shift) * gmd
               + ((at(0, 1, 0) * rmd + at(0, 1, 1) * rm) >> shift) * gm)
              >> shift)
        hi = ((((at(1, 0, 0) * rmd + at(1, 0, 1) * rm) >> shift) * gmd
               + ((at(1, 1, 0) * rmd + at(1, 1, 1) * rm) >> shift) * gm)
              >> shift)
        out[..., ch] = (lo * bmd + hi * bm) >> shift
    return out


def apply_raw_cube_rgb16_1d(rgb16: np.ndarray, cube: np.ndarray,
                            cube_base: int = 6) -> np.ndarray:
    """ApplyActiveMetaData's RawCubeThree1Ds fast path for RAW decodes
    (`Codec/bayer.c:8350-8430`, interleaved 16-bit input): when
    TestCubeFor1Dness finds the cube separable, each channel is a 1D
    lerp between the cell entry and the all-dims+1 diagonal entry with
    a SINGLE >> (16-base): idx = v16 >> 10, mix = v16 & 0x3ff,
    out13_c = (cube[b,g,r][c]*(1024-mix_c) + cube[b+1,g+1,r+1][c]*mix_c)
    >> 10."""
    depth = (1 << cube_base) + 1
    shift = 16 - cube_base
    mask = (1 << shift) - 1
    c = cube.reshape(depth, depth, depth, 3).astype(np.int64)
    v = rgb16.astype(np.int64)
    mix = v & mask
    idx = v >> shift
    mixd = (mask + 1) - mix
    ri, gi, bi = idx[..., 0], idx[..., 1], idx[..., 2]
    lo = c[bi, gi, ri]            # (..., 3)
    hi = c[bi + 1, gi + 1, ri + 1]
    return (lo * mixd + hi * mix) >> shift


def cube_is_separable(cube: np.ndarray, cube_base: int = 6) -> bool:
    """TestCubeFor1Dness (`Codec/bayer.c:5555`): the cube is treated as
    three 1D curves when, over all interior cells, the red channel is
    constant along g/b, green along r/b, and blue along r/g."""
    depth = (1 << cube_base) + 1
    c = cube.reshape(depth, depth, depth, 3)
    r_ok = (c[:-1, :-1, :-1, 0] == c[:-1, 1:, :-1, 0]).all() and \
           (c[:-1, :-1, :-1, 0] == c[1:, :-1, :-1, 0]).all() and \
           (c[:-1, :-1, :-1, 0] == c[1:, 1:, :-1, 0]).all()
    g_ok = (c[:-1, :-1, :-1, 1] == c[:-1, :-1, 1:, 1]).all() and \
           (c[:-1, :-1, :-1, 1] == c[1:, :-1, :-1, 1]).all() and \
           (c[:-1, :-1, :-1, 1] == c[1:, :-1, 1:, 1]).all()
    b_ok = (c[:-1, :-1, :-1, 2] == c[:-1, :-1, 1:, 2]).all() and \
           (c[:-1, :-1, :-1, 2] == c[:-1, 1:, :-1, 2]).all() and \
           (c[:-1, :-1, :-1, 2] == c[:-1, 1:, 1:, 2]).all()
    return bool(r_ok and g_ok and b_ok)


def apply_raw_cube_rgb16_trilinear(rgb16: np.ndarray, cube: np.ndarray,
                                   cube_base: int = 6) -> np.ndarray:
    """Non-separable RawCube apply on interleaved 16-bit RAW-decode
    input (`Codec/bayer.c:8440+`): full integer trilinear with an
    arithmetic >> (16-base) after every lerp stage."""
    depth = (1 << cube_base) + 1
    shift = 16 - cube_base
    mask = (1 << shift) - 1
    c = cube.reshape(depth, depth, depth, 3).astype(np.int64)
    v = rgb16.astype(np.int64)
    mix = v & mask
    idx = v >> shift
    mixd = mask + 1 - mix
    ri, gi, bi = idx[..., 0], idx[..., 1], idx[..., 2]
    rm, gm, bm = mix[..., 0], mix[..., 1], mix[..., 2]
    rmd, gmd, bmd = mixd[..., 0], mixd[..., 1], mixd[..., 2]
    out = np.empty(v.shape, dtype=np.int64)
    for ch in range(3):
        def at(db, dg, dr):
            return c[bi + db, gi + dg, ri + dr, ch]
        lo = ((((at(0, 0, 0) * rmd + at(0, 0, 1) * rm) >> shift) * gmd
               + ((at(0, 1, 0) * rmd + at(0, 1, 1) * rm) >> shift) * gm)
              >> shift)
        hi = ((((at(1, 0, 0) * rmd + at(1, 0, 1) * rm) >> shift) * gmd
               + ((at(1, 1, 0) * rmd + at(1, 1, 1) * rm) >> shift) * gm)
              >> shift)
        out[..., ch] = (lo * bmd + hi * bm) >> shift
    return out


def _curve2lin_table(base: float = 90.0, depth: int = 64) -> np.ndarray:
    """ComputeCube's float curve2lin table (`Codec/bayer.c:6228-6268`):
    curve2lin[k] = log2lin(k/(depth-1), base) for k in 0..depth."""
    k = np.arange(depth + 1, dtype=np.float64)
    i = (k.astype(np.float32) / np.float32(depth - 1)).astype(np.float64)
    return ((np.power(base, i) - 1.0) / (base - 1.0)).astype(np.float32)


def _lin2curve_table(base: float = 90.0) -> np.ndarray:
    """lin2curve[j+512] = lin2log(j/512, base) for j in -512..2048
    (`bayer.c:6274-6310`), float32."""
    j = np.arange(-512, 2049, dtype=np.float64)
    i = (j.astype(np.float32) / np.float32(512.0)).astype(np.float64)
    with np.errstate(invalid="ignore"):
        pos = np.log10(i * (base - 1.0) + 1.0) / np.log10(base)
        neg = -np.log10(-i * (base - 1.0) + 1.0) / np.log10(base)
    return np.where(i >= 0.0, pos, neg).astype(np.float32)


def _calc_contrast(i: np.ndarray, cntrst: float) -> np.ndarray:
    """calc_contrast (`Common/AVIExtendedHeader.h:178`), double math."""
    i = i.astype(np.float64)
    p = (cntrst - 1.0) * 3.0 + 1.0 if cntrst >= 1.0 else cntrst
    b6 = np.float32(np.power(0.5, p)).astype(np.float64)
    b7 = np.float32(0.5 / b6).astype(np.float64)
    b8 = np.float32(1.0 - 1.0 / p if p > 1.0 else 1.0).astype(np.float64)
    neg = i * 100.0 * ((0.01 * (1 - b8)) + b8 * (np.power(0.01, p) * b7))
    lo = (i * (1 - b8)) + b8 * (np.power(np.abs(i), p) * b7)
    hi = (i * (1 - b8)) + b8 * (1 - np.power(np.abs(1 - i), p) * b7)
    above = 1 + (i - 1) * 100.0 * (
        1 - ((0.99 * (1 - b8)) + b8 * (1 - np.power(0.01, p) * b7)))
    out = np.where(i < 0.0, neg,
                   np.where(i < 0.5, lo, np.where(i <= 1.0, hi, above)))
    return out.astype(np.float32)


def _gammatweak_table(gamma: float, contrast: float = 1.0) -> np.ndarray:
    """BuildLUTCurves (`Codec/bayer.c:4746-4810`): per-channel gamma +
    contrast float table over j = -512..2048 (j/512 = -1..+4), values
    clamped to [-1, 4]; lin2gam uses the float-cast exponent and the
    linear negative extension (`AVIExtendedHeader.h:168`)."""
    j = np.arange(-512, 2049, dtype=np.float64) / 512.0
    exponent = np.float64(np.float32(1.0 / gamma))
    pos = np.power(np.abs(j), exponent)
    neg = j * 100.0 * np.power(0.01, exponent)
    v = np.where(j >= 0.0, pos, neg).astype(np.float32)
    if contrast != 1.0:
        v = _calc_contrast(v, contrast)
    return np.clip(v, -1.0, 4.0).astype(np.float32)


def _lerp512(table: np.ndarray, v: np.ndarray) -> np.ndarray:
    """BuildCube's table interpolation: entry = (int)(v*512)+512 (trunc
    toward zero), mix = v*512+512 - entry, lerp table[entry..entry+1]."""
    f32 = np.float32
    s = (v * f32(512.0)).astype(np.float32)
    entry = np.trunc(s).astype(np.int64) + 512
    mix = ((s + f32(512.0)) - entry.astype(np.float32)).astype(np.float32)
    entry = np.clip(entry, 0, table.size - 2)
    return (table[entry] * (f32(1.0) - mix)
            + table[entry + 1] * mix).astype(np.float32)


def build_raw_cube_developed(m: np.ndarray | None,
                             rgb_gamma=(1.0, 1.0, 1.0),
                             contrast: float = 1.0,
                             lut: np.ndarray | None = None,
                             lutsize: int = 0,
                             curve_base: float = 90.0,
                             cube_base: int = 6) -> np.ndarray:
    """BuildCube's change==1 branch (`Codec/bayer.c:4720-5177`): fold
    the linear develop matrix, per-channel gamma/contrast tweaks, the
    encode/decode curves and the LOOK LUT into one RawCube.

    Per lattice point (float32 unless noted):
    - matrix non-unity: rs = curve2lin[idx] * (1 - 2/cube_depth); the
      negative-cross-term blend guards (`bayer.c:4818-4847`); rf =
      m[row] . (rs,gs,bs) + off.  Matrix unity: rf = curve2lin[idx].
    - clamp [-1, 4]; per-channel gammatweak 512-entry lerp when gamma
      or contrast non-unity; clamp; restore curve via the lin2curve
      512-entry lerp; optional LOOK LUT float trilinear
      (LUTscale = size-1-1e-5); RawCube = trunc(rf*8192) to int16."""
    f32 = np.float32
    depth = 1 << cube_base
    n = depth + 1
    c2l = _curve2lin_table(curve_base, depth)
    l2c = _lin2curve_table(curve_base)
    lin_non_unity = m is not None and (
        np.any(np.asarray(m, np.float32)[:, :3] != np.eye(3, dtype=np.float32))
        or np.any(np.asarray(m, np.float32)[:, 3]))
    cg_non_unity = (tuple(rgb_gamma) != (1.0, 1.0, 1.0)) or contrast != 1.0

    b_i, g_i, r_i = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                                indexing='ij')
    if lin_non_unity:
        mtx = np.asarray(m, np.float32).reshape(3, 4)
        scale = f32(f32(1.0) - f32(2.0) / f32(depth))
        rs = (c2l[r_i] * scale).astype(f32)
        gs = (c2l[g_i] * scale).astype(f32)
        bs = (c2l[b_i] * scale).astype(f32)

        def row(ri_, w0, w1, w2, off, own, other1, other2):
            full = (w0 * rs + w1 * gs + w2 * bs + off).astype(f32)
            # negative-cross-term guard: blend toward the diagonal-only
            # result when the cross terms push below -1 on a hot channel
            cross = {0: w1 * gs + w2 * bs, 1: w0 * rs + w2 * bs,
                     2: w0 * rs + w1 * gs}[ri_]
            ownv = (rs, gs, bs)[ri_]
            diag = ((w0, w1, w2)[ri_] * ownv + off).astype(f32)
            weight = ((f32(-1.0) - cross) * (ownv - f32(0.8))
                      * f32(5.0)).astype(f32)
            weight = np.minimum(weight, f32(1.0))
            guard = (cross < -1.0) & (ownv > f32(0.8))
            blend = (diag * weight + full * (f32(1.0) - weight)).astype(f32)
            return np.where(guard, blend, full).astype(f32)

        rf = row(0, mtx[0, 0], mtx[0, 1], mtx[0, 2], mtx[0, 3], rs, gs, bs)
        gf = row(1, mtx[1, 0], mtx[1, 1], mtx[1, 2], mtx[1, 3], gs, rs, bs)
        bf = row(2, mtx[2, 0], mtx[2, 1], mtx[2, 2], mtx[2, 3], bs, rs, gs)
    else:
        rf, gf, bf = c2l[r_i], c2l[g_i], c2l[b_i]

    rf = np.clip(rf, f32(-1.0), f32(4.0))
    gf = np.clip(gf, f32(-1.0), f32(4.0))
    bf = np.clip(bf, f32(-1.0), f32(4.0))

    if cg_non_unity:
        # per-channel guard: a unity-gamma channel SKIPS its lerp
        # entirely (`bayer.c:4953-4972`; its tweak table is never built)
        chans = [rf, gf, bf]
        for ci, g in enumerate(rgb_gamma):
            if g != 1.0 or contrast != 1.0:
                chans[ci] = _lerp512(_gammatweak_table(g, contrast),
                                     chans[ci])
        rf, gf, bf = chans

    rf = np.clip(rf, f32(-1.0), f32(4.0))
    gf = np.clip(gf, f32(-1.0), f32(4.0))
    bf = np.clip(bf, f32(-1.0), f32(4.0))
    rf = _lerp512(l2c, rf)
    gf = _lerp512(l2c, gf)
    bf = _lerp512(l2c, bf)

    if lut is not None:
        L = lut.reshape(lutsize, lutsize, lutsize, 3)
        scale = f32(f32(lutsize - 1) - f32(0.00001))

        def coord(v):
            s = (v * scale).astype(f32)
            src = np.clip(np.trunc(s).astype(np.int64), 0, lutsize - 2)
            mix = np.clip((s - src.astype(f32)).astype(f32),
                          f32(-1.0), f32(4.0))
            return src, mix

        rsrc, rm = coord(rf)
        gsrc, gm = coord(gf)
        bsrc, bm = coord(bf)
        one = f32(1.0)

        def at(db, dg, dr, ch):
            return L[bsrc + db, gsrc + dg, rsrc + dr, ch]

        out_ch = []
        for ch in range(3):
            val = (((at(0, 0, 0, ch) * (one - rm) + at(0, 0, 1, ch) * rm)
                    * (one - gm)
                    + (at(0, 1, 0, ch) * (one - rm) + at(0, 1, 1, ch) * rm)
                    * gm) * (one - bm)
                   + ((at(1, 0, 0, ch) * (one - rm) + at(1, 0, 1, ch) * rm)
                      * (one - gm)
                      + (at(1, 1, 0, ch) * (one - rm)
                         + at(1, 1, 1, ch) * rm) * gm) * bm).astype(f32)
            out_ch.append(val)
        rf, gf, bf = out_ch

    cube = np.stack([rf, gf, bf], axis=-1)
    q = np.trunc(cube.astype(f32) * f32(8192.0)).astype(np.int64)
    return np.clip(q, -32768, 32767).astype(np.int16).reshape(-1, 3)
