"""RAW development pipeline as JAX ops: the TPU re-expression of the
decoder's Active Metadata engine (`Codec/bayer.c`, `Codec/DemoasicFrames.cpp`).

The reference develops decoded Bayer channels on CPU worker threads:
demosaic (`DemosaicRAW` bayer.c:9339), white balance + color matrix + 1D
curves + 3D LUT fused into a cube table (`BuildCube`/`ComputeCube`
bayer.c:4720,5594, `ApplyActiveMetaData` bayer.c:7427), vignette/sharpen
(`FastSharpeningBlurVWP13` DemoasicFrames.cpp:1361) and scope rendering.

Here each stage is a batched jnp op over (..., H, W, C) float32 planes in
[0, 1]; XLA fuses the elementwise chain (white balance, matrix, curves)
into a single pass, and the 3D LUT is a vectorized trilinear gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Demosaic
# ---------------------------------------------------------------------------

def demosaic_bilinear(g: jnp.ndarray, rg: jnp.ndarray, bg: jnp.ndarray,
                      dg: jnp.ndarray) -> jnp.ndarray:
    """Bilinear demosaic of the CFHD Bayer channel set to full resolution.

    Inputs are the decoded quarter-res planes (12-bit ints or floats):
    G average, R-G/B-G differences (offset 2048, halved), G1-G2 difference.
    Mirrors the layout math of `DebayerLine` (`DemoasicFrames.cpp:88`) for
    the bilinear quality mode: reconstruct the four photosites per cell,
    then bilinearly interpolate each color plane to the mosaic grid.
    Returns (..., 2H, 2W, 3) linear RGB (same scale as G).
    """
    g = g.astype(jnp.float32)
    r = ((rg.astype(jnp.float32) - 2048.0) * 2.0) + g
    b = ((bg.astype(jnp.float32) - 2048.0) * 2.0) + g
    d = (dg.astype(jnp.float32) * 2.0) - 4096.0
    g1 = g + d / 2.0
    g2 = g - d / 2.0

    *lead, h, w = g.shape
    out = jnp.zeros((*lead, 2 * h, 2 * w, 3), jnp.float32)

    def up2(x):
        """Nearest-neighbour upsample to the mosaic grid."""
        x2 = jnp.repeat(x, 2, axis=-1)
        return jnp.repeat(x2, 2, axis=-2)

    # half-pixel-shifted bilinear interpolation of each color plane
    def bilerp(x):
        xp = jnp.pad(x, [(0, 0)] * len(lead) + [(1, 1), (1, 1)], mode="edge")
        c = xp[..., 1:-1, 1:-1]
        up = xp[..., :-2, 1:-1]
        dn = xp[..., 2:, 1:-1]
        lf = xp[..., 1:-1, :-2]
        rt = xp[..., 1:-1, 2:]
        ul = xp[..., :-2, :-2]
        ur = xp[..., :-2, 2:]
        dl = xp[..., 2:, :-2]
        dr = xp[..., 2:, 2:]
        # 2x2 phases: (0,0) on-site; others weighted neighbours
        p00 = c
        p01 = (c + rt) / 2
        p10 = (c + dn) / 2
        p11 = (c + rt + dn + dr) / 4
        out = jnp.stack([jnp.stack([p00, p01], axis=-1),
                         jnp.stack([p10, p11], axis=-1)], axis=-2)
        return out.transpose(*range(len(lead)), -4, -2, -3, -1).reshape(
            *lead, 2 * h, 2 * w)

    rr = bilerp(r)
    bb = bilerp(b)
    gg = up2((g1 + g2) / 2)
    return jnp.stack([rr, gg, bb], axis=-1) / 4095.0


# ---------------------------------------------------------------------------
# Active Metadata stages (float32 [0,1] RGB)
# ---------------------------------------------------------------------------

def white_balance(rgb: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """Per-channel gains (WBAL/WBRG tags, `bayer.c` ComputeCube)."""
    return rgb * jnp.asarray(gains, jnp.float32)


def color_matrix(rgb: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """3x3 (or 3x4 with offsets) color matrix (COLM tag).

    The matmul runs on the MXU when batched: (N, 3) @ (3, 3).
    """
    m = jnp.asarray(matrix, jnp.float32)
    out = jnp.einsum("...c,dc->...d", rgb, m[:, :3])
    if m.shape[1] == 4:
        out = out + m[:, 3]
    return out


def gamma_curve(rgb: jnp.ndarray, power: float = 1.0 / 2.2) -> jnp.ndarray:
    """Simple power-law display curve (GAMT tag family)."""
    return jnp.power(jnp.clip(rgb, 0.0, None), power)


def log_curve(rgb: jnp.ndarray, base: float = 90.0) -> jnp.ndarray:
    """Encode-curve companion (CURVE_LIN2LOG, AVIExtendedHeader.h:153)."""
    return jnp.log(jnp.clip(rgb, 0.0, None) * (base - 1.0) + 1.0) / jnp.log(base)


def apply_lut3d(rgb: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """Trilinear 3D LUT (the LOOK .look cube, `bayer.c:4720` BuildCube).

    lut: (N, N, N, 3) indexed [r][g][b].  Gathers vectorize on TPU; the
    reference builds a 17^3 cube and interpolates per pixel the same way.
    """
    n = lut.shape[0]
    x = jnp.clip(rgb, 0.0, 1.0) * (n - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
    f = x - i0
    r0, g0, b0 = i0[..., 0], i0[..., 1], i0[..., 2]
    fr, fg, fb = f[..., 0:1], f[..., 1:2], f[..., 2:3]

    def at(dr, dg, db):
        return lut[r0 + dr, g0 + dg, b0 + db]

    c00 = at(0, 0, 0) * (1 - fr) + at(1, 0, 0) * fr
    c01 = at(0, 0, 1) * (1 - fr) + at(1, 0, 1) * fr
    c10 = at(0, 1, 0) * (1 - fr) + at(1, 1, 0) * fr
    c11 = at(0, 1, 1) * (1 - fr) + at(1, 1, 1) * fr
    c0 = c00 * (1 - fg) + c10 * fg
    c1 = c01 * (1 - fg) + c11 * fg
    return c0 * (1 - fb) + c1 * fb


def vignette(rgb: jnp.ndarray, strength: float = 0.0) -> jnp.ndarray:
    """Radial gain falloff correction (`bayer.c` vignette tags)."""
    if strength == 0.0:
        return rgb
    *lead, h, w, _ = rgb.shape
    yy = (jnp.arange(h, dtype=jnp.float32) / (h - 1) - 0.5) * 2
    xx = (jnp.arange(w, dtype=jnp.float32) / (w - 1) - 0.5) * 2
    r2 = yy[:, None] ** 2 + xx[None, :] ** 2
    gain = 1.0 + strength * r2
    return rgb * gain[..., None]


def sharpen(rgb: jnp.ndarray, amount: float = 0.0) -> jnp.ndarray:
    """Unsharp mask with a 3x3 blur, the cheap equivalent of
    `FastSharpeningBlurVWP13` (`DemoasicFrames.cpp:1361`)."""
    if amount == 0.0:
        return rgb
    k = jnp.array([1.0, 2.0, 1.0], jnp.float32) / 4.0
    pad = [(0, 0)] * (rgb.ndim - 3) + [(1, 1), (0, 0), (0, 0)]
    xp = jnp.pad(rgb, pad, mode="edge")
    blur_v = xp[..., :-2, :, :] * k[0] + xp[..., 1:-1, :, :] * k[1] + xp[..., 2:, :, :] * k[2]
    pad = [(0, 0)] * (rgb.ndim - 3) + [(0, 0), (1, 1), (0, 0)]
    xp = jnp.pad(blur_v, pad, mode="edge")
    blur = xp[..., :, :-2, :] * k[0] + xp[..., :, 1:-1, :] * k[1] + xp[..., :, 2:, :] * k[2]
    return jnp.clip(rgb + amount * (rgb - blur), 0.0, 1.0)


# ---------------------------------------------------------------------------
# Scopes (histogram / waveform / vectorscope, `Codec/bayer.c` ToolsHandle)
# ---------------------------------------------------------------------------

def histogram(rgb: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """(3, bins) per-channel histogram (HistogramRender, draw.c:67)."""
    q = jnp.clip((rgb * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    out = []
    for c in range(3):
        out.append(jnp.zeros(bins, jnp.int32).at[q[..., c].ravel()].add(1))
    return jnp.stack(out)


def waveform(rgb: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """(W, bins) luma waveform: column histograms of Rec.709 luma."""
    luma = (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1] + 0.0722 * rgb[..., 2])
    q = jnp.clip((luma * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    w = q.shape[-1]
    cols = jnp.broadcast_to(jnp.arange(w), q.shape)
    flat = cols.ravel() * bins + q.ravel()
    return jnp.zeros(w * bins, jnp.int32).at[flat].add(1).reshape(w, bins)


def vectorscope(rgb: jnp.ndarray, bins: int = 128) -> jnp.ndarray:
    """(bins, bins) Cb/Cr occupancy map."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    cb = -0.1146 * r - 0.3854 * g + 0.5 * b
    cr = 0.5 * r - 0.4542 * g - 0.0458 * b
    qx = jnp.clip(((cb + 0.5) * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    qy = jnp.clip(((cr + 0.5) * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    flat = qy.ravel() * bins + qx.ravel()
    return jnp.zeros(bins * bins, jnp.int32).at[flat].add(1).reshape(bins, bins)


# ---------------------------------------------------------------------------
# Full develop step
# ---------------------------------------------------------------------------

def develop(g, rg, bg, dg, *, wb=(1.0, 1.0, 1.0), matrix=None, lut=None,
            gamma: float = 1.0, vignette_strength: float = 0.0,
            sharpen_amount: float = 0.0) -> jnp.ndarray:
    """Demosaic + the fused Active Metadata chain; returns float RGB [0,1].

    Mirrors `ApplyActiveMetaData` (`bayer.c:7427`): the reference folds
    wb/matrix/curves/LUT into one cube; under jit XLA fuses the same chain.
    """
    rgb = demosaic_bilinear(g, rg, bg, dg)
    rgb = white_balance(rgb, wb)
    if matrix is not None:
        rgb = color_matrix(rgb, matrix)
    if lut is not None:
        rgb = apply_lut3d(rgb, lut)
    if gamma != 1.0:
        rgb = gamma_curve(rgb, gamma)
    rgb = vignette(rgb, vignette_strength)
    rgb = sharpen(rgb, sharpen_amount)
    return jnp.clip(rgb, 0.0, 1.0)


def tools_scopes_wp13(rgb13: jnp.ndarray):
    """HistogramLine's WP13 tools collection, integer-exact
    (`Codec/decoder.c:6314-6400`; dispatched from PaintFrame ->
    DoHistogramWork, which the open-source release compiles OUT —
    `Codec/config.h:29` sets _GRAPHICS 0 — so this data path is spec
    dead code in the binary; re-expressed here as the live scopes
    backend, validated by a scalar unit-test oracle):

    - column step doubles until width/step <= 360 (waveformWidth)
    - R/G/B = clip(v13 >> 5, 0, 255); histR/G/B and per-column
      waveR/G/B counters
    - vectorscope U/V via the integer matrices
      U = ((-827R - 2769G + 3596B) >> 13) + 128,
      V = ((3596R - 3269G - 328B) >> 13) + 128 (clamped to [0,255]),
      accumulated into scopeUV[U][V]

    Returns (hist (3,256) i32, wave (wfw,3,256) i32,
    scope (256,256) i32, waveform_width)."""
    h, w, _ = rgb13.shape
    step = 1
    while w // step > 360:
        step *= 2
    wfw = w // step
    cols = jnp.arange(wfw) * step
    v = rgb13[:, cols, :].astype(jnp.int32)
    rgb8 = jnp.clip(v >> 5, 0, 255)
    r8, g8, b8 = rgb8[..., 0], rgb8[..., 1], rgb8[..., 2]
    hist = jnp.stack([
        jnp.zeros(256, jnp.int32).at[c.ravel()].add(1)
        for c in (r8, g8, b8)])
    pos = jnp.broadcast_to(jnp.arange(wfw)[None, :], r8.shape)
    wave = jnp.stack([
        jnp.zeros(wfw * 256, jnp.int32)
        .at[(pos * 256 + c).ravel()].add(1).reshape(wfw, 256)
        for c in (r8, g8, b8)], axis=1)
    u = jnp.clip(((-827 * r8 - 2769 * g8 + 3596 * b8) >> 13) + 128, 0, 255)
    vv = jnp.clip(((3596 * r8 - 3269 * g8 - 328 * b8) >> 13) + 128, 0, 255)
    scope = jnp.zeros(256 * 256, jnp.int32).at[
        (u * 256 + vv).ravel()].add(1).reshape(256, 256)
    return hist, wave, scope, wfw
