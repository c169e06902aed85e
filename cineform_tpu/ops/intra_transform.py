"""Production CFHD intra transform as JAX ops (bit-exact vs ref/intra.py).

TPU-first design notes:
- int32 elementwise adds/shifts on the VPU over batched planes (leading batch
  dims vectorize trivially); XLA fuses each DWT level into a few loops.
- Horizontal deinterleave via reshape (..., W/2, 2) (lane-friendly), vertical
  filters are sublane shifts.
- int16 saturation is explicit (`jnp.clip`) at every band store, matching
  the reference's `_mm_adds_epi16`/SATURATE semantics for in-range video.
- Quantizer divisors and prescale shifts are static Python ints, so the
  multiplier/midpoint constants fold into the compiled program.

Behavioral contract: the production SSE2 kernels
(`Codec/spatial.c:14122` FilterSpatialYUVQuant16s,
 `Codec/spatial.c:3669`  FilterHorizontalRow10bit16s,
 `Codec/quantize.c:1256` QuantizeRow16sTo16s,
 `Codec/InvertHorizontalStrip16s.c:1374/3770` inverse strips),
validated against the NumPy oracle in ref/intra.py which is itself validated
byte-exactly against the reference SDK.
"""

from __future__ import annotations

import jax.numpy as jnp

ROUNDING = 4


def sat16(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, -32768, 32767)


def wrap16(x: jnp.ndarray) -> jnp.ndarray:
    """Reinterpret as int16 (C short wraparound)."""
    return ((x + 32768) & 0xFFFF) - 32768


def _split_even_odd(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    shp = x.shape[:-1] + (x.shape[-1] // 2, 2)
    pairs = x.reshape(shp)
    return pairs[..., 0], pairs[..., 1]


def _interleave(even: jnp.ndarray, odd: jnp.ndarray) -> jnp.ndarray:
    out = jnp.stack([even, odd], axis=-1)
    return out.reshape(even.shape[:-1] + (even.shape[-1] * 2,))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def h26_forward(x: jnp.ndarray, prescale: int = 0,
                row0_prev: jnp.ndarray | None = None):
    """Horizontal production 2-6 forward along the last axis.

    prescale=2: per-tap (x+3)>>2 for the highpass, (x0+x1+3)>>2 lowpass
    (`FilterHorizontalRow10bit16s`).
    row0_prev: raw (..., 2) pixels preceding the first row in memory, for
    the narrow-row quirk below (a band-1 input is preceded by band 0)."""
    even, odd = _split_even_odd(x)
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
    first = (
        5 * pe[..., 0] - 11 * po[..., 0]
        + 4 * pe[..., 1] + 4 * po[..., 1]
        - pe[..., 2] - po[..., 2] + ROUNDING
    ) >> 3
    if x.shape[-1] <= 16:
        # Narrow-row quirk of the reference's SSE2 row filters
        # (`Codec/spatial.c:912-1016,3669-4001`): at width <= 16 the SIMD
        # main loop never runs, the true left-border highpass value is
        # dropped, and the scalar tail applies the CENTER filter at
        # column 0 whose input[-2..-1] overread lands on the previous
        # row's last two (prescaled) pixels; the first row and rows of
        # pad-pitched images see fresh-allocation zeros (see the host
        # twin in ref/intra._h26_forward, validated byte-exact vs the
        # reference at 64x48..144x96).
        prev = jnp.zeros_like(plow[..., 0])
        if x.shape[-1] % 8 == 0:
            prev = prev.at[..., 1:].set(plow[..., :-1, -1])
            if row0_prev is not None:
                p = row0_prev
                if prescale:
                    p = (p + ((1 << prescale) - 1)) >> prescale
                prev = prev.at[..., 0].set(p[..., 0] + p[..., 1])
        first = ((-prev + plow[..., 1] + ROUNDING) >> 3) + diff[..., 0]
    last = (
        11 * pe[..., -1] - 5 * po[..., -1]
        - 4 * po[..., -2] - 4 * pe[..., -2]
        + po[..., -3] + pe[..., -3] + ROUNDING
    ) >> 3
    high = jnp.concatenate([first[..., None], interior, last[..., None]], axis=-1)
    return sat16(low), sat16(high)


def v26_forward(x: jnp.ndarray):
    """Vertical production 2-6 forward along axis -2 (borders use the raw
    first/last six rows, `Codec/spatial.c:14266,9968`)."""
    even, odd = x[..., 0::2, :], x[..., 1::2, :]
    low = even + odd
    diff = even - odd
    interior = ((-low[..., :-2, :] + low[..., 2:, :] + ROUNDING) >> 3) + diff[..., 1:-1, :]
    first = (
        5 * x[..., 0:1, :] - 11 * x[..., 1:2, :]
        + 4 * x[..., 2:3, :] + 4 * x[..., 3:4, :]
        - x[..., 4:5, :] - x[..., 5:6, :] + ROUNDING
    ) >> 3
    last = (
        11 * x[..., -2:-1, :] - 5 * x[..., -1:, :]
        - 4 * x[..., -3:-2, :] - 4 * x[..., -4:-3, :]
        + x[..., -5:-4, :] + x[..., -6:-5, :] + ROUNDING
    ) >> 3
    high = jnp.concatenate([first, interior, last], axis=-2)
    return sat16(low), sat16(high)


def quantize(v: jnp.ndarray, q: int, midpoint_prequant: int = 2) -> jnp.ndarray:
    """Production quantizer (`Codec/quantize.c:1256`), q static."""
    if q <= 1:
        return v
    mult = (1 << 16) // q
    mid = q // midpoint_prequant
    if midpoint_prequant == 2 and mid:
        mid -= 1
    a = jnp.abs(v)
    mag = (((a + mid) & 0xFFFF) * mult) >> 16
    return jnp.sign(v) * mag


def _compand_mag(c: jnp.ndarray) -> jnp.ndarray:
    """Cubic companded magnitude: c + (c^3*768)>>24, rewritten shift-exact
    as (c^3*3)>>16 so it stays in int32 (`Codec/codebooks.c:1048`)."""
    return c + ((c * c * c * 3) >> 16)


def requantize_magnitude(m: jnp.ndarray) -> jnp.ndarray:
    """Quantized magnitude -> reconstructed magnitude after the encoder's
    cubic companding and the decoder's expansion (ScaleFSM), i.e.
    mag(max{code : mag(code) <= m}).

    Implemented as a branchless 8-bit binary search over the monotone
    companding curve — pure VPU arithmetic, no gathers (TPU gathers cost
    ~30 ms/frame for these plane sizes)."""
    c = jnp.zeros_like(m)
    for bit in (128, 64, 32, 16, 8, 4, 2, 1):
        t = c | bit
        c = jnp.where(_compand_mag(t) <= m, t, c)
    return _compand_mag(c)


def dequantize(codes: jnp.ndarray, q: int) -> jnp.ndarray:
    """FSM dequantization on device: clamp, compand+expand (arithmetic),
    then int16-wrapping multiply (`ScaleFSM` + `DeQuantFSM`,
    `Codec/decoder.c:20551`)."""
    mag = requantize_magnitude(jnp.abs(jnp.clip(codes, -1023, 1023)))
    v = jnp.sign(codes) * mag * q
    return ((v + 32768) & 0xFFFF) - 32768


def dwt2d_forward(x: jnp.ndarray, prescale: int = 0,
                  quant: tuple[int, int, int] | None = None,
                  row0_prev: jnp.ndarray | None = None):
    """One production 2D level; returns (LL, (LH, HL, HH))."""
    low, high = h26_forward(x, prescale, row0_prev)
    ll, hl = v26_forward(low)
    lh, hh = v26_forward(high)
    if quant is not None:
        lh = quantize(lh, quant[0])
        hl = quantize(hl, quant[1])
        hh = quantize(hh, quant[2])
    return ll, (lh, hl, hh)


def forward_channel(plane: jnp.ndarray, band_quant, prescale):
    """3-level intra forward; returns (lowpass, [(LH, HL, HH)] finest first)."""
    ll = plane
    bands = []
    for k in range(3):
        ll, highs = dwt2d_forward(ll, prescale[k], tuple(band_quant[k]))
        bands.append(highs)
    return ll, bands


# ---------------------------------------------------------------------------
# Inverse
# ---------------------------------------------------------------------------

def v26_inverse(low: jnp.ndarray, high: jnp.ndarray) -> jnp.ndarray:
    te = (low[..., :-2, :] - low[..., 2:, :] + ROUNDING) >> 3
    to = (-low[..., :-2, :] + low[..., 2:, :] + ROUNDING) >> 3
    even_i = (te + low[..., 1:-1, :] + high[..., 1:-1, :]) >> 1
    odd_i = (to + low[..., 1:-1, :] - high[..., 1:-1, :]) >> 1
    t0e = (11 * low[..., 0:1, :] - 4 * low[..., 1:2, :] + low[..., 2:3, :] + ROUNDING) >> 3
    t0o = (5 * low[..., 0:1, :] + 4 * low[..., 1:2, :] - low[..., 2:3, :] + ROUNDING) >> 3
    even_f = (t0e + high[..., 0:1, :]) >> 1
    odd_f = (t0o - high[..., 0:1, :]) >> 1
    tke = (5 * low[..., -1:, :] + 4 * low[..., -2:-1, :] - low[..., -3:-2, :] + ROUNDING) >> 3
    tko = (11 * low[..., -1:, :] - 4 * low[..., -2:-1, :] + low[..., -3:-2, :] + ROUNDING) >> 3
    even_l = (tke + high[..., -1:, :]) >> 1
    odd_l = (tko - high[..., -1:, :]) >> 1
    even = sat16(jnp.concatenate([even_f, even_i, even_l], axis=-2))
    odd = sat16(jnp.concatenate([odd_f, odd_i, odd_l], axis=-2))
    out = jnp.stack([even, odd], axis=-2)  # (..., half, 2, W)
    return out.reshape(even.shape[:-2] + (even.shape[-2] * 2,) + even.shape[-1:])


def _h26_inverse_parts(low: jnp.ndarray, high: jnp.ndarray):
    """Shared horizontal inverse terms (before descale/output handling)."""
    te = (low[..., :-2] - low[..., 2:] + ROUNDING) >> 3
    to = (-low[..., :-2] + low[..., 2:] + ROUNDING) >> 3
    even_i = te + low[..., 1:-1] + high[..., 1:-1]
    odd_i = to + low[..., 1:-1] - high[..., 1:-1]
    t0e = (11 * low[..., 0] - 4 * low[..., 1] + low[..., 2] + ROUNDING) >> 3
    t0o = (5 * low[..., 0] + 4 * low[..., 1] - low[..., 2] + ROUNDING) >> 3
    even_f = t0e + high[..., 0]
    odd_f = t0o - high[..., 0]
    tke = (5 * low[..., -1] + 4 * low[..., -2] - low[..., -3] + ROUNDING) >> 3
    tko = (11 * low[..., -1] - 4 * low[..., -2] + low[..., -3] + ROUNDING) >> 3
    even_l = tke + high[..., -1]
    odd_l = tko - high[..., -1]
    even = jnp.concatenate([even_f[..., None], even_i, even_l[..., None]], -1)
    odd = jnp.concatenate([odd_f[..., None], odd_i, odd_l[..., None]], -1)
    return even, odd


def h26_inverse(low: jnp.ndarray, high: jnp.ndarray, descale: int = 1) -> jnp.ndarray:
    """Horizontal inverse; descale=2 keeps the extra bit (<<1 instead of >>1,
    `InvertHorizontalStripDescale16s`)."""
    even, odd = _h26_inverse_parts(low, high)
    if descale == 2:
        even, odd = even << 1, odd << 1
    else:
        even, odd = even >> 1, odd >> 1
    return _interleave(sat16(even), sat16(odd))


def expand_dither_rows(row_draws: jnp.ndarray, width: int,
                       group: int | None = None) -> jnp.ndarray:
    """Device-side decode_dither_plane (ref/intra.py:615): expand the
    (H, 16) per-row draw vectors to an (H, width) int32 plane.  The SSE
    lane pattern `m%8 + 8*((m//8)%2)` is periodic with period 16, so the
    expansion is a tile; the four border columns (and, when the width
    leaves a half-step remainder of `group`, the final `group` columns —
    the reference's undithered scalar tail) are zero.

    Jitted decode programs embed only the (H, 16) draws as a constant
    (~17 KB at 1080p); baking the expanded planes produced ~33 MB MLIR
    programs that hung this environment's AOT compilers."""
    h = row_draws.shape[0]
    reps = -(-(width - 4) // 16)
    mid = jnp.tile(row_draws.astype(jnp.int32), (1, reps))[:, :width - 4]
    z2 = jnp.zeros((h, 2), jnp.int32)
    d = jnp.concatenate([z2, mid, z2], axis=1)
    if group and width % (2 * group) == group:
        d = d.at[:, width - group:].set(0)
    return d


def h26_inverse_to_output(low: jnp.ndarray, high: jnp.ndarray,
                          descale_shift: int = 2,
                          dither: jnp.ndarray | None = None) -> jnp.ndarray:
    """Final horizontal inverse fused with 8-bit output conversion
    (`InvertHorizontalStrip16s.c:3770`), byte-exact vs the reference:
    interior (max(6tap±high, 0) + 3 + 2*dither) >> 3 with dither in {0,1}
    (ref/intra.decode_dither_rows replicates the reference's glibc rand
    stream); borders (6tap±high + 3) >> 3, undithered."""
    total = descale_shift + 1
    bias = (1 << (total - 1)) - 1
    te = (low[..., :-2] - low[..., 2:] + ROUNDING) >> 3
    to = (-low[..., :-2] + low[..., 2:] + ROUNDING) >> 3

    # exact int16 SSE lane semantics incl. the +2048 adds/subs_epu16 wrap
    # for sums below -2048 (mirrors ref/intra.h26_inverse_to_output)
    def _sse_lane(t, sign, d):
        e1 = sat16(t + low[..., 1:-1] + bias)
        x = sat16(sat16(e1 + 2048) + sign * high[..., 1:-1])
        u = x & 0xFFFF
        y = jnp.where(u >= 2048, u - 2048, 0)
        s = wrap16(y) >> 1
        t8 = sat16(s + d)
        return jnp.clip(wrap16((t8 & 0xFFFF) >> descale_shift), 0, 255)

    de = dither[..., 0::2][..., 1:-1] if dither is not None else 0
    do = dither[..., 1::2][..., 1:-1] if dither is not None else 0
    even_i = _sse_lane(te, +1, de)
    odd_i = _sse_lane(to, -1, do)
    t0e = (11 * low[..., 0] - 4 * low[..., 1] + low[..., 2] + ROUNDING) >> 3
    t0o = (5 * low[..., 0] + 4 * low[..., 1] - low[..., 2] + ROUNDING) >> 3
    even_f = ((t0e + high[..., 0] + bias) >> total)[..., None]
    odd_f = ((t0o - high[..., 0] + bias) >> total)[..., None]
    tke = (5 * low[..., -1] + 4 * low[..., -2] - low[..., -3] + ROUNDING) >> 3
    tko = (11 * low[..., -1] - 4 * low[..., -2] + low[..., -3] + ROUNDING) >> 3
    even_l = ((tke + high[..., -1] + bias) >> total)[..., None]
    odd_l = ((tko - high[..., -1] + bias) >> total)[..., None]
    even = jnp.concatenate([even_f, even_i, even_l], -1)
    odd = jnp.concatenate([odd_f, odd_i, odd_l], -1)
    out = _interleave(even, odd)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def v26_inverse_shifted_bottom(low: jnp.ndarray,
                               high: jnp.ndarray) -> jnp.ndarray:
    """v26_inverse with the bottom border taps one row STALE
    (`InvertSpatialQuantOverflowProtected16s` advances its lowpass
    pointer past its border filter, `Codec/spatial.c:21114+690`); device
    twin of ref/intra.v26_inverse_shifted_bottom — the GOP w5/w3 pyramid
    inverse applies this to the (ll, hl) vertical pair only."""
    out = v26_inverse(low, high)
    tke = (5 * low[..., -2, :] + 4 * low[..., -3, :]
           - low[..., -4, :] + ROUNDING) >> 3
    tko = (11 * low[..., -2, :] - 4 * low[..., -3, :]
           + low[..., -4, :] + ROUNDING) >> 3
    last2 = jnp.stack([sat16((tke + high[..., -1, :]) >> 1),
                       sat16((tko - high[..., -1, :]) >> 1)], axis=-2)
    return jnp.concatenate([out[..., :-2, :], last2], axis=-2)


def dwt2d_inverse(ll, lh, hl, hh, descale: int = 1,
                  bottom_shift: bool = False) -> jnp.ndarray:
    v26 = v26_inverse_shifted_bottom if bottom_shift else v26_inverse
    low = v26(ll, hl)
    high = v26_inverse(lh, hh)
    return h26_inverse(low, high, descale)


def inverse_channel_to_8bit(lowpass, bands, prescale, dither=None):
    """Full 3-level inverse producing the 8-bit output plane."""
    ll = lowpass
    for k in (2, 1):
        lh, hl, hh = bands[k]
        ll = dwt2d_inverse(ll, lh, hl, hh, 2 if prescale[k] == 2 else 1)
    lh, hl, hh = bands[0]
    low = v26_inverse(ll, hl)
    high = v26_inverse(lh, hh)
    return h26_inverse_to_output(low, high, dither=dither)


# ---------------------------------------------------------------------------
# YUY2 unpack / pack (device side)
# ---------------------------------------------------------------------------

def unpack_yuy2(frame: jnp.ndarray, precision: int = 10):
    """(..., H, 2W) uint8 YUY2 -> (Y, V, U) int32 planes at `precision` bits.

    Channel order Y, V(Cr), U(Cb) matches `UnpackRowYUV16s`
    (`Codec/convert.c:5222-5284`)."""
    h = frame.shape[-2]
    w2 = frame.shape[-1]
    quad = frame.reshape(frame.shape[:-2] + (h, w2 // 4, 4)).astype(jnp.int32)
    shift = precision - 8
    y = quad[..., (0, 2)].reshape(frame.shape[:-2] + (h, w2 // 2)) << shift
    u = quad[..., 1] << shift
    v = quad[..., 3] << shift
    return y, v, u


def pack_yuy2(y: jnp.ndarray, v: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """8-bit (Y, V, U) planes -> (..., H, 2W) uint8 YUY2."""
    h, w = y.shape[-2], y.shape[-1]
    quad = jnp.stack([y[..., 0::2], u, y[..., 1::2], v], axis=-1)
    return quad.reshape(y.shape[:-2] + (h, 2 * w)).astype(jnp.uint8)


def unpack_uyvy(frame: jnp.ndarray, precision: int = 10):
    """(..., H, 2W) uint8 2vuy/UYVY (U Y0 V Y1) -> (Y, V, U) planes.

    Device twin of `ref.intra.unpack_uyvy` (`Codec/convert.c:5310`)."""
    h = frame.shape[-2]
    w2 = frame.shape[-1]
    quad = frame.reshape(frame.shape[:-2] + (h, w2 // 4, 4)).astype(jnp.int32)
    shift = precision - 8
    y = quad[..., (1, 3)].reshape(frame.shape[:-2] + (h, w2 // 2)) << shift
    u = quad[..., 0] << shift
    v = quad[..., 2] << shift
    return y, v, u


def unpack_yu64(frame: jnp.ndarray):
    """(..., H, 4W) uint8 little-endian YU64 (16-bit 4:2:2, pairs
    [Y0 C1 Y1 C2]) -> 10-bit (Y, C1, C2) planes.

    Device twin of `ref.intra.unpack_yu64` (`Codec/frame.c:1556`)."""
    h = frame.shape[-2]
    w4 = frame.shape[-1]
    b = frame.reshape(frame.shape[:-2] + (h, w4 // 8, 4, 2)).astype(jnp.int32)
    u16 = b[..., 0] | (b[..., 1] << 8)            # (..., H, W/2, 4)
    y = u16[..., (0, 2)].reshape(frame.shape[:-2] + (h, w4 // 4)) >> 6
    c1 = u16[..., 1] >> 6
    c2 = u16[..., 3] >> 6
    return y, c1, c2


def unpack_v210(frame: jnp.ndarray, width: int):
    """(..., H, pitch) uint8 v210 rows -> 10-bit (Y, Cr, Cb) planes.

    Device twin of `ref.intra.unpack_v210` (`Codec/convert.c:3968`,
    including the cross-wired u/v outputs).  Requires width % 48 == 0 so
    the reference's scalar-tail Cr-lag quirk has no columns to affect
    (the host path handles ragged widths)."""
    assert width % 48 == 0, "device v210 unpack needs width % 48 == 0"
    h = frame.shape[-2]
    pitch = frame.shape[-1]
    ngroups = width // 6
    b = frame.reshape(frame.shape[:-2] + (h, pitch // 4, 4)).astype(jnp.int32)
    w32 = b[..., 0] | (b[..., 1] << 8) | (b[..., 2] << 16) | (b[..., 3] << 24)
    g = w32[..., :4 * ngroups].reshape(frame.shape[:-2] + (h, ngroups, 4))
    s0 = g & 0x3FF
    s1 = (g >> 10) & 0x3FF
    s2 = (g >> 20) & 0x3FF
    y = jnp.stack([s1[..., 0], s0[..., 1], s2[..., 1],
                   s1[..., 2], s0[..., 3], s2[..., 3]], axis=-1)
    cb = jnp.stack([s0[..., 0], s1[..., 1], s2[..., 2]], axis=-1)
    cr = jnp.stack([s2[..., 0], s0[..., 2], s1[..., 3]], axis=-1)
    lead = frame.shape[:-2]
    y = y.reshape(lead + (h, 6 * ngroups))[..., :width]
    cb = cb.reshape(lead + (h, 3 * ngroups))[..., :width // 2]
    cr = cr.reshape(lead + (h, 3 * ngroups))[..., :width // 2]
    return y, cr, cb


def _le16(frame: jnp.ndarray, last: int) -> jnp.ndarray:
    """(..., H, 2*N) uint8 -> (..., H, N/last, last) int32 little-endian u16."""
    h = frame.shape[-2]
    n = frame.shape[-1] // 2
    b = frame.reshape(frame.shape[:-2] + (h, n // last, last, 2)).astype(jnp.int32)
    return b[..., 0] | (b[..., 1] << 8)


def unpack_rg48(frame: jnp.ndarray):
    """(..., H, 6W) uint8 RG48 (16-bit RGB LE) -> 12-bit planes [G, R, B].

    Device twin of `ref.intra.unpack_rg48` (`Codec/frame.c:5968`
    ConvertRGB48ToFrame16s; G/R/B channel order pinned vs golden)."""
    px = _le16(frame, 3)                       # (..., H, W, 3)
    return px[..., 1] >> 4, px[..., 0] >> 4, px[..., 2] >> 4


def _alpha_companding(a12: jnp.ndarray) -> jnp.ndarray:
    """Encode-side alpha step curve (`Codec/frame.c:6699-6706`)."""
    return jnp.where((a12 > 0) & (a12 < 4095),
                     ((a12 * 223 + 128) >> 8) + 256, a12)


def unpack_b64a(frame: jnp.ndarray):
    """(..., H, 8W) uint8 b64a (16-bit ARGB, read native-LE without the
    nominal byte swap) -> 12-bit planes [G, R, B, A] with the alpha
    step curve (`ConvertBGRA64ToFrame_4444_16s`, `Codec/frame.c:6569`)."""
    px = _le16(frame, 4)                       # (..., H, W, 4)
    a = _alpha_companding(px[..., 0] >> 4)
    return px[..., 2] >> 4, px[..., 1] >> 4, px[..., 3] >> 4, a


def unpack_rg64(frame: jnp.ndarray):
    """(..., H, 8W) uint8 RG64 (16-bit RGBA LE) -> 12-bit [G, R, B, A]
    with the b64a alpha companding (`ref.intra.unpack_rg64`)."""
    px = _le16(frame, 4)
    return (px[..., 1] >> 4, px[..., 0] >> 4, px[..., 2] >> 4,
            _alpha_companding(px[..., 3] >> 4))


def _bayer_planes(r, g1, g2, b, log_curve: bool):
    """Quadrant components -> [G, RG, BG, DG] 12-bit difference planes
    (`ConvertBYR4ToFrame16s` `Codec/frame.c:4993` with the LOG-90 curve
    applied upstream; `ConvertBYR5ToFrame16s` `frame.c:5473` linear)."""
    g = (g1 + g2) >> 1
    if log_curve:
        rg = ((r - g) >> 1) + 2048
        bg = ((b - g) >> 1) + 2048
    else:
        rg = (r - g + 4096) >> 1
        bg = (b - g + 4096) >> 1
    dg = (g1 - g2 + 4096) >> 1
    return g, rg, bg, dg


def _bayer_order(q00, q01, q10, q11, bayer_format: int):
    if bayer_format == 0:      # RED_GRN
        return q00, q01, q10, q11
    if bayer_format == 1:      # GRN_RED
        return q01, q00, q11, q10
    if bayer_format == 2:      # GRN_BLU
        return q10, q00, q11, q01
    return q11, q01, q10, q00  # BLU_GRN


def unpack_byr4(frame: jnp.ndarray, log_lut: jnp.ndarray,
                bayer_format: int = 0):
    """(..., H, 2W) uint8 BYR4 (16-bit Bayer mosaic LE) -> quarter-res
    12-bit planes [G, RG, BG, DG] after the LOG-90 encode curve
    (`ConvertBYR4ToFrame16s` `Codec/frame.c:4993`; log_lut is the
    host-built 14-bit `ref.intra.byr4_log90_curve` table)."""
    h = frame.shape[-2]
    w = frame.shape[-1] // 2
    b = frame.reshape(frame.shape[:-2] + (h, w, 2)).astype(jnp.int32)
    mosaic = (b[..., 0] | (b[..., 1] << 8)) >> 2
    m = jnp.take(log_lut, mosaic)
    q00, q01 = m[..., 0::2, 0::2], m[..., 0::2, 1::2]
    q10, q11 = m[..., 1::2, 0::2], m[..., 1::2, 1::2]
    r, g1, g2, bl = _bayer_order(q00, q01, q10, q11, bayer_format)
    return _bayer_planes(r, g1, g2, bl, log_curve=True)


def unpack_byr5(frame: jnp.ndarray, bayer_format: int = 0):
    """(..., H, 3W/2) uint8 BYR5 (packed 12-bit Bayer: per quarter-res
    row the four component rows' high bytes, then 4-bit remainders two
    per byte low-nibble-first) -> quarter-res 12-bit [G, RG, BG, DG]
    (`ConvertBYR5ToFrame16s`, `Codec/frame.c:5473`; linear, no curve)."""
    h2 = frame.shape[-2]          # input passed as (..., H/2, rowbytes)
    rb = frame.shape[-1]
    wc = rb // 6
    rows = frame.astype(jnp.int32)
    high = rows[..., :4 * wc]
    nib = rows[..., 4 * wc:6 * wc]
    low = jnp.stack([nib & 0xF, (nib >> 4) & 0xF], axis=-1)
    low = low.reshape(low.shape[:-2] + (4 * wc,))
    v = (high << 4) | low
    comp = [v[..., i * wc:(i + 1) * wc] for i in range(4)]
    if bayer_format == 0:
        r, g1, g2, b = comp
    elif bayer_format == 1:
        g1, r, b, g2 = comp
    elif bayer_format == 2:
        g1, b, r, g2 = comp
    else:
        b, g1, g2, r = comp
    return _bayer_planes(r, g1, g2, b, log_curve=False)


def inverse_channel_strips(lowpass, bands, prescale):
    """Full 3-level inverse stopping at the final v26 vertical stage:
    returns the (low, high) strips the fused 8-bit output kernels
    consume (`InvertHorizontalStrip*`)."""
    ll = lowpass
    for k in (2, 1):
        lh, hl, hh = bands[k]
        ll = dwt2d_inverse(ll, lh, hl, hh, 2 if prescale[k] == 2 else 1)
    lh, hl, hh = bands[0]
    return v26_inverse(ll, hl), v26_inverse(lh, hh)


def h26_inverse_to_row16u(low: jnp.ndarray, high: jnp.ndarray,
                          precision: int = 10) -> jnp.ndarray:
    """Final horizontal 2-6 inverse for the DEEP output paths — the
    device port of ref.intra.h26_inverse_to_row16u, byte-exact vs
    `InvertHorizontalStrip16sToRow16u`
    (`Codec/InvertHorizontalStrip16s.c:16571`): SSE lanes clamp the
    reconstruction to [0, 2*2^precision-1] before >>1<<shift; the scalar
    tail (columns >= tail0) shifts first and saturates the 16-bit store.
    Accepts batched (..., H, half) strips; returns (..., H, 2*half)
    int32 rows holding uint16 values."""
    rnd = 4
    low = low.astype(jnp.int32)
    high = high.astype(jnp.int32)
    te = (low[..., :-2] - low[..., 2:] + rnd) >> 3
    to = (-low[..., :-2] + low[..., 2:] + rnd) >> 3
    even_i = te + low[..., 1:-1] + high[..., 1:-1]
    odd_i = to + low[..., 1:-1] - high[..., 1:-1]
    t0e = (11 * low[..., 0] - 4 * low[..., 1] + low[..., 2] + rnd) >> 3
    t0o = (5 * low[..., 0] + 4 * low[..., 1] - low[..., 2] + rnd) >> 3
    tke = (5 * low[..., -1] + 4 * low[..., -2] - low[..., -3] + rnd) >> 3
    tko = (11 * low[..., -1] - 4 * low[..., -2] + low[..., -3] + rnd) >> 3
    even = jnp.concatenate([(t0e + high[..., 0])[..., None], even_i,
                            (tke + high[..., -1])[..., None]], -1)
    odd = jnp.concatenate([(t0o - high[..., 0])[..., None], odd_i,
                           (tko - high[..., -1])[..., None]], -1)
    lim = (2 << precision) - 1
    shift = 16 - precision
    half = low.shape[-1]
    sse_e = jnp.clip(even, 0, lim) >> 1 << shift
    sse_o = jnp.clip(odd, 0, lim) >> 1 << shift
    scl_e = jnp.clip((even >> 1) << shift, 0, 65535)
    scl_o = jnp.clip((odd >> 1) << shift, 0, 65535)
    tail0 = (half - (half % 8) - 9) if half >= 16 else 2
    col = jnp.arange(half)
    scalar = col >= tail0
    scalar = scalar.at[0].set(False)   # left border stays the SSE lane
    e = jnp.where(scalar, scl_e, sse_e)
    o = jnp.where(scalar, scl_o, sse_o)
    return _interleave(e, o)
