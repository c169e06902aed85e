"""Bit-exact NumPy model of the CineForm transform + quantization math.

This is the framework's golden oracle: every JAX/Pallas kernel must match
these functions coefficient-for-coefficient.  The behavioral contract is the
reference's educational scalar model (`Example/WaveletDemo/utils.c`,
`wavelets.c`), which the production SSE2 kernels (`Codec/spatial.c`)
implement identically.

All arrays are int32; shifts are arithmetic (match C on gcc/glibc).
"""

from __future__ import annotations

import numpy as np

from cineform_tpu.spec.wavelet import ROUNDING
from cineform_tpu.spec.quant import (
    build_companding_tables,
    quant_midpoint,
    quant_multiplier,
)

_I32 = np.int32


def _i32(x) -> np.ndarray:
    return np.asarray(x, dtype=_I32)


# ---------------------------------------------------------------------------
# 2-6 wavelet, horizontal (rows). Input (h, w) w even, w >= 6.
# ---------------------------------------------------------------------------

def h26_forward(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward horizontal 2-6 DWT (`utils.c:251-282`). Returns (low, high)."""
    x = _i32(x)
    even, odd = x[:, 0::2], x[:, 1::2]
    low = even + odd
    diff = even - odd
    half = low.shape[1]
    high = np.empty_like(low)
    # interior k = 1..half-2: ((-low[k-1] + low[k+1] + 4) >> 3) + diff[k]
    high[:, 1:-1] = ((-low[:, :-2] + low[:, 2:] + ROUNDING) >> 3) + diff[:, 1:-1]
    # first edge (utils.c:264-266)
    high[:, 0] = (
        5 * even[:, 0] - 11 * odd[:, 0]
        + 4 * even[:, 1] + 4 * odd[:, 1]
        - even[:, 2] - odd[:, 2] + ROUNDING
    ) >> 3
    # last edge (utils.c:276-278)
    k = half - 1
    high[:, k] = (
        11 * even[:, k] - 5 * odd[:, k]
        - 4 * odd[:, k - 1] - 4 * even[:, k - 1]
        + odd[:, k - 2] + even[:, k - 2] + ROUNDING
    ) >> 3
    return low, high


# NOTE on the inverse interior: `utils.c:301-302` computes the even and odd
# rounding terms independently —
#   even: ((L[k-1]-L[k+1]+4)>>3) + L[k] + H[k], all >> 1
#   odd:  ((-L[k-1]+L[k+1]+4)>>3) + L[k] - H[k], all >> 1
# Arithmetic shifts don't commute with negation, so both terms must be
# computed with their own >>3 for bit-exactness.
def h26_inverse(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Bit-exact inverse horizontal 2-6 DWT (`utils.c:285-311`)."""
    low, high = _i32(low), _i32(high)
    h, half = low.shape
    even = np.empty_like(low)
    odd = np.empty_like(low)
    te = (low[:, :-2] - low[:, 2:] + ROUNDING) >> 3
    to = (-low[:, :-2] + low[:, 2:] + ROUNDING) >> 3
    even[:, 1:-1] = (te + low[:, 1:-1] + high[:, 1:-1]) >> 1
    odd[:, 1:-1] = (to + low[:, 1:-1] - high[:, 1:-1]) >> 1
    t0e = (11 * low[:, 0] - 4 * low[:, 1] + low[:, 2] + ROUNDING) >> 3
    t0o = (5 * low[:, 0] + 4 * low[:, 1] - low[:, 2] + ROUNDING) >> 3
    even[:, 0] = (t0e + high[:, 0]) >> 1
    odd[:, 0] = (t0o - high[:, 0]) >> 1
    k = half - 1
    tke = (5 * low[:, k] + 4 * low[:, k - 1] - low[:, k - 2] + ROUNDING) >> 3
    tko = (11 * low[:, k] - 4 * low[:, k - 1] + low[:, k - 2] + ROUNDING) >> 3
    even[:, k] = (tke + high[:, k]) >> 1
    odd[:, k] = (tko - high[:, k]) >> 1
    out = np.empty((h, half * 2), dtype=_I32)
    out[:, 0::2] = even
    out[:, 1::2] = odd
    return out


# ---------------------------------------------------------------------------
# Vertical variants: operate on columns; implement via transpose for clarity.
# ---------------------------------------------------------------------------

def v26_forward(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward vertical 2-6 DWT (`utils.c:330-366`)."""
    low_t, high_t = h26_forward(np.ascontiguousarray(_i32(x).T))
    return low_t.T, high_t.T


def v26_inverse(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Bit-exact inverse vertical 2-6 DWT (`utils.c:369-401`)."""
    return h26_inverse(
        np.ascontiguousarray(_i32(low).T), np.ascontiguousarray(_i32(high).T)
    ).T


def v22_forward(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward 2-2 Haar (temporal/interlaced) transform (`utils.c:210-227`)."""
    x = _i32(x)
    a, b = x[0::2, ...], x[1::2, ...]
    return a + b, a - b


def v22_inverse(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Inverse 2-2 Haar (`utils.c:229-247`, non-FIT8BIT branch)."""
    low, high = _i32(low), _i32(high)
    a = (low + high) >> 1
    b = (low - high) >> 1
    out = np.empty((low.shape[0] * 2,) + low.shape[1:], dtype=_I32)
    out[0::2], out[1::2] = a, b
    return out


# ---------------------------------------------------------------------------
# Quantization with cubic companding
# ---------------------------------------------------------------------------

_FWD_COMPAND, _INV_COMPAND = build_companding_tables()


def quantize_band(vals: np.ndarray, q: int, clamp255: bool = True) -> np.ndarray:
    """Dead-zone quantize + compand a highpass band (`utils.c:29-76`)."""
    v = _i32(vals)
    mult = quant_multiplier(q)
    mid = quant_midpoint(q)
    mag = ((np.abs(v) + mid).astype(np.int64) * mult) >> 16
    mag = mag.astype(_I32)
    sign = np.sign(v).astype(_I32)
    # saturate to the companding table's overflow sentinel
    over = mag > 1023
    mag = np.where(over, 1024, mag)
    code = _FWD_COMPAND[mag] * sign
    if clamp255:
        code = np.clip(code, -255, 255)
    return np.where(mag == 0, 0, code).astype(_I32)


def dequantize_band(codes: np.ndarray, q: int) -> np.ndarray:
    """Inverse compand + multiply by quantizer (`utils.c:134-156`)."""
    c = _i32(codes)
    sign = np.sign(c).astype(_I32)
    mag = _INV_COMPAND[np.abs(c)]
    return (mag * sign * _I32(q)).astype(_I32)


def prescale_lowpass(x: np.ndarray, shift: int) -> np.ndarray:
    """Scale lowpass between levels (`utils.c:405-422`).

    shift < 0: add rounding then arithmetic right shift; shift > 0: left shift.
    """
    x = _i32(x)
    if shift < 0:
        s = -shift
        return (x + (1 << (s - 1))) >> s
    return x << shift


# ---------------------------------------------------------------------------
# Full WaveletDemo model: LEVELS-level 2D transform + quant, and its inverse.
# Works on a packed in-place quadrant layout like the demo (`wavelets.c`).
# ---------------------------------------------------------------------------

def forward_pyramid(
    frame: np.ndarray,
    levels: int = 3,
    quant: list[int] | None = None,
    prescale: list[int] | None = None,
    bitdepth: int = 12,
) -> np.ndarray:
    """Forward LEVELS-level 2-6 DWT + quantization (`wavelets.c:205-231`).

    Returns the packed coefficient plane (same shape as input).
    """
    from cineform_tpu.spec.quant import demo_quant_tables

    dq, dp = demo_quant_tables(bitdepth)
    quant = dq if quant is None else quant
    prescale = dp if prescale is None else prescale

    buf = _i32(frame).copy()
    h, w = buf.shape
    regw, regh = w, h
    for level in range(levels):
        region = buf[:regh, :regw]
        low, high = h26_forward(region)
        tmp = np.concatenate([low, high], axis=1)
        lowv, highv = v26_forward(tmp)
        region[: regh // 2] = lowv
        region[regh // 2 :] = highv
        regw //= 2
        regh //= 2
        if quant is not False:
            qh, qv, qd = quant[level * 3 : level * 3 + 3]
            buf[:regh, regw : 2 * regw] = quantize_band(
                buf[:regh, regw : 2 * regw], qh
            )
            buf[regh : 2 * regh, :regw] = quantize_band(
                buf[regh : 2 * regh, :regw], qv
            )
            buf[regh : 2 * regh, regw : 2 * regw] = quantize_band(
                buf[regh : 2 * regh, regw : 2 * regw], qd
            )
        if level < levels - 1:
            buf[:regh, :regw] = prescale_lowpass(buf[:regh, :regw], -prescale[level])
    return buf


def inverse_pyramid(
    coeffs: np.ndarray,
    levels: int = 3,
    quant: list[int] | None = None,
    prescale: list[int] | None = None,
    bitdepth: int = 12,
    dc_offset: int | None = None,
) -> np.ndarray:
    """Inverse of `forward_pyramid` (`wavelets.c:242-269`)."""
    from cineform_tpu.spec.quant import demo_quant_tables

    dq, dp = demo_quant_tables(bitdepth)
    quant = dq if quant is None else quant
    prescale = dp if prescale is None else prescale
    if dc_offset is None:
        dc_offset = 64 >> (bitdepth - 8)  # `wavelets.c:78`

    buf = _i32(coeffs).copy()
    h, w = buf.shape
    regw, regh = w >> levels, h >> levels
    if dc_offset:
        buf[:regh, :regw] += dc_offset
    for level in range(levels - 1, -1, -1):
        if level < levels - 1:
            buf[:regh, :regw] = prescale_lowpass(buf[:regh, :regw], prescale[level])
        if quant is not False:
            qh, qv, qd = quant[level * 3 : level * 3 + 3]
            buf[:regh, regw : 2 * regw] = dequantize_band(
                buf[:regh, regw : 2 * regw], qh
            )
            buf[regh : 2 * regh, :regw] = dequantize_band(
                buf[regh : 2 * regh, :regw], qv
            )
            buf[regh : 2 * regh, regw : 2 * regw] = dequantize_band(
                buf[regh : 2 * regh, regw : 2 * regw], qd
            )
        region = buf[: 2 * regh, : 2 * regw]
        tmp = v26_inverse(region[:regh], region[regh:])
        out = h26_inverse(tmp[:, :regw], tmp[:, regw:])
        region[:, :] = out
        regw *= 2
        regh *= 2
    return np.clip(buf, 0, (1 << bitdepth) - 1)
