"""Dead-zone quantization + cubic companding as JAX ops.

TPU-first design: the reference implements companding as 1 KiB lookup tables
(`Example/WaveletDemo/utils.c:617-640`, folded into decoder FSM tables by
`Codec/codebooks.c` ScaleFSM).  Table gathers are expensive on the VPU, so we
compute the compander *arithmetically*: the forward map
    code(m) = max{ i : i + (3*i^3 >> 16) <= m }
is found with a short fixed-point iteration plus exact floor correction, and
the inverse map has the closed form
    inv(c) = min(mag(c+1) - 1, 1023),  mag(i) = i + (3*i^3 >> 16)
Both are validated exhaustively against the table in tests.

Quantizer contract (`utils.c:29-131`, production `Codec/quantize.c`):
    multiplier = 65536 // q ; midpoint = max(q//2 - 1, 0)
    mag  = ((|v| + midpoint) * multiplier) >> 16
"""

from __future__ import annotations

import jax.numpy as jnp

from cineform_tpu.spec.quant import quant_midpoint, quant_multiplier


def _compand_mag(i: jnp.ndarray) -> jnp.ndarray:
    """mag(i) = i + (3*i^3 >> 16) for i in [0, 257] (fits int32)."""
    return i + ((3 * i * i * i) >> 16)


def compand_forward(mag: jnp.ndarray) -> jnp.ndarray:
    """Quantized magnitude (0..1024) -> 8-bit companded code (0..256).

    Vectorized binary search for max{c : mag(c) <= m} over c in [0, 256]
    (9 compare steps; mag(0)=0 and mag(257)=1034 bound the search).
    """
    m = mag
    lo = jnp.zeros_like(m)
    hi = jnp.full_like(m, 257)
    for _ in range(9):  # 2^9 = 512 > 257
        mid = (lo + hi) >> 1
        ok = _compand_mag(mid) <= m
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
    return lo


def compand_inverse(code: jnp.ndarray) -> jnp.ndarray:
    """8-bit code -> magnitude (matches the reference's inverse table:
    largest magnitude that maps to the code)."""
    cp1 = code + 1
    return jnp.minimum(_compand_mag(cp1) - 1, 1023)


def quantize_band(vals: jnp.ndarray, q: int) -> jnp.ndarray:
    """Dead-zone quantize + compand; int32 in/out, codes in [-255, 255]."""
    if q == 1:
        # fast path: no dead zone, magnitude == |v|
        mag = jnp.abs(vals)
    else:
        mult = quant_multiplier(q)
        mid = quant_midpoint(q)
        mag = ((jnp.abs(vals) + mid) * mult) >> 16
    mag = jnp.minimum(mag, 1024)
    code = jnp.minimum(compand_forward(mag), 255)
    return jnp.where(vals < 0, -code, code)


def dequantize_band(codes: jnp.ndarray, q: int) -> jnp.ndarray:
    """Inverse compand then multiply by q (`utils.c:134-156`)."""
    mag = compand_inverse(jnp.abs(codes))
    mag = jnp.where(codes == 0, 0, mag)
    return jnp.where(codes < 0, -mag, mag) * q


def prescale_lowpass(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Lowpass inter-level scaling (`utils.c:405-422`)."""
    if shift == 0:
        return x
    if shift < 0:
        s = -shift
        return (x + (1 << (s - 1))) >> s
    return x << shift
