"""Quantization + cubic companding contract.

Dead-zone quantizer with "midpoint prequant" (reference
`Example/WaveletDemo/utils.c:29-131`, production `Codec/quantize.c`):

    multiplier = 65536 // q
    midpoint   = max(q // 2 - 1, 0)
    code       = sign(v) * (((|v| + midpoint) * multiplier) >> 16)

followed by cubic companding of the magnitude into an 8-bit code
(`utils.c:617-640`; production folds the inverse into the decoder FSM tables,
`Codec/codebooks.c` ScaleFSM, `_COMPANDING_MORE` in `Codec/vlc.h:33`):

    companded(i) = i + 3*i^3 / 2^16           (demo model, i in 0..255)

The forward table maps quantized magnitude (0..1024) -> 8-bit code, taking
the largest i whose companded value is <= mag (gaps filled with the previous
code).  The inverse maps code -> the largest magnitude with that code.
"""

from __future__ import annotations

import numpy as np


def quant_multiplier(q: int) -> int:
    """Fixed-point reciprocal used by the quantizer (`utils.c:93`)."""
    return (1 << 16) // q


def quant_midpoint(q: int) -> int:
    """Dead-zone midpoint offset (`utils.c:94-95`)."""
    return max((q >> 1) - 1, 0)


def build_companding_tables() -> tuple[np.ndarray, np.ndarray]:
    """Build forward/inverse cubic-companding tables.

    Mirrors `Example/WaveletDemo/utils.c:617-640` exactly:
      forward[mag] for mag in 0..1024 -> code in 0..256
      inverse[code] for code in 0..255 -> magnitude (largest mag w/ that code)

    Returns (forward, inverse) as int32 arrays of shape (1025,), (257,).
    """
    forward = np.zeros(1025, dtype=np.int32)
    for i in range(256):
        mag = i + (i * i * i * 3) // (256 * 256)
        if mag <= 1024:
            forward[mag] = i
    lastmag = 0
    for i in range(1025):
        if forward[i]:
            lastmag = forward[i]
        else:
            forward[i] = lastmag
    forward[1024] = 256  # overflow sentinel

    inverse = np.zeros(257, dtype=np.int32)
    for i in range(1024):
        inverse[forward[i]] = i
    return forward, inverse


def demo_quant_tables(bitdepth: int = 12) -> tuple[list[int], list[int]]:
    """Per-level (qh, qv, qd) quant divisors + lowpass prescale shifts.

    From `Example/WaveletDemo/wavelets.c:49-68`.  Returns
    (quant_subband flat list of 3 per level, prescale per level).
    """
    if bitdepth in (8, 9):
        return ([8, 8, 12, 16, 16, 12] + [48, 48, 24] * 5, [0, 0, 2, 2, 2, 2, 2])
    if bitdepth == 10:
        return ([24, 24, 36, 12, 12, 6] + [48, 48, 24] * 5, [0, 1, 2, 2, 2, 2, 2])
    if bitdepth == 11:
        return ([24, 24, 36, 24, 24, 36] + [48, 48, 24] * 5, [1, 2, 2, 2, 2, 2, 2])
    if bitdepth == 12:
        return ([48, 48, 72] + [48, 48, 24] * 6, [1, 2, 2, 2, 2, 2, 2])
    if bitdepth == 13:
        return ([48, 48, 72] + [48, 48, 24] * 6, [2, 2, 2, 2, 2, 2, 2])
    return ([48, 48, 72] + [48, 48, 24] * 6, [2, 2, 2, 2, 2, 2, 2])
