"""Multi-level transform pyramids (the codec's per-channel wavelet forest).

The intra-frame ("SPATIAL") transform is 3 chained 2D 2-6 levels per channel
(`Codec/encoder.c:8688` FinishFrameTransformQuant, tree layout documented in
SURVEY §3.3b): subbands 0 = deepest LL, then per level (LH, HL, HH) from
deepest to shallowest — 10 subbands per channel.

Subbands are kept as separate arrays (static shapes; XLA-friendly), not the
reference's packed in-place quadrant layout.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp

from cineform_tpu.ops import dwt, quant


class Pyramid(NamedTuple):
    """Quantized coefficient pyramid for one channel (intra transform).

    lowpass: deepest LL band (unquantized 16-bit, like the reference's raw
             lowpass subband 0, `Codec/encoder.c:4251`).
    highs:   tuple of (LH, HL, HH) triples, index 0 = deepest level.
    """

    lowpass: jnp.ndarray
    highs: tuple  # ((lh, hl, hh), ...) deepest first


def forward_intra(
    x: jnp.ndarray,
    levels: int,
    quant_table: Sequence[int],
    prescale: Sequence[int],
) -> Pyramid:
    """Forward intra pyramid with fused quantization.

    quant_table: 3 entries per level (qh, qv, qd), level-1 (shallowest) first
    — same ordering as the reference demo (`wavelets.c:49-68`).
    prescale: per-level lowpass prescale shifts applied *between* levels.
    """
    ll = x
    highs_rev = []
    for level in range(levels):
        ll, lh, hl, hh = dwt.dwt2d_forward(ll)
        qh, qv, qd = quant_table[level * 3 : level * 3 + 3]
        highs_rev.append(
            (
                quant.quantize_band(lh, qh),
                quant.quantize_band(hl, qv),
                quant.quantize_band(hh, qd),
            )
        )
        if level < levels - 1:
            ll = quant.prescale_lowpass(ll, -prescale[level])
    return Pyramid(lowpass=ll, highs=tuple(reversed(highs_rev)))


def inverse_intra(
    pyr: Pyramid,
    quant_table: Sequence[int],
    prescale: Sequence[int],
    bitdepth: int,
    dc_offset: int | None = None,
) -> jnp.ndarray:
    """Inverse intra pyramid (dequant + 2D inverse per level)."""
    levels = len(pyr.highs)
    if dc_offset is None:
        dc_offset = 64 >> (bitdepth - 8)
    ll = pyr.lowpass + dc_offset
    for i, (lh, hl, hh) in enumerate(pyr.highs):
        level = levels - 1 - i  # quant-table index (shallowest = 0)
        if level < levels - 1:
            ll = quant.prescale_lowpass(ll, prescale[level])
        qh, qv, qd = quant_table[level * 3 : level * 3 + 3]
        ll = dwt.dwt2d_inverse(
            ll,
            quant.dequantize_band(lh, qh),
            quant.dequantize_band(hl, qv),
            quant.dequantize_band(hh, qd),
        )
    return jnp.clip(ll, 0, (1 << bitdepth) - 1)
