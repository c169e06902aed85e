"""Bit-exact NumPy model of the 2-frame GOP (FIELDPLUS) transform.

Wavelet forest per channel (`Codec/encoder.c:8431` FinishFieldPlusTransformQuant,
layout documented in SURVEY §3.3b; progressive input):

  w[0], w[1]  level-1 wavelets of frames 0/1.  For PROGRESSIVE input these
              are plain SPATIAL 2-6 wavelets of each frame (the stream
              still labels them HORZTEMP; `Codec/encoder.c:9504` "frame
              transform (interlaced) or spatial transform (progressive)").
              The HORZTEMP math (`Codec/filter.c:273`) applies only to
              interlaced input (frame_wavelet_forward below).
  w[2]        2-2 temporal between w[0].LL and w[1].LL (not entropy coded;
              an empty band entry is emitted, subband 255)
  w[3]        spatial 2-6 of w[2].high; ALL FOUR bands coded (subbands
              7-10, the LL with quantizer 1)
  w[4]        spatial 2-6 of w[2].low with prescale 2 (fieldplus_prescale,
              `Codec/wavelet.c:1769`)
  w[5]        spatial 2-6 of w[4].LL; its LL is the raw 16-bit lowpass

Subband map (`Codec/decoder.c:11191`): 0 = w[5] LL raw; 1-3 = w[5] highs;
4-6 = w[4] highs; 7-10 = w[3] bands 0-3; 11-13 = w[1] highs; 14-16 = w[0]
highs.
"""

from __future__ import annotations

import numpy as np

from cineform_tpu.ref import intra as xf
from cineform_tpu.spec.production import quality_tables


def fieldplus_band_scales() -> dict:
    """Display scales per wavelet (`SetTransformScale` FIELDPLUS case),
    confirmed against golden sample headers."""
    return {
        0: [4, 2, 2, 1],          # frame wavelets
        1: [4, 2, 2, 1],
        2: [8, 4],                # temporal
        3: [16, 8, 8, 4],         # spatial of temporal high
        4: [32, 16, 16, 8],       # spatial of temporal low
        5: [128, 64, 64, 32],     # deepest spatial
    }


def fieldplus_band_quant(quality: int, precision: int, channel: int) -> dict:
    """Per-wavelet band quantizers for the FIELDPLUS transform.

    `SetTransformQuantization` (`Codec/quantize.c:3355+`, FIELDPLUS case):
    spatial wavelets use table[sb] * scale[band] >> 2; the temporal-high
    spatial's LL is forced to 1 (`encoder.c:8524`); the frame wavelets use
    table[sb] directly.
    """
    luma, chroma = quality_tables(quality, precision, gop_length=2)
    t = chroma if channel > 0 else luma
    s = fieldplus_band_scales()
    return {
        5: tuple((t[1 + b] * s[5][1 + b]) >> 2 for b in range(3)),
        4: tuple((t[4 + b] * s[4][1 + b]) >> 2 for b in range(3)),
        3: (1,) + tuple((t[8 + b] * s[3][1 + b]) >> 2 for b in range(3)),
        1: tuple(t[11 + b] for b in range(3)),
        0: tuple(t[14 + b] for b in range(3)),
    }


FIELDPLUS_PRESCALE = [0, 0, 0, 0, 2, 0]   # per wavelet index, 10-bit


def _div2_trunc(x: np.ndarray) -> np.ndarray:
    """C `/2`: truncation toward zero (NOT arithmetic shift)."""
    return np.sign(x) * (np.abs(x) >> 1)


def frame_wavelet_forward(plane: np.ndarray, quant):
    """HORZTEMP frame wavelet: 2-2 Haar across row pairs + horizontal 2-6.

    Temporal convention throughout CFHD: low = first + second,
    high = SECOND - FIRST (`Codec/temporal.c` FilterTemporalRow16s tail).
    Bands: LL/LH from the temporal-low rows, HL/HH from the temporal-high
    rows (`Codec/filter.c:372-420`), quantization fused.
    """
    p = plane.astype(np.int32)
    tlow = xf.sat16(p[0::2] + p[1::2])
    # NOTE: empirically (golden decode comparison) the frame wavelet's
    # temporal high is first-minus-second, unlike the standalone temporal
    # transform between frames (second-minus-first).
    thigh = xf.sat16(p[0::2] - p[1::2])
    ll, lh = xf._h26_forward(tlow)
    hl, hh = xf._h26_forward(thigh)
    return ll, (xf.quantize(lh, quant[0]),
                xf.quantize(hl, quant[1]),
                xf.quantize(hh, quant[2]))


def frame_wavelet_inverse(ll, lh, hl, hh) -> np.ndarray:
    """Inverse HORZTEMP: horizontal 2-6 inverse then 2-2 row expansion
    (`InvertInterlacedRow16s10bitToYUV`: even = (low-high)/2,
    odd = (low+high)/2, truncating division)."""
    tlow = xf.h26_inverse(ll, lh)
    thigh = xf.h26_inverse(hl, hh)
    h2 = tlow.shape[0]
    out = np.empty((h2 * 2, tlow.shape[1]), np.int32)
    out[0::2] = xf.sat16(_div2_trunc(tlow + thigh))
    out[1::2] = xf.sat16(_div2_trunc(tlow - thigh))
    return out


def forward_channel_gop(frame0: np.ndarray, frame1: np.ndarray,
                        band_quant: dict, progressive: bool = True):
    """Full FIELDPLUS forward for one channel.

    Returns (lowpass, bands) where bands[k] holds the coded bands of
    wavelet k: w0/w1/w4/w5 -> (LH, HL, HH); w3 -> (LL, LH, HL, HH).

    progressive=True (the default, matching SAMPLE_FLAGS_PROGRESSIVE):
    w0/w1 are spatial 2-6 wavelets of each frame; False uses the
    interlaced HORZTEMP frame wavelet.
    """
    if progressive:
        ll0, b0 = xf.dwt2d_forward(frame0.astype(np.int32), 0, band_quant[0])
        ll1, b1 = xf.dwt2d_forward(frame1.astype(np.int32), 0, band_quant[1])
    else:
        ll0, b0 = frame_wavelet_forward(frame0, band_quant[0])
        ll1, b1 = frame_wavelet_forward(frame1, band_quant[1])
    tlow = xf.sat16(ll0.astype(np.int32) + ll1)
    thigh = xf.sat16(ll1.astype(np.int32) - ll0)
    # w3: spatial of temporal high; LL coded with quantizer 1
    ll3, h3 = xf.dwt2d_forward(thigh, 0, band_quant[3][1:])
    w3 = (xf.quantize(ll3, band_quant[3][0]),) + h3
    # w4: spatial of temporal low with prescale 2
    ll4, w4 = xf.dwt2d_forward(tlow, 2, band_quant[4])
    # w5: spatial of w4 LL
    ll5, w5 = xf.dwt2d_forward(ll4, 0, band_quant[5])
    return ll5, {0: b0, 1: b1, 3: w3, 4: w4, 5: w5}


def inverse_channel_gop(lowpass, bands, to8bit: bool = True,
                        reference_compatible: bool = True,
                        dither0=None, dither1=None):
    """Full FIELDPLUS inverse for one channel -> (frame0, frame1).

    bands values must already be dequantized.

    reference_compatible=True replicates the reference decoder's full-res
    group decode (pinned against the binary): BOTH output frames are the
    spatial inverse of (w0.LL reconstructed as (tlow - thigh) >> 1, w0's
    highpass bands) through the intra fused output stage — w1's coded
    bands are never read, so the two frames differ only by the decoder's
    output dither (frame 2 consumes the next 16*H rand draws).

    reference_compatible=False is our higher-fidelity extension: frame 1
    is reconstructed from its own LL ((tlow + thigh) >> 1) and w1's bands.
    """
    # the reference's threaded group decode uses a shifted bottom border
    # for the deepest wavelet (the last lowpass row never contributes)
    ll4 = xf.dwt2d_inverse(lowpass, *bands[5], descale=1, bottom_shift=True)
    tlow = xf.dwt2d_inverse(ll4, *bands[4], descale=2)
    ll3 = bands[3][0]
    thigh = xf.dwt2d_inverse(ll3, *bands[3][1:], descale=1)
    ll0 = xf.sat16((tlow.astype(np.int64) - thigh) >> 1)

    def final(llf, wbands, dither):
        lh, hl, hh = wbands
        low = xf.v26_inverse(llf, hl)
        high = xf.v26_inverse(lh, hh)
        if not to8bit:
            return xf.h26_inverse(low, high, descale=1)
        if dither is not None and dither.shape[-1] == 16:
            dither = xf.decode_dither_plane(dither, low.shape[-1] * 2)
        return xf.h26_inverse_to_output(low, high, 2, dither)

    f0 = final(ll0, bands[0], dither0)
    if reference_compatible:
        f1 = final(ll0, bands[0], dither1)
    else:
        ll1 = xf.sat16((tlow.astype(np.int64) + thigh) >> 1)
        f1 = final(ll1, bands[1], dither1)
    return f0, f1
