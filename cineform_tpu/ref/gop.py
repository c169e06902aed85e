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


def fieldplus_band_quant(quality: int, precision: int, channel: int,
                         progressive: bool = True) -> dict:
    """Per-wavelet band quantizers for the FIELDPLUS transform.

    `SetTransformQuantization` (`Codec/quantize.c:3355+`, FIELDPLUS case):
    spatial wavelets use table[sb] * scale[band] >> 2; the temporal-high
    spatial's LL is forced to 1 (`encoder.c:8524`); the frame wavelets use
    table[sb] directly (progressive).  For interlaced input (true FRAME
    wavelets) the w0/w1 quantizers are adjusted LH = t*3/2, HL = t*2/3,
    HH = t — pinned against the reference encoder's band headers across
    qualities 1-6 (probe encode_gop_ilace).
    """
    luma, chroma = quality_tables(quality, precision, gop_length=2)
    t = chroma if channel > 0 else luma
    s = fieldplus_band_scales()

    def frame_q(base: int) -> tuple:
        if progressive:
            return tuple(t[base + b] for b in range(3))
        return ((t[base] * 3) >> 1, (t[base + 1] * 2) // 3, t[base + 2])

    return {
        5: tuple((t[1 + b] * s[5][1 + b]) >> 2 for b in range(3)),
        4: tuple((t[4 + b] * s[4][1 + b]) >> 2 for b in range(3)),
        3: (1,) + tuple((t[8 + b] * s[3][1 + b]) >> 2 for b in range(3)),
        1: frame_q(11),
        0: frame_q(14),
    }


FIELDPLUS_PRESCALE = [0, 0, 0, 0, 2, 0]   # per wavelet index, 10-bit


def _div2_trunc(x: np.ndarray) -> np.ndarray:
    """C `/2`: truncation toward zero (NOT arithmetic shift)."""
    return np.sign(x) * (np.abs(x) >> 1)


def quantize_mid(v: np.ndarray, q: int) -> np.ndarray:
    """Quantizer with midpoint exactly q/2 (no -1), as used inside
    `FilterHorizontalRowScaled16sDifferenceFiltered` (`Codec/spatial.c:5327`,
    prequant_midpoint = divisor / g_midpoint_prequant)."""
    if q <= 1:
        return v.astype(np.int32)
    mult = (1 << 16) // q
    a = np.abs(v).astype(np.int64)
    mag = ((a + q // 2) * mult) >> 16
    return (np.sign(v) * mag).astype(np.int32)


def frame_wavelet_forward(plane: np.ndarray, quant):
    """HORZTEMP frame wavelet: 2-2 Haar across row pairs + horizontal 2-6.

    Pinned column-by-column against the reference kernels driven directly
    (tools/probe_frame_filter.c):
    - temporal: low = even + odd, high = ODD - EVEN
      (`FilterTemporalRowYUYVChannelTo16s`, `Codec/temporal.c:1915`);
    - LH = standard quantized 2-6 high of the temporal low
      (`FilterHorizontalRow16s` + QuantizeRow16sTo16s);
    - HL = the horizontal LOWPASS of the temporal high, quantized with
      midpoint q/2, then horizontally DELTA-CODED (DIFFERENCE_CODING,
      `Codec/spatial.c:5327` FilterHorizontalRowScaled16sDifferenceFiltered);
      it is entropy-coded with codeset 18 (band coding_flags 18);
    - HH = standard quantized 2-6 high of the temporal high.
    """
    p = plane.astype(np.int32)
    tlow = xf.sat16(p[0::2] + p[1::2])
    thigh = xf.sat16(p[1::2] - p[0::2])
    ll, lh = xf._h26_forward(tlow)
    _, hh = xf._h26_forward(thigh)
    low_h = xf.sat16(thigh[:, 0::2] + thigh[:, 1::2])
    hl_q = quantize_mid(low_h, quant[1])
    d = hl_q.copy()
    d[:, 1:] = hl_q[:, 1:] - hl_q[:, :-1]
    return ll, (xf.quantize(lh, quant[0]),
                xf.sat16(d).astype(np.int32),
                xf.quantize(hh, quant[2]))


def frame_wavelet_inverse(ll, lh, hl, hh, to8bit: bool = False,
                          dither=None, channel: int = 0) -> np.ndarray:
    """Inverse HORZTEMP: horizontal 2-6 inverse then 2-2 row expansion
    (`InvertInterlacedRow16s10bitToYUV`, `Codec/temporal.c:5961`:
    even = clamp_0..2047(low - high) >> 1, odd = clamp(low + high) >> 1,
    the clamp done by the saturating 0x7fff-2047 offset trick).

    `hl` must be the dequantized band values; difference decoding (the
    row cumsum, `Codec/entropy_threading.c:205`, int16 wrap) is applied
    here — the linear dequantization commutes with the cumsum.

    dither: (pairs, 16) {0,1} draws per output row pair (16 rand()&1
    per kernel call, temporal.c:5994).  Lane layout pinned against the
    reference decoder: luma even rows take rounding1/rounding2
    alternating per 8 columns, odd rows the swap; chroma channel 1
    (even r1 / odd r2) and channel 2 (even r2 / odd r1) use the lane
    of their chroma column.  channel selects the lane rule."""
    hl = np.cumsum(hl.astype(np.int64), axis=1)
    hl = (((hl + 32768) & 0xFFFF) - 32768).astype(np.int32)
    tlow = xf.h26_inverse(ll, lh)
    thigh = xf.h26_inverse(hl, hh)
    h2 = tlow.shape[0]
    even = np.clip(xf.sat16(tlow - thigh), 0, 2047) >> 1
    odd = np.clip(xf.sat16(tlow + thigh), 0, 2047) >> 1
    out = np.empty((h2 * 2, tlow.shape[1]), np.int32)
    out[0::2] = even
    out[1::2] = odd
    if to8bit:
        if dither is not None:
            w = out.shape[1]
            c = np.arange(w)
            if channel == 0:
                lane_e = np.where((c // 8) % 2 == 0, c % 8, 8 + c % 8)
                lane_o = np.where((c // 8) % 2 == 0, 8 + c % 8, c % 8)
            elif channel == 1:
                lane_e = c % 8
                lane_o = 8 + c % 8
            else:
                lane_e = 8 + c % 8
                lane_o = c % 8
            d = np.asarray(dither, np.int32)
            out[0::2] += d[:, lane_e]
            out[1::2] += d[:, lane_o]
        out = np.clip(out >> 2, 0, 255)
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
    # w3: spatial of temporal high; LL coded with quantizer 1.  The input
    # is band 1 of the reference's two-band temporal wavelet, so at
    # narrow widths its row-0 overread (see xf._h26_forward) lands on
    # band 0's (the temporal lowpass') last two pixels when band 0's
    # region is exactly cache-line sized.
    r0 = tlow[-1, -2:] if (2 * thigh.shape[1] * thigh.shape[0]) % 64 == 0 \
        else None
    ll3, h3 = xf.dwt2d_forward(thigh, 0, band_quant[3][1:], row0_prev=r0)
    w3 = (xf.quantize(ll3, band_quant[3][0]),) + h3
    # w4: spatial of temporal low with prescale 2
    ll4, w4 = xf.dwt2d_forward(tlow, 2, band_quant[4])
    # w5: spatial of w4 LL
    ll5, w5 = xf.dwt2d_forward(ll4, 0, band_quant[5])
    return ll5, {0: b0, 1: b1, 3: w3, 4: w4, 5: w5}


def inverse_channel_gop(lowpass, bands, to8bit: bool = True,
                        reference_compatible: bool = True,
                        dither0=None, dither1=None,
                        progressive: bool = True,
                        dither_group=None, channel: int = 0):
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
    # pyramid functions pinned against captured reference intermediates:
    # w5 and w3 invert through InvertSpatialQuantOverflowProtected16s
    # (stale bottom taps on the low pair, dwt2d_inverse bottom_shift);
    # w4 through InvertSpatialQuantDescale16s (standard bottom); the
    # temporal combine saturates BEFORE the >>1 (InvertTemporalQuant16s,
    # temporal.c:9676: field1 = (low - high) >> 1 on int16 lanes)
    ll4 = xf.dwt2d_inverse(lowpass, *bands[5], descale=1, bottom_shift=True)
    tlow = xf.dwt2d_inverse(ll4, *bands[4], descale=2)
    ll3 = bands[3][0]
    thigh = xf.dwt2d_inverse(ll3, *bands[3][1:], descale=1, bottom_shift=True)
    ll0 = xf.sat16(tlow.astype(np.int64) - thigh) >> 1

    if not progressive:
        # interlaced: w0/w1 are HORZTEMP frame wavelets; dither0/dither1
        # are (pairs, 16) draw blocks (InvertInterlacedRow16s10bitToYUV
        # consumes 16 rand()&1 per output row pair, temporal.c:5994)
        f0 = frame_wavelet_inverse(ll0, *bands[0], to8bit=to8bit,
                                   dither=dither0, channel=channel)
        if reference_compatible:
            f1 = frame_wavelet_inverse(ll0, *bands[0], to8bit=to8bit,
                                       dither=dither1, channel=channel)
        else:
            ll1 = xf.sat16(tlow.astype(np.int64) + thigh) >> 1
            f1 = frame_wavelet_inverse(ll1, *bands[1], to8bit=to8bit,
                                       dither=dither1, channel=channel)
        return f0, f1

    def final(llf, wbands, dither):
        lh, hl, hh = wbands
        low = xf.v26_inverse(llf, hl)
        high = xf.v26_inverse(lh, hh)
        if not to8bit:
            return xf.h26_inverse(low, high, descale=1)
        width = low.shape[-1] * 2
        tail = dither_group if (dither_group
                                and width % (2 * dither_group)
                                == dither_group) else 0
        if dither is not None and dither.shape[-1] == 16:
            dither = xf.decode_dither_plane(dither, width, dither_group)
        return xf.h26_inverse_to_output(low, high, 2, dither,
                                        scalar_tail=tail)

    f0 = final(ll0, bands[0], dither0)
    if reference_compatible:
        f1 = final(ll0, bands[0], dither1)
    else:
        ll1 = xf.sat16(tlow.astype(np.int64) + thigh) >> 1
        f1 = final(ll1, bands[1], dither1)
    return f0, f1
