"""Bit-exact NumPy model of the production CFHD intra-frame codec (YUV 4:2:2).

This mirrors the *shipping* encoder/decoder pipeline (not the WaveletDemo
model in ref/scalar.py):

encode (per channel, `Codec/encoder.c:1897` EncodeSample intra path):
  YUY2 unpack -> 10-bit planes      UnpackRowYUV16s      convert.c:4667
  w[0] 2D 2-6 DWT + quant           FilterSpatialYUVQuant16s  spatial.c:14122
  w[1] DWT with prescale 2 + quant  FilterSpatialV210Quant16s spatial.c:12942
                                    (per-tap prescale (x+3)>>2,
                                     FilterHorizontalRow10bit16s spatial.c:3669)
  w[2] DWT + quant                  FilterSpatialQuant16s
  lowpass raw 16bpp                 EncodeLowPassBand    encoder.c:4251
  band entropy coding               EncodeQuantLongRuns  encoder.c:5702
                                    (host VLC in entropy/host.py)

decode (`Codec/decoder.c:10078` DecodeSample intra path):
  band FSM decode + dequant (int16 wrap: DeQuantFSM decoder.c:20551)
  w[2] inverse                      InvertSpatialQuant16s     spatial.c:21877
  w[1] inverse with descale 2       InvertSpatialQuantDescale16s spatial.c:22414
                                    (horizontal pass keeps the extra bit:
                                     <<1 instead of >>1, InvertHorizontalStripDescale16s)
  w[0] inverse fused with YUY2 out  TransformInverseSpatialYUV422ToOutput
                                    wavelet.c:7950 + InvertHorizontalStrip16sToYUYV
                                    InvertHorizontalStrip16s.c:3770
                                    (interior clamps >=0 via the +2048 usub
                                     trick, optional {0,1} dither, >>2 to 8-bit)

Channel order is Y, V(Cr), U(Cb) (`convert.c:5222-5284`: channel 1 reads the
4th byte of each YUYV quad, channel 2 the 2nd).
"""

from __future__ import annotations

import numpy as np

_I32 = np.int32
ROUNDING = 4


def sat16(x: np.ndarray) -> np.ndarray:
    return np.clip(x, -32768, 32767).astype(_I32)


def wrap16(x: np.ndarray) -> np.ndarray:
    """C short wraparound (used by DeQuantFSM's in-table multiply)."""
    return ((np.asarray(x, dtype=np.int64) + 32768) % 65536 - 32768).astype(_I32)


# ---------------------------------------------------------------------------
# Input unpack
# ---------------------------------------------------------------------------

def unpack_yuy2(raw: bytes | np.ndarray, width: int, height: int,
                precision: int = 10) -> list[np.ndarray]:
    """YUY2 bytes -> [Y, V, U] int32 planes shifted to `precision` bits.

    Contract: `UnpackRowYUV16s` (`Codec/convert.c:4667`), default path
    (no limit_yuv, no 601->709 conversion): plain `<< (precision-8)`.
    """
    arr = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, (bytes, bytearray)) else raw
    quad = arr.reshape(height, width // 2, 4).astype(_I32)
    shift = precision - 8
    y = quad[:, :, [0, 2]].reshape(height, width) << shift
    u = quad[:, :, 1] << shift
    v = quad[:, :, 3] << shift
    return [y, v, u]


def unpack_uyvy(raw: bytes | np.ndarray, width: int, height: int,
                precision: int = 10) -> list[np.ndarray]:
    """2vuy/UYVY bytes (U Y0 V Y1) -> [Y, Cr, Cb] planes like unpack_yuy2
    (`UnpackRowYUV16s` UYVY branch, `Codec/convert.c:5310+`)."""
    arr = (np.frombuffer(raw, dtype=np.uint8)
           if isinstance(raw, (bytes, bytearray)) else raw)
    quad = arr.reshape(height, width // 2, 4).astype(_I32)
    shift = precision - 8
    y = quad[:, :, [1, 3]].reshape(height, width) << shift
    u = quad[:, :, 0] << shift
    v = quad[:, :, 2] << shift
    return [y, v, u]


def unpack_yu64(raw: bytes | np.ndarray, width: int, height: int) -> list[np.ndarray]:
    """YU64 (16-bit 4:2:2, per pixel pair [Y0, C1, Y1, C2]) -> 10-bit planes.

    Channel mapping pinned against the reference encoder's output
    (`ConvertYU64ToFrame16s`, `Codec/frame.c:1556`): channel 1 <- the first
    chroma word of each pair, channel 2 <- the second, both >> 6.
    """
    arr = (np.frombuffer(raw, dtype="<u2") if isinstance(raw, (bytes, bytearray))
           else raw)
    quad = arr.reshape(height, width // 2, 4).astype(_I32)
    y = quad[:, :, [0, 2]].reshape(height, width) >> 6
    c1 = quad[:, :, 1] >> 6
    c2 = quad[:, :, 3] >> 6
    return [y, c1, c2]


def unpack_avu8(raw: bytes | np.ndarray, width: int, height: int
                ) -> list[np.ndarray]:
    """Avid CT_UCHAR ('avu8', 8-bit CbYCrY 4:2:2) -> 10-bit planes
    (`ConvertCbYCrY_8bitToFrame16s`, `Codec/frame.c:13386`): each
    component << 2; channel 1 <- Cr, channel 2 <- Cb."""
    arr = (np.frombuffer(raw, dtype=np.uint8)
           if isinstance(raw, (bytes, bytearray)) else raw)
    quad = arr.reshape(height, width // 2, 4).astype(_I32)
    y = quad[:, :, [1, 3]].reshape(height, width) << 2
    cr = quad[:, :, 2] << 2
    cb = quad[:, :, 0] << 2
    return [y, cr, cb]


def unpack_av16(raw: bytes | np.ndarray, width: int, height: int
                ) -> list[np.ndarray]:
    """Avid CT_SHORT ('av16') / CT_USHORT_10_6 ('a106'): 16-bit CbYCrY
    components >> 6 to 10-bit planes (`ConvertCbYCrY_16bitToFrame16s` /
    `ConvertCbYCrY_16bit_10_6ToFrame16s`, `Codec/frame.c:13319/13453` —
    identical math)."""
    arr = (np.frombuffer(raw, dtype="<u2")
           if isinstance(raw, (bytes, bytearray)) else raw)
    quad = arr.reshape(height, width // 2, 4).astype(_I32)
    y = quad[:, :, [1, 3]].reshape(height, width) >> 6
    cr = quad[:, :, 2] >> 6
    cb = quad[:, :, 0] >> 6
    return [y, cr, cb]


def unpack_a214(raw: bytes | np.ndarray, width: int, height: int
                ) -> list[np.ndarray]:
    """Avid CT_SHORT_2_14 ('a214', signed 2.14 fixed point CbYCrY) ->
    10-bit planes (`ConvertCbYCrY_16bit_2_14ToFrame16s`,
    `Codec/frame.c:13234`): luma (219*Y/16384 + 16) << 2, chroma
    (224*(C+8192)/16384 + 16) << 2 with C-truncating division, then
    SATURATE_10U."""
    arr = (np.frombuffer(raw, dtype="<i2")
           if isinstance(raw, (bytes, bytearray)) else raw)
    quad = arr.reshape(height, width // 2, 4).astype(np.int64)

    def trunc_div(n, d):
        return np.sign(n) * (np.abs(n) // d)

    def lum(v):
        return np.clip((trunc_div(219 * v, 16384) + 16) << 2, 0, 1023)

    def chr_(v):
        return np.clip((trunc_div(224 * (v + 8192), 16384) + 16) << 2,
                       0, 1023)

    y = lum(quad[:, :, [1, 3]].reshape(height, width)).astype(_I32)
    cr = chr_(quad[:, :, 2]).astype(_I32)
    cb = chr_(quad[:, :, 0]).astype(_I32)
    return [y, cr, cb]


def unpack_av28(raw: bytes | np.ndarray, width: int, height: int
                ) -> list[np.ndarray]:
    """Avid CT_10BIT_2_8 ('av28', two planes: w*h/2 bytes of 2-bit
    upper components packed [Cb Y1 Cr Y2] high-to-low, then 8-bit
    CbYCrY rows) -> 10-bit planes
    (`ConvertCbYCrY_10bit_2_8ToFrame16s`, `Codec/frame.c:13144`)."""
    arr = (np.frombuffer(raw, dtype=np.uint8)
           if isinstance(raw, (bytes, bytearray)) else raw)
    upper = arr[:width * height // 2].reshape(
        height, width // 2).astype(_I32)
    lower = arr[width * height // 2:width * height // 2 + 2 * width * height]
    quad = lower.reshape(height, width // 2, 4).astype(_I32)
    cb_u, y1_u = (upper >> 6) & 3, (upper >> 4) & 3
    cr_u, y2_u = (upper >> 2) & 3, upper & 3
    y1 = (quad[:, :, 1] << 2) | y1_u
    y2 = (quad[:, :, 3] << 2) | y2_u
    cr = (quad[:, :, 2] << 2) | cr_u
    cb = (quad[:, :, 0] << 2) | cb_u
    y = np.stack([y1, y2], axis=-1).reshape(height, width)
    return [y, cr, cb]


def unpack_v210(raw: bytes | np.ndarray, width: int, height: int,
                pitch: int | None = None,
                reference_compatible: bool = True) -> list[np.ndarray]:
    """v210 packed 10-bit 4:2:2 -> planes [Y, Cr, Cb].

    Channel mapping pinned against the reference encoder
    (`ConvertV210RowToPlanar16s`, `Codec/convert.c:3968`; note its SSE
    output pointers are cross-wired: u_output_ptr stores to v_output and
    vice versa).

    reference_compatible: the reference's *scalar* tail (columns past the
    last multiple of 48) has a Cr-lag bug — per 6-pixel group it emits
    [Cr0, Cr0, Cr1] and drops Cr2 (`convert.c` scalar loop: the second
    v-write reuses the stale `v`).  With True (default) we reproduce that
    byte-for-byte; False unpacks the true samples.
    """
    if pitch is None:
        pitch = ((width + 47) // 48) * 128
    arr = (np.frombuffer(raw, dtype="<u4") if isinstance(raw, (bytes, bytearray))
           else raw)
    words_per_row = pitch // 4
    rows = arr.reshape(height, words_per_row).astype(np.int64)
    ngroups = (width + 5) // 6
    g = rows[:, :4 * ngroups].reshape(height, ngroups, 4)
    s0, s1, s2 = g & 0x3FF, (g >> 10) & 0x3FF, (g >> 20) & 0x3FF
    # group of 6 px: w0=(Cb0,Y0,Cr0) w1=(Y1,Cb1,Y2) w2=(Cr1,Y3,Cb2) w3=(Y4,Cr2,Y5)
    y = np.stack([s1[..., 0], s0[..., 1], s2[..., 1],
                  s1[..., 2], s0[..., 3], s2[..., 3]], axis=-1)
    cb = np.stack([s0[..., 0], s1[..., 1], s2[..., 2]], axis=-1)
    cr = np.stack([s2[..., 0], s0[..., 2], s1[..., 3]], axis=-1)
    y = y.reshape(height, 6 * ngroups)[:, :width].astype(_I32)
    cb = cb.reshape(height, 3 * ngroups)[:, :width // 2].astype(_I32)
    cr = cr.reshape(height, 3 * ngroups)[:, :width // 2].astype(_I32)
    if reference_compatible:
        half = width // 2
        i = (width - width % 48) // 2  # first chroma column of the scalar tail
        while i + 3 <= half:
            cr[:, i + 2] = cr[:, i + 1]
            cr[:, i + 1] = cr[:, i]
            i += 3
    return [y, cr, cb]


def pack_yuy2(y: np.ndarray, v: np.ndarray, u: np.ndarray) -> bytes:
    """[Y, V, U] 8-bit planes -> YUY2 bytes."""
    h, w = y.shape
    out = np.empty((h, w // 2, 4), dtype=np.uint8)
    out[:, :, 0] = y[:, 0::2]
    out[:, :, 2] = y[:, 1::2]
    out[:, :, 1] = u
    out[:, :, 3] = v
    return out.tobytes()


# ---------------------------------------------------------------------------
# Forward 2-6 DWT (production variants)
# ---------------------------------------------------------------------------

def _h26_forward(x: np.ndarray, prescale: int = 0,
                 row0_prev: np.ndarray | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Horizontal 2-6 forward.

    prescale=0: `FilterHorizontalRow16s` (`Codec/spatial.c:253`).
    prescale=2: `FilterHorizontalRow10bit16s` (`Codec/spatial.c:3669`) —
      highpass taps use per-element px=(x+3)>>2; the stored lowpass is
      (x0+x1+3)>>2.
    row0_prev: for the width<=16 narrow-row quirk (below), the two raw
      pixels sitting in memory before the image's first row.  For a
      band-0 input this is fresh-allocation zeros (the default); a
      band-1 input (the GOP's temporal-highpass spatial) is preceded by
      band 0, so its row 0 overreads band 0's last two pixels.
    """
    x = x.astype(_I32)
    even, odd = x[..., 0::2], x[..., 1::2]
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
    high = np.empty_like(plow)
    high[..., 1:-1] = ((-plow[..., :-2] + plow[..., 2:] + ROUNDING) >> 3) + diff[..., 1:-1]
    high[..., 0] = (
        5 * pe[..., 0] - 11 * po[..., 0]
        + 4 * pe[..., 1] + 4 * po[..., 1]
        - pe[..., 2] - po[..., 2] + ROUNDING
    ) >> 3
    if x.shape[-1] <= 16 and x.ndim >= 2:
        # Narrow-row quirk of the SSE2 FilterHorizontalRow16s
        # (`Codec/spatial.c:912-1016`) and its prescaled twin
        # FilterHorizontalRow10bit16s (`Codec/spatial.c:3669-4001`): with
        # width <= 16 the vectorized main loop never runs (post_column ==
        # 0), and the left-border highpass value it would have shifted
        # into column 0 is dropped.  The scalar tail then starts at
        # column 0 with the CENTER filter, whose input[-2..-1] reads run
        # off the row start into the last two pixels of the previous row
        # (the row pitch for widths 8/16 equals the width); the first row
        # reads fresh-allocation zeros.  In the prescaled variant the
        # overread pixels go through the same (x+3)>>2 per-element
        # prescale, so the pe/po arrays apply to both.
        prev = np.zeros_like(plow[..., 0])
        if x.shape[-1] % 8 == 0:
            # pitch == width: the overread lands on the previous row
            prev[..., 1:] = plow[..., :-1, -1]
            if row0_prev is not None:
                p0, p1 = int(row0_prev[0]), int(row0_prev[1])
                if prescale:
                    r = (1 << prescale) - 1
                    p0, p1 = (p0 + r) >> prescale, (p1 + r) >> prescale
                prev[..., 0] = p0 + p1
        # else: the 16-byte row pitch leaves >= 2 never-written pad pixels
        # at the end of each row, so the overread sees zeros on every row
        high[..., 0] = ((-prev + plow[..., 1] + ROUNDING) >> 3) + diff[..., 0]
    high[..., -1] = (
        11 * pe[..., -1] - 5 * po[..., -1]
        - 4 * po[..., -2] - 4 * pe[..., -2]
        + po[..., -3] + pe[..., -3] + ROUNDING
    ) >> 3
    return sat16(low), sat16(high)


def v26_forward(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vertical 2-6 forward (border rows use the 6-tap filters on the first/
    last six input rows, `Codec/spatial.c:14266-14306`)."""
    x = x.astype(_I32)
    even, odd = x[0::2], x[1::2]
    low = even + odd
    diff = even - odd
    high = np.empty_like(low)
    high[1:-1] = ((-low[:-2] + low[2:] + ROUNDING) >> 3) + diff[1:-1]
    high[0] = (
        5 * x[0] - 11 * x[1] + 4 * x[2] + 4 * x[3] - x[4] - x[5] + ROUNDING
    ) >> 3
    high[-1] = (
        11 * x[-2] - 5 * x[-1] - 4 * x[-3] - 4 * x[-4] + x[-5] + x[-6] + ROUNDING
    ) >> 3
    return sat16(low), sat16(high)


def quantize(v: np.ndarray, q: int, midpoint_prequant: int = 2) -> np.ndarray:
    """Production quantizer `QuantizeRow16sTo16s` (`Codec/quantize.c:1256`)."""
    if q <= 1:
        return v.astype(_I32)
    mult = (1 << 16) // q
    mid = q // midpoint_prequant
    if midpoint_prequant == 2 and mid:
        mid -= 1
    a = np.abs(v).astype(np.int64)
    mag = (((a + mid) & 0xFFFF) * mult) >> 16
    return (np.sign(v) * mag).astype(_I32)


def dwt2d_forward(x: np.ndarray, prescale: int = 0,
                  quant: tuple[int, int, int] | None = None,
                  row0_prev: np.ndarray | None = None):
    """One 2D production DWT level: horizontal (optionally prescaled) then
    vertical; returns (LL, (LH, HL, HH)) with optional fused quantization.

    Band order matches the reference: band1 = horizontal-high/vertical-low
    ("lowhigh"), band2 = horizontal-low/vertical-high ("highlow"), band3 = HH.
    """
    low, high = _h26_forward(x, prescale, row0_prev)
    ll, hl = v26_forward(low)
    lh, hh = v26_forward(high)
    if quant is not None:
        lh = quantize(lh, quant[0])
        hl = quantize(hl, quant[1])
        hh = quantize(hh, quant[2])
    return ll, (lh, hl, hh)


# ---------------------------------------------------------------------------
# Inverse 2-6 DWT (production variants)
# ---------------------------------------------------------------------------

def v26_inverse(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Vertical 2-6 inverse, standard descale (>>1), int32 math + sat16.

    Contract: `InvertSpatialQuantDescale16s` vertical section
    (`Codec/spatial.c:22492-22540`) == demo math.
    """
    low, high = low.astype(_I32), high.astype(_I32)
    half = low.shape[0]
    even = np.empty_like(low)
    odd = np.empty_like(low)
    te = (low[:-2] - low[2:] + ROUNDING) >> 3
    to = (-low[:-2] + low[2:] + ROUNDING) >> 3
    even[1:-1] = (te + low[1:-1] + high[1:-1]) >> 1
    odd[1:-1] = (to + low[1:-1] - high[1:-1]) >> 1
    t0e = (11 * low[0] - 4 * low[1] + low[2] + ROUNDING) >> 3
    t0o = (5 * low[0] + 4 * low[1] - low[2] + ROUNDING) >> 3
    even[0] = (t0e + high[0]) >> 1
    odd[0] = (t0o - high[0]) >> 1
    tke = (5 * low[-1] + 4 * low[-2] - low[-3] + ROUNDING) >> 3
    tko = (11 * low[-1] - 4 * low[-2] + low[-3] + ROUNDING) >> 3
    even[-1] = (tke + high[-1]) >> 1
    odd[-1] = (tko - high[-1]) >> 1
    out = np.empty((half * 2,) + low.shape[1:], dtype=_I32)
    out[0::2] = sat16(even)
    out[1::2] = sat16(odd)
    return out


def h26_inverse(low: np.ndarray, high: np.ndarray, descale: int = 1) -> np.ndarray:
    """Horizontal 2-6 inverse.

    descale=1: standard >>1 (`InvertHorizontalStrip16s`).
    descale=2: `InvertHorizontalStripDescale16s`
      (`Codec/InvertHorizontalStrip16s.c:1374`): no >>1, result <<1 — the
      net x4 undoes the encoder's prescale-2.
    """
    low, high = low.astype(_I32), high.astype(_I32)
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
    even = np.concatenate([even_f[..., None], even_i, even_l[..., None]], -1)
    odd = np.concatenate([odd_f[..., None], odd_i, odd_l[..., None]], -1)
    if descale == 2:
        even <<= 1
        odd <<= 1
    else:
        even >>= 1
        odd >>= 1
    h, half = low.shape
    out = np.empty((h, half * 2), dtype=_I32)
    out[:, 0::2] = sat16(even)
    out[:, 1::2] = sat16(odd)
    return out


def h26_inverse_to_row16u(low: np.ndarray, high: np.ndarray,
                          precision: int = 10) -> np.ndarray:
    """Final horizontal 2-6 inverse for the DEEP output paths, pinned
    byte-exact against `InvertHorizontalStrip16sToRow16u`
    (`Codec/InvertHorizontalStrip16s.c:16571`): the reconstruction sum is
    clamped to [0, 2*2^precision-1] (the SSE protection add/sub pair)
    and floor-divided by two — no rounding, no dither — then scaled to
    16-bit (<< 16-precision).  This is the horizontal stage the reference
    uses for every 16-bit planar output (YU64/v210/RG48/... via
    `TransformInverseSpatialUniversalThreadedToRow16u`,
    `Codec/decoder.c:26359-26365`).  Returns (H, 2*half) uint16-valued
    int32 rows."""
    low, high = low.astype(_I32), high.astype(_I32)
    te = (low[..., :-2] - low[..., 2:] + ROUNDING) >> 3
    to = (-low[..., :-2] + low[..., 2:] + ROUNDING) >> 3
    even_i = te + low[..., 1:-1] + high[..., 1:-1]
    odd_i = to + low[..., 1:-1] - high[..., 1:-1]
    t0e = (11 * low[..., 0] - 4 * low[..., 1] + low[..., 2] + ROUNDING) >> 3
    t0o = (5 * low[..., 0] + 4 * low[..., 1] - low[..., 2] + ROUNDING) >> 3
    tke = (5 * low[..., -1] + 4 * low[..., -2] - low[..., -3] + ROUNDING) >> 3
    tko = (11 * low[..., -1] - 4 * low[..., -2] + low[..., -3] + ROUNDING) >> 3
    even = np.concatenate([(t0e + high[..., 0])[..., None], even_i,
                           (tke + high[..., -1])[..., None]], -1)
    odd = np.concatenate([(t0o - high[..., 0])[..., None], odd_i,
                          (tko - high[..., -1])[..., None]], -1)
    lim = (2 << precision) - 1
    shift = 16 - precision
    h, half = low.shape
    # SSE lanes clamp the sum to [0, lim] BEFORE >>1/<<shift (clean low
    # bits); the scalar tail and right border shift first and clamp the
    # 16-bit store (SATURATE_16U) — a clipped tail pixel stores 65535,
    # not 1023<<6 (InvertHorizontalStrip16s.c:16930-16965)
    sse_e = np.clip(even, 0, lim) >> 1 << shift
    sse_o = np.clip(odd, 0, lim) >> 1 << shift
    scl_e = np.clip((even >> 1) << shift, 0, 65535)
    scl_o = np.clip((odd >> 1) << shift, 0, 65535)
    if half >= 16:
        post = half - (half % 8) - 16
        tail0 = post + 7          # first scalar column
    else:
        tail0 = 2                 # no fast loop: scalar from col 2 on?
    out = np.empty((h, half * 2), dtype=_I32)
    out[:, 0::2] = sse_e
    out[:, 1::2] = sse_o
    out[:, 2 * tail0::2] = scl_e[:, tail0:]
    out[:, 2 * tail0 + 1::2] = scl_o[:, tail0:]
    # left border lanes are saturated at 10 bits before the SSE shift
    # (even<<shift; SATURATE_16U; >>shift) — same as the SSE clamp
    out[:, 0] = sse_e[:, 0]
    out[:, 1] = sse_o[:, 0]
    return out


def chroma_422_to_444(u: np.ndarray, width: int,
                      interpolate: bool = True) -> np.ndarray:
    """`ChannelYUYV16toPlanarYUV16` chroma upsample
    (`Codec/RGB2YUV.c:1308`): with COLOR_SPACE_422_TO_444 the SSE loop
    emits even = 2*(u>>1), odd = (u[k]>>1)+(u[k+1]>>1) for the first
    width&~15 columns; the scalar tail REPLICATES the raw chroma value
    for both columns of each remaining pair.  u is (H, width/2) 16-bit;
    returns (H, width)."""
    h = u.shape[0]
    out = np.empty((h, width), dtype=_I32)
    u = u.astype(_I32)
    if interpolate:
        hs = u >> 1
        nxt = np.concatenate([hs[:, 1:], hs[:, -1:]], axis=1)
        out[:, 0::2] = hs * 2
        out[:, 1::2] = hs + nxt
        w16 = width & ~15
        for x in range(w16, width, 2):
            out[:, x] = u[:, x >> 1]
            out[:, x + 1] = u[:, x >> 1]
    else:
        out[:, 0::2] = u
        out[:, 1::2] = u
    return out


#: CG YUV->RGB multipliers at 13-bit fixed point, exactly as the
#: reference computes them: float32 products plus the TWEAK_YUV2RGB
#: per-coefficient adjustments (`PlanarYUV16toPlanarRGB16`,
#: `Codec/RGB2YUV.c:40-57,1824-1846`).  Tweak order:
#: [y_offset, ymult, r_vmult, g_vmult, g_umult, b_umult, u_off, v_off]
def _yuv2rgb_coeffs(ry, rv, gv, gu, bu, tweak):
    f = np.float32
    return {
        "y_offset": 2048 + tweak[0],
        "ymult": int(f(8192) * f(ry)) + tweak[1],
        "r_vmult": int(f(8192) * f(rv)) + tweak[2],
        "g_vmult": int(f(8192) * f(gv)) + tweak[3],
        "g_umult": int(f(8192) * f(gu)) + tweak[4],
        "b_umult": int(f(8192) * f(bu)) + tweak[5],
        "u_offset": (1 << 14) + tweak[6],
        "v_offset": (1 << 14) + tweak[7],
    }


_YUV2RGB_CG709 = _yuv2rgb_coeffs(1.164, 1.793, 0.534, 0.213, 2.115,
                                 (-32, 11, 6, -17, -6, 0, 22, 22))
_YUV2RGB_CG601 = _yuv2rgb_coeffs(1.164, 1.596, 0.813, 0.391, 2.018,
                                 (-28, 14, 6, 1, 7, 3, 23, 23))


def yuv16_to_rgb16(y16: np.ndarray, u16: np.ndarray, v16: np.ndarray,
                   colorspace: int = 2) -> tuple[np.ndarray, ...]:
    """`PlanarYUV16toPlanarRGB16` (`Codec/RGB2YUV.c:1760`), pinned:
    inputs >>1 to 15-bit, offsets subtracted, 13-bit fixed-point CG
    matrix via mulhi (>>16 floor), <<2 to 14-bit, clamp [0,16383], <<2
    to 16-bit.  u16 is the 4:4:4 plane fed to the U taps (the reference
    wires channel 2 there), v16 the V taps (channel 1).  Deterministic,
    no dither.  Returns (r16, g16, b16) int32."""
    k = _YUV2RGB_CG601 if (colorspace & 3) == 1 else _YUV2RGB_CG709

    def sat16_(x):
        return np.clip(x, -32768, 32767)

    def wrap16(x):
        return ((x + 32768) & 0xFFFF) - 32768

    y = (y16.astype(np.int64) >> 1) - k["y_offset"]
    u = (u16.astype(np.int64) >> 1) - k["u_offset"]
    v = (v16.astype(np.int64) >> 1) - k["v_offset"]
    ym = (y * k["ymult"]) >> 16
    # the SSE kernel negates the G multipliers before mulhi, so the >>16
    # floor applies to the negated product (RGB2YUV.c:1919-1920)
    r = sat16_(ym + ((v * k["r_vmult"]) >> 16))
    g = sat16_(sat16_(ym + ((u * -k["g_umult"]) >> 16))
               + ((v * -k["g_vmult"]) >> 16))
    b = sat16_(ym + ((u * k["b_umult"]) >> 16))
    out = []
    for c in (r, g, b):
        x14 = wrap16(c << 2)                     # slli_epi16 wraps
        z = sat16_(x14 + 16384) & 0xFFFF         # adds_epi16 then as-unsigned
        c14 = np.maximum(z - 16384, 0)           # subs_epu16
        out.append(((c14 << 2) & 0xFFFF).astype(_I32))  # final slli wraps
    return tuple(out)


def v26_inverse_shifted_bottom(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """v26_inverse with the bottom border taps one row STALE
    (5*L[-2]+4*L[-3]-L[-4] instead of L[-1..-3], highpass row -1):
    `InvertSpatialQuantOverflowProtected16s` advances its lowpass pointer
    once more than its border filter expects, so the last lowpass row
    never contributes (`Codec/spatial.c:21114+690`, pointer walk pinned
    against captured intermediates).  Only the (lowlow, highlow) vertical
    pair is affected — the (lowhigh, highhigh) side reads a rotating line
    buffer that DOES hold the true last rows, so dwt2d_inverse applies
    this to the `low` half only."""
    out = v26_inverse(low, high)
    low, high = low.astype(_I32), high.astype(_I32)
    tke = (5 * low[-2] + 4 * low[-3] - low[-4] + ROUNDING) >> 3
    tko = (11 * low[-2] - 4 * low[-3] + low[-4] + ROUNDING) >> 3
    out[-2] = sat16((tke + high[-1]) >> 1)
    out[-1] = sat16((tko - high[-1]) >> 1)
    return out


def dwt2d_inverse(ll, lh, hl, hh, descale: int = 1,
                  bottom_shift: bool = False) -> np.ndarray:
    """One 2D production inverse level: vertical then horizontal.

    bottom_shift=True replicates `InvertSpatialQuantOverflowProtected16s`
    (the GOP w5/w3 pyramid inverse): stale bottom taps on the (ll, hl)
    pair ONLY; the (lh, hh) side keeps the standard border.  The default
    matches `InvertSpatialQuantDescale16s` / `InvertSpatialQuant16s`."""
    v26 = v26_inverse_shifted_bottom if bottom_shift else v26_inverse
    low = v26(ll, hl)
    high = v26_inverse(lh, hh)
    return h26_inverse(low, high, descale)


def h26_inverse_to_output(low: np.ndarray, high: np.ndarray,
                          descale_shift: int = 2,
                          dither: np.ndarray | None = None,
                          scalar_tail: int = 0) -> np.ndarray:
    """Final horizontal inverse fused with conversion to 8-bit output.

    Contract: `InvertHorizontalStrip16sToYUYV`
    (`Codec/InvertHorizontalStrip16s.c:3770`), pinned empirically against
    the reference binary (byte-exact with `decode_dither_rows`):
      border pairs:   ((6tap+4)>>3 ± high + 3) >> 3, no dither;
      interior:       (max((l[k-1]-l[k+1]+4)>>3 + l[k] ± h[k], 0)
                       + 3 + 2*dither) >> 3, dither in {0,1} drawn from
                      glibc rand() (see decode_dither_rows);
      final pack saturates to [0, 255].
    (descale_shift kept for API compatibility; the production YUY2 decode
    path is precision 10 -> shift 2, i.e. a total >>3 with the >>1.)
    """
    low, high = low.astype(_I32), high.astype(_I32)
    te = (low[..., :-2] - low[..., 2:] + ROUNDING) >> 3
    to = (-low[..., :-2] + low[..., 2:] + ROUNDING) >> 3
    total = descale_shift + 1
    bias = (1 << (total - 1)) - 1  # 3 for the 10-bit path (total >> 3)
    # Interior SSE lanes, exact int16 semantics (pinned against the
    # kernel driven directly with srand(1) dither): the "+bias" is the
    # exactly-propagated lowpass channeloffset riding in the coefficient
    # data; clamping-at-zero happens via the +2048 adds_epi16 /
    # subs_epu16 pair, which WRAPS for sums below -2048 (emitting bright
    # pixels where a plain max() would emit 0); the final +dither uses
    # saturating adds and a LOGICAL >>2 on the int16 lane.
    de = dither[..., 0::2][..., 1:-1] if dither is not None else 0
    do = dither[..., 1::2][..., 1:-1] if dither is not None else 0

    def _sse_lane(t, h_, sign, d):
        e1 = sat16(t + low[..., 1:-1] + bias)
        x = sat16(sat16(e1 + 2048) + sign * h_)
        u = x & 0xFFFF
        y = np.where(u >= 2048, u - 2048, 0)
        s = wrap16(y) >> 1
        t8 = sat16(s + d)
        return np.clip(wrap16((t8 & 0xFFFF) >> descale_shift), 0, 255)

    even_i = _sse_lane(te, high[..., 1:-1], +1, de)
    odd_i = _sse_lane(to, high[..., 1:-1], -1, do)
    if scalar_tail:
        # the reference's end-of-row scalar loop: plain int arithmetic,
        # no dither, no wrap quirks (InvertHorizontalStrip16s.c:4680+)
        v2e = np.maximum(te + low[..., 1:-1] + high[..., 1:-1], 0)
        v2o = np.maximum(to + low[..., 1:-1] - high[..., 1:-1], 0)
        se = (v2e + bias) >> total
        so = (v2o + bias) >> total
        # the scalar region spans the last `scalar_tail` output columns;
        # its final pair is the right border (handled below), leaving
        # scalar_tail/2 - 1 interior pairs to overwrite
        n = scalar_tail // 2 - 1
        if n > 0:
            even_i[..., -n:] = se[..., -n:]
            odd_i[..., -n:] = so[..., -n:]
    t0e = (11 * low[..., 0] - 4 * low[..., 1] + low[..., 2] + ROUNDING) >> 3
    t0o = (5 * low[..., 0] + 4 * low[..., 1] - low[..., 2] + ROUNDING) >> 3
    even_f = (t0e + high[..., 0] + bias) >> total
    odd_f = (t0o - high[..., 0] + bias) >> total
    tke = (5 * low[..., -1] + 4 * low[..., -2] - low[..., -3] + ROUNDING) >> 3
    tko = (11 * low[..., -1] - 4 * low[..., -2] + low[..., -3] + ROUNDING) >> 3
    even_l = (tke + high[..., -1] + bias) >> total
    odd_l = (tko - high[..., -1] + bias) >> total
    even = np.concatenate([np.clip(even_f, 0, 255)[..., None], even_i,
                           np.clip(even_l, 0, 255)[..., None]], -1)
    odd = np.concatenate([np.clip(odd_f, 0, 255)[..., None], odd_i,
                          np.clip(odd_l, 0, 255)[..., None]], -1)
    h, half = low.shape
    out = np.empty((h, half * 2), dtype=_I32)
    out[:, 0::2] = even
    out[:, 1::2] = odd
    return np.clip(out, 0, 255).astype(np.uint8)


def decode_dither_rows(height: int, frame_index: int = 0) -> np.ndarray:
    """Per-row output dither vectors replicating the reference decoder.

    `InvertHorizontalStrip16sToYUYV` draws 16 `rand()&1` bits per output
    row (two 8-lane SSE rounding vectors, InvertHorizontalStrip16s.c:3869)
    from glibc's default-seed rand().  The decoder emits the two border
    strips first, so the draw blocks land on rows in the order
    [0, 1, H-2, H-1, 2, 3, ..., H-3] (pinned against the reference binary).
    Returns (height, 16) bits; lanes 0-7 = rounding1, 8-15 = rounding2.
    frame_index selects the draw window for the n-th decoded frame of one
    decoder process (GOP groups decode two frames back to back).
    """
    from cineform_tpu.utils.glibc_random import glibc_rand_sequence

    draws = (glibc_rand_sequence(16 * height * (frame_index + 1)) & 1)
    draws = draws[16 * height * frame_index:].reshape(height, 16)
    row_draws = np.empty((height, 16), dtype=np.int64)
    order = [0, 1, height - 2, height - 1] + list(range(2, height - 2))
    for blk, r in enumerate(order):
        row_draws[r] = draws[blk]
    return row_draws


def decode_dither_plane(row_draws: np.ndarray, width: int,
                        group: int | None = None) -> np.ndarray:
    """Expand per-row 16-bit dither vectors to a (H, width) channel plane.

    Output column c >= 2 takes lane (c-2)%8 of rounding1 when
    ((c-2)//8)%2 == 0 else of rounding2 (the SSE groups alternate
    rounding1/rounding2 every 8 outputs); the four border columns are
    undithered.  Y, U and V share the same row vectors.

    group: the channel's SSE output group size (16 for luma, 8 for
    chroma).  When the width leaves a half-step remainder
    (width % (2*group) == group, e.g. luma width 112) the reference's
    fast loop stops one group early and the final `group` columns
    decode through the UNDITHERED scalar tail (pinned against the
    reference decoder at 112x48/144x96).
    """
    h = row_draws.shape[0]
    d = np.zeros((h, width), dtype=np.int64)
    m = np.arange(width - 4)
    lane = m % 8 + 8 * ((m // 8) % 2)
    d[:, 2:-2] = row_draws[:, lane]
    if group and width % (2 * group) == group:
        d[:, width - group:] = 0
    return d


# ---------------------------------------------------------------------------
# Channel-level forward/inverse transforms
# ---------------------------------------------------------------------------

def forward_channel(plane: np.ndarray, band_quant, prescale):
    """3-level intra forward for one channel.

    Returns (lowpass int32 (h/8, w/8), bands) where bands[k] = (LH, HL, HH)
    quantized coefficients of wavelet k (0 = finest).
    """
    ll = plane
    bands = []
    for k in range(3):
        ll, highs = dwt2d_forward(ll, prescale[k], band_quant[k])
        bands.append(highs)
    return ll, bands


def inverse_channel_to_16s(lowpass: np.ndarray, bands, prescale) -> np.ndarray:
    """Inverse through w[2] and w[1]; returns the reconstructed w[0] lowpass
    input (still needs the final level + output conversion)."""
    ll = lowpass
    for k in (2, 1):
        lh, hl, hh = bands[k]
        descale = 2 if prescale[k] == 2 else 1
        ll = dwt2d_inverse(ll, lh, hl, hh, descale)
    return ll


def inverse_channel_to_8bit(lowpass, bands, prescale, descale_shift=2,
                            dither=None, dither_group=None):
    """Full inverse for one channel producing the 8-bit output plane.

    `dither` is either None, a precomputed (H, W) plane, or the (H, 16)
    row-draw matrix from `decode_dither_rows` (expanded per channel
    width here; `dither_group` is the channel's SSE group size — 16
    luma / 8 chroma — for the half-step undithered tail rule).
    """
    ll = inverse_channel_to_16s(lowpass, bands, prescale)
    lh, hl, hh = bands[0]
    low = v26_inverse(ll, hl)
    high = v26_inverse(lh, hh)
    width = low.shape[-1] * 2
    tail = dither_group if (dither_group
                            and width % (2 * dither_group) == dither_group) \
        else 0
    if dither is not None and dither.shape[-1] == 16:
        dither = decode_dither_plane(dither, width, dither_group)
    return h26_inverse_to_output(low, high, descale_shift, dither,
                                 scalar_tail=tail)


def dequant_band(codes: np.ndarray, q: int, flags: int = 4) -> np.ndarray:
    """FSM dequantization: companding expansion then int16-wrapping multiply
    (`ScaleFSM` codebooks.c:1345 + `DeQuantFSM` decoder.c:20551)."""
    from cineform_tpu.spec import codebooks as cb

    c = codes.astype(np.int64)
    mag = np.abs(c)
    expand = np.array([cb.expand_code(m, flags) for m in range(int(mag.max()) + 1)],
                      dtype=np.int64)
    return wrap16(np.sign(c) * expand[mag] * q)


def unpack_rg48(raw: bytes | np.ndarray, width: int, height: int) -> list[np.ndarray]:
    """RG48 (16-bit RGB) -> 12-bit planes in CFHD channel order [G, R, B]
    (`Codec/frame.c` ConvertRGB48ToFrame16s; order pinned vs golden)."""
    arr = (np.frombuffer(raw, dtype="<u2") if isinstance(raw, (bytes, bytearray))
           else raw)
    px = arr.reshape(height, width, 3).astype(_I32)
    return [px[:, :, 1] >> 4, px[:, :, 0] >> 4, px[:, :, 2] >> 4]


def unpack_b64a(raw: bytes | np.ndarray, width: int, height: int) -> list[np.ndarray]:
    """b64a (16-bit ARGB) -> 12-bit planes [G, R, B, A].

    Quirks pinned against the reference (`ConvertBGRA64ToFrame_4444_16s`,
    `Codec/frame.c:6569`): the pixel loop reads the nominally big-endian
    b64a words as native little-endian WITHOUT byte swapping, and the alpha
    channel gets the extreme-preserving step curve
    ((a*223+128)>>8)+256 for 0 < a < 4095 (`frame.c:6699-6706`).
    """
    arr = (np.frombuffer(raw, dtype="<u2") if isinstance(raw, (bytes, bytearray))
           else raw)
    px = arr.reshape(height, width, 4).astype(_I32)
    a, r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2], px[:, :, 3]
    a = a >> 4
    a = np.where((a > 0) & (a < 4095), ((a * 223 + 128) >> 8) + 256, a)
    return [g >> 4, r >> 4, b >> 4, a]


def byr4_log90_curve() -> np.ndarray:
    """The default BYR4 encode curve (LOG 90): 14-bit linear -> 12-bit log.

    `Codec/frame.c:5218-5237` BYR4_LOGTABLE with MAX_INPUT_PRECISION=14
    (`frame.c:4843`); float32 division and final multiply match the
    reference build bit for bit.
    """
    i = np.arange(1 << 14)
    x = i.astype(np.float32) / np.float32(16384.0)
    l2l = (np.log10(x.astype(np.float64) * 89.0 + 1.0)
           / np.log10(90.0)).astype(np.float32)
    return np.where(i == 0, 0, (l2l * np.float32(4095.0)).astype(np.int64))


RGB10_INPUT_FORMATS = {
    # fourcc -> (INPUT_FORMAT code, byteswap, (r_shift, g_shift, b_shift))
    "r210": (123, True, (20, 10, 0)),
    "DPX0": (128, True, (22, 12, 2)),
    "RG30": (122, False, (0, 10, 20)),
    "AB10": (125, False, (0, 10, 20)),
    "AR10": (124, False, (20, 10, 0)),
}


def unpack_rgb10(raw: bytes | np.ndarray, width: int, height: int,
                 fourcc: str) -> list[np.ndarray]:
    """Packed 10-bit RGB (r210/DPX0/RG30/AB10/AR10) -> 12-bit planes
    [G, R, B] (`Codec/frame.c:6995` per-format component extraction:
    r210/DPX0 byte-swap the 32-bit word; the component layouts are
    r210=(r<<20|g<<10|b), DPX0=(r<<22|g<<12|b<<2), RG30/AB10=(b<<20|g<<10|r),
    AR10=(r<<20|g<<10|b) little-endian)."""
    _, swap, (rs, gs, bs) = RGB10_INPUT_FORMATS[fourcc]
    arr = (np.frombuffer(raw, dtype="<u4") if isinstance(raw, (bytes, bytearray))
           else raw)
    w = arr.reshape(height, width).astype(np.int64)
    if swap:
        w = (((w & 0xFF) << 24) | ((w & 0xFF00) << 8)
             | ((w >> 8) & 0xFF00) | (w >> 24))
    r = (w >> rs) & 0x3FF
    g = (w >> gs) & 0x3FF
    b = (w >> bs) & 0x3FF
    return [(g << 2).astype(_I32), (r << 2).astype(_I32),
            (b << 2).astype(_I32)]


def _alpha_companding(a12: np.ndarray) -> np.ndarray:
    """Encode-side alpha step curve shared by b64a and RG64
    (`Codec/frame.c:6699-6706`): extremes preserved exactly."""
    return np.where((a12 > 0) & (a12 < 4095),
                    ((a12 * 223 + 128) >> 8) + 256, a12).astype(_I32)


def unpack_bgra(raw: bytes | np.ndarray, width: int, height: int) -> list[np.ndarray]:
    """BGRA (8-bit, bottom-up rows like a Windows DIB) -> 12-bit planes
    [G, R, B] (`ConvertBGRAToFrame16s`; alpha ignored for RGB 4:4:4)."""
    arr = (np.frombuffer(raw, dtype=np.uint8)
           if isinstance(raw, (bytes, bytearray)) else raw)
    px = arr.reshape(height, width, 4).astype(_I32)[::-1]
    return [px[:, :, 1] << 4, px[:, :, 2] << 4, px[:, :, 0] << 4]


def unpack_rg24(raw: bytes | np.ndarray, width: int, height: int) -> list[np.ndarray]:
    """RG24 (8-bit BGR, bottom-up rows) -> 12-bit planes [G, R, B]."""
    arr = (np.frombuffer(raw, dtype=np.uint8)
           if isinstance(raw, (bytes, bytearray)) else raw)
    px = arr.reshape(height, width, 3).astype(_I32)[::-1]
    return [px[:, :, 1] << 4, px[:, :, 2] << 4, px[:, :, 0] << 4]


def unpack_rg64(raw: bytes | np.ndarray, width: int, height: int) -> list[np.ndarray]:
    """RG64 (16-bit RGBA little-endian) -> 12-bit planes [G, R, B, A] with
    the b64a alpha companding curve."""
    arr = (np.frombuffer(raw, dtype="<u2")
           if isinstance(raw, (bytes, bytearray)) else raw)
    px = arr.reshape(height, width, 4).astype(_I32)
    return [px[:, :, 1] >> 4, px[:, :, 0] >> 4, px[:, :, 2] >> 4,
            _alpha_companding(px[:, :, 3] >> 4)]


def unpack_byr5(raw: bytes | np.ndarray, width: int, height: int,
                bayer_format: int = 0) -> list[np.ndarray]:
    """BYR5 (packed 12-bit Bayer: per quarter-res row, the four component
    rows' high bytes then their 4-bit remainders two-per-byte, low nibble
    first) -> quarter-res 12-bit planes [G, RG, BG, DG]
    (`ConvertBYR5ToFrame16s`, `Codec/frame.c:5473`).  Linear (no LOG curve,
    unlike BYR4):

        G  = (g1 + g2) >> 1          RG = (r - G + 4096) >> 1
        DG = (g1 - g2 + 4096) >> 1   BG = (b - G + 4096) >> 1
    """
    arr = (np.frombuffer(raw, dtype=np.uint8)
           if isinstance(raw, (bytes, bytearray)) else raw)
    wc, hc = width // 2, height // 2
    rowbytes = 4 * wc * 3 // 2
    rows = arr[:rowbytes * hc].reshape(hc, rowbytes).astype(np.int64)
    high = rows[:, :4 * wc]
    nib = rows[:, 4 * wc:4 * wc + 2 * wc]
    low = np.empty((hc, 4 * wc), np.int64)
    low[:, 0::2] = nib & 0xF
    low[:, 1::2] = (nib >> 4) & 0xF
    v = (high << 4) | low
    c = [v[:, i * wc:(i + 1) * wc] for i in range(4)]
    if bayer_format == 0:      # RED_GRN
        r, g1, g2, b = c
    elif bayer_format == 1:    # GRN_RED
        g1, r, b, g2 = c
    elif bayer_format == 2:    # GRN_BLU
        g1, b, r, g2 = c
    else:                      # BLU_GRN
        b, g1, g2, r = c
    g = (g1 + g2) >> 1
    rg = (r - g + 4096) >> 1
    bg = (b - g + 4096) >> 1
    dg = (g1 - g2 + 4096) >> 1
    return [p.astype(_I32) for p in (g, rg, bg, dg)]


def unpack_byr4(raw: bytes | np.ndarray, width: int, height: int,
                bayer_format: int = 0) -> list[np.ndarray]:
    """BYR4 (16-bit Bayer mosaic) -> quarter-res 12-bit planes
    [G, RG, BG, DG] (`ConvertBYR4ToFrame16s`, `Codec/frame.c:4993`):

        G  = (g1 + g2) >> 1
        RG = ((r - G) >> 1) + 2048
        BG = ((b - G) >> 1) + 2048
        DG = (g1 - g2 + 4096) >> 1

    after the LOG-90 encode curve (values indexed at 14-bit precision).
    bayer_format: CFHD_BAYER_FORMAT_* (0 = RED_GRN: rows R G / G B).
    """
    arr = (np.frombuffer(raw, dtype="<u2") if isinstance(raw, (bytes, bytearray))
           else raw)
    mosaic = arr.reshape(height, width).astype(np.int64) >> 2
    m = byr4_log90_curve()[mosaic]
    q00, q01 = m[0::2, 0::2], m[0::2, 1::2]
    q10, q11 = m[1::2, 0::2], m[1::2, 1::2]
    if bayer_format == 0:      # RED_GRN
        r, g1, g2, b = q00, q01, q10, q11
    elif bayer_format == 1:    # GRN_RED
        g1, r, b, g2 = q00, q01, q10, q11
    elif bayer_format == 2:    # GRN_BLU
        g1, b, r, g2 = q00, q01, q10, q11
    else:                      # BLU_GRN
        b, g1, g2, r = q00, q01, q10, q11
    g = (g1 + g2) >> 1
    rg = ((r - g) >> 1) + 2048
    bg = ((b - g) >> 1) + 2048
    dg = (g1 - g2 + 4096) >> 1
    return [p.astype(_I32) for p in (g, rg, bg, dg)]


def strip_to_bgra(y_low, y_high, u_low, u_high, v_low, v_high,
                  precision: int = 10) -> np.ndarray:
    """Fused final-level horizontal inverse + YUV->RGB for 8-bit BGRA
    output: exact model of `InvertHorizontalStripYUV16sToPackedRGB32`
    (`Codec/spatial.c:29577`), CG 709 coefficients
    (`ComputeColorCoefficientsYUVToRGB`, `Codec/dither.c:264`).

    The row is produced in three regimes, all replicated:
    - SSE fast region (pairs 0 .. post_column-1): saturating int16 filter
      lanes (subs/adds, the +2048/subs_epu16 zero clamp, srai), logical
      >>2 descale, then the staged conversion — yy = ((y8-16 clamped to
      [0,255]) << 7 mulhi 19072 << 1), r/g/b via mullo with srai
      pre-shifts, +32, srai 6, packus saturation.  Chroma is NOT
      interpolated: output pixel p uses chroma stream value p/2 (each
      chroma filter output covers two pixels).
    - scalar mid region (post_column .. width-2): plain integer filters
      and the direct integer conversion ((y-16)*19072 >> 7 etc.).
    - borders: the 11/-4/1 and 5/4/-1 formulas at both ends, with the
      right border pairing chroma border values per the last_y[0..3]
      block (spatial.c:31143-31330).

    Inputs are the v26 vertical-inverse rows per channel (y at full
    lowpass width, u/v at half).  Returns (h, 2*y_width, 4) uint8 BGRA
    rows (not flipped; RGB32 output is written bottom-up by the caller).
    """
    descale = precision - 8
    ymult, r_vmult, g_vmult, g_umult, b_umult = 19072, 230, 137, 55, 135
    luma_offset, chroma_offset = 16, 128

    def sat16(v):
        return np.clip(v, -32768, 32767)

    def subs_epu16(x, y):
        return np.maximum((np.asarray(x) & 0xFFFF) - y, 0)

    def sse_pairs(low, high):
        """Saturating SSE filter for interior pairs: returns (even, odd)
        arrays over filter indices 1..n-2 (taps centered at low[j])."""
        lm1, l0, lp1 = low[:, :-2], low[:, 1:-1], low[:, 2:]
        h0 = high[:, 1:-1]
        e = sat16(sat16(sat16(lm1.astype(np.int64) - lp1) + 4) >> 3)
        e = sat16(e + l0)
        e = subs_epu16(sat16(sat16(e + 2048) + h0), 2048) >> 1
        o = sat16(sat16(sat16(lp1.astype(np.int64) - lm1) + 4) >> 3)
        o = sat16(o + l0)
        o = subs_epu16(sat16(sat16(o + 2048) - h0), 2048) >> 1
        # logical >>2 on the uint16 lane
        return (e & 0xFFFF) >> descale, (o & 0xFFFF) >> descale

    def scalar_pairs(low, high):
        """Plain integer filter (scalar mid region), full precision."""
        lm1, l0, lp1 = low[:, :-2], low[:, 1:-1], low[:, 2:]
        h0 = high[:, 1:-1]
        e = (((lm1.astype(np.int64) - lp1 + 4) >> 3) + l0 + h0) >> 1
        o = (((lp1.astype(np.int64) - lm1 + 4) >> 3) + l0 - h0) >> 1
        return e >> descale, o >> descale

    def border_left(low, high):
        e = ((11 * low[:, 0].astype(np.int64) - 4 * low[:, 1]
              + low[:, 2] + 4) >> 3)
        e = ((e + high[:, 0]) >> 1) >> descale
        o = ((5 * low[:, 0].astype(np.int64) + 4 * low[:, 1]
              - low[:, 2] + 4) >> 3)
        o = ((o - high[:, 0]) >> 1) >> descale
        return e, o

    def border_right(low, high):
        e = ((5 * low[:, -1].astype(np.int64) + 4 * low[:, -2]
              - low[:, -3] + 4) >> 3)
        e = ((e + high[:, -1]) >> 1) >> descale
        o = ((11 * low[:, -1].astype(np.int64) - 4 * low[:, -2]
              + low[:, -3] + 4) >> 3)
        o = ((o - high[:, -1]) >> 1) >> descale
        return e, o

    h, width = y_low.shape          # width = luma band width (pairs)
    cwidth = u_low.shape[1]
    last_column = width - 2
    post_column = width - (width % 16)
    while post_column > last_column - 2:
        post_column -= 16

    def stream(low, high, n, post):
        """Per-pair value stream: [border_e, border_o, f(1).e, f(1).o,
        ...]: SSE semantics for filters 1..post-1, scalar for the rest,
        border formulas at both ends.  Returns (h, 2n)."""
        s = np.zeros((h, 2 * n), np.int64)
        be, bo = border_left(low, high)
        s[:, 0], s[:, 1] = be, bo
        se, so = sse_pairs(low, high)      # filters 1..n-2
        sce, sco = scalar_pairs(low, high)
        for j in range(1, n - 1):
            if j < post:
                s[:, 2 * j], s[:, 2 * j + 1] = se[:, j - 1], so[:, j - 1]
            else:
                s[:, 2 * j], s[:, 2 * j + 1] = sce[:, j - 1], sco[:, j - 1]
        re, ro = border_right(low, high)
        s[:, 2 * n - 2], s[:, 2 * n - 1] = re, ro
        return s

    yv = stream(np.asarray(y_low, np.int64), np.asarray(y_high, np.int64),
                width, post_column)
    uv = stream(np.asarray(u_low, np.int64), np.asarray(u_high, np.int64),
                cwidth, post_column // 2)
    vv = stream(np.asarray(v_low, np.int64), np.asarray(v_high, np.int64),
                cwidth, post_column // 2)

    w_out = 2 * width
    px = np.arange(w_out)
    uu = uv[:, px // 2]
    vx = vv[:, px // 2]

    sse_px = px < 2 * post_column

    # --- SSE conversion (saturating staged math on int16 lanes) ---------
    def as_i16(v):
        v = np.asarray(v, np.int64) & 0xFFFF
        return np.where(v >= 0x8000, v - 0x10000, v)

    y16 = as_i16(yv)
    u16 = as_i16(uu)
    v16 = as_i16(vx)
    lim = 0x7FFF - 0xFF
    yy = subs_epu16(sat16(sat16(y16 - luma_offset) + lim), lim)
    uc = subs_epu16(sat16(u16 + lim), lim)
    vc = subs_epu16(sat16(v16 + lim), lim)
    uc = sat16(uc - chroma_offset)
    vc = sat16(vc - chroma_offset)
    yy = (yy << 7) & 0xFFFF
    yy = np.where(yy >= 0x8000, yy - 0x10000, yy)
    yy = ((yy * ymult) >> 16) << 1
    def mullo(a, c):
        p = (np.asarray(a, np.int64) * c) & 0xFFFF
        return np.where(p >= 0x8000, p - 0x10000, p)
    r_sse = sat16(sat16(yy + (mullo(vc, r_vmult) >> 1)) + 32) >> 6
    g_sse = sat16(sat16(sat16(yy - (mullo(vc, g_vmult) >> 2))
                        - (mullo(uc, g_umult) >> 2)) + 32) >> 6
    b_sse = sat16(sat16(yy + mullo(uc, b_umult)) + 32) >> 6

    # --- scalar conversion ----------------------------------------------
    ys = (yv - luma_offset) * ymult >> 7
    us = uu - chroma_offset
    vs = vx - chroma_offset
    r_scl = (ys + r_vmult * vs + 64) >> 7
    g_scl = (2 * ys - g_umult * us - g_vmult * vs + 128) >> 8
    b_scl = (ys + 2 * b_umult * us + 64) >> 7

    r = np.where(sse_px, r_sse, r_scl)
    g = np.where(sse_px, g_sse, g_scl)
    b = np.where(sse_px, b_sse, b_scl)

    out = np.empty((h, w_out, 4), np.uint8)
    out[..., 0] = np.clip(b, 0, 255)
    out[..., 1] = np.clip(g, 0, 255)
    out[..., 2] = np.clip(r, 0, 255)
    out[..., 3] = 255
    return out
