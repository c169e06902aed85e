"""Exact model of the reference Lanczos image scaler.

Mirrors ConvertLib/ImageScaler.cpp (CLanczosScaler and friends):

- ``lanczos_coeff``        <- _LanczosCoeff          (ImageScaler.cpp:236-489)
- ``row_scale_factors``    <- ComputeRowScaleFactors (ImageScaler.cpp:122-141)
- ``column_scale_factors`` <- ComputeColumnScaleFactors (ImageScaler.cpp:144-190)
- ``scale_yu64_to_bgra64`` <- CImageScalerConverterYU64ToRGB::ScaleToBGRA64
                              (ImageScaler.cpp:2103-2250) with
                              CImageConverterYU64ToRGB::ConvertToBGRA64
                              (ImageConverter.cpp:183-262)
- ``scale_b64a_to_b64a``   <- CImageScalerConverterB64A::ScaleToB64A
                              (ImageScaler.cpp:2930-3100)
- ``scale_b64a_to_bgra``   <- CImageScalerConverterB64A::ScaleToBGRA
                              (ImageScaler.cpp:3563-3700)

The coefficient generator is floating-point sensitive: the reference mixes
C ``float`` and ``double`` arithmetic, so every intermediate here is
annotated with its C type and rounded through ``np.float32`` where the C
code stores a ``float``.  The mixing itself is 8.8 fixed point (mixvals sum
to 256) with >>8 and unsigned-16 clamping at every stage.

Note the public CFHD sample decoder compiles with ``#define _SCALING 0``
(DecoderSDK/SampleDecoder.cpp:77), so these scalers are unreachable through
CFHD_DecodeSample in the open-source release; they are pinned here against
a direct-call oracle of the compiled library (see tests/test_scaler.py).
"""

from __future__ import annotations

import math

import numpy as np

_PI = 3.1415926535  # ImageScaler.h:29 — truncated constant, not math.pi


def _f32(v) -> float:
    """Round a value through IEEE binary32 (C float store)."""
    return float(np.float32(v))


def lanczos_coeff(inputsize: int, outputsize: int, line: int,
                  changefielddominance: bool = False,
                  interlaced: bool = False, ilobes: int = 3):
    """Lanczos coefficients for one output line: list of (srcline, mixval).

    Exact mirror of _LanczosCoeff; mixvals are 8.8 fixed point summing
    to 256 (the largest tap absorbs any rounding residue).
    """
    lobes = _f32(ilobes)
    inputsizefield = inputsize

    if outputsize >= inputsize:
        # Upscale branch (ImageScaler.cpp:245-356).
        inv_step = _f32(np.float32(inputsize) / np.float32(outputsize))
        dst_pos = _f32(line)
        if interlaced:
            dst_pos = _f32(np.float32(dst_pos) / np.float32(2.0))
            if changefielddominance:
                if not (line & 1):
                    dst_pos = _f32(np.float32(dst_pos)
                                   - np.float32(inv_step) * np.float32(0.5))
            else:
                if line & 1:
                    dst_pos = _f32(np.float32(dst_pos)
                                   - np.float32(inv_step) * np.float32(0.5))
            inputsizefield >>= 1

        src_1st = _f32(np.float32(inv_step)
                       * (np.float32(dst_pos) - np.float32(lobes)))
        src_1st_whole = _f32(math.floor(src_1st))
        if src_1st > 0:
            dst_offset = _f32(np.float32(src_1st) - np.float32(src_1st_whole))
        else:
            dst_offset = _f32(abs(np.float32(src_1st_whole)
                                  - np.float32(src_1st)))

        x0 = _f32((np.float32(dst_pos) - np.float32(lobes))
                  - np.float32(dst_offset))
        bound = _f32(np.float32(dst_pos) + np.float32(lobes))
        step = 1.0
        scaleinput = 1
    else:
        # Downscale branch (ImageScaler.cpp:357-489).  Extreme ratios are
        # first reduced by powers of two (srclines multiplied back at the
        # end).
        scaleinput = 1
        while inputsize // outputsize > 4:
            scaleinput *= 2
            inputsize //= 2
            inputsizefield //= 2

        stepf = _f32(np.float32(outputsize) / np.float32(inputsize))
        inv_step = _f32(np.float32(inputsize) / np.float32(outputsize))
        dst_pos = _f32(line)
        if interlaced:
            dst_pos = _f32(np.float32(dst_pos) / np.float32(2.0))
            if changefielddominance:
                if not (line & 1):
                    dst_pos = _f32(np.float32(dst_pos)
                                   - np.float32(stepf) * np.float32(0.5))
            else:
                if line & 1:
                    dst_pos = _f32(np.float32(dst_pos)
                                   - np.float32(stepf) * np.float32(0.5))
            inputsizefield >>= 1

        src_1st = _f32(np.float32(inv_step)
                       * (np.float32(dst_pos) - np.float32(lobes)))
        src_1st_whole = _f32(math.floor(src_1st))
        if src_1st > 0:
            dst_offset = _f32((np.float32(src_1st) - np.float32(src_1st_whole))
                              * np.float32(stepf))
        else:
            dst_offset = _f32(abs(np.float32(src_1st_whole)
                                  - np.float32(src_1st)) * np.float32(stepf))

        x0 = _f32((np.float32(dst_pos) - np.float32(lobes))
                  - np.float32(dst_offset))
        bound = _f32(np.float32(dst_pos) + np.float32(lobes))
        step = stepf

    upscale = outputsize >= inputsize

    # First pass: accumulate the (double) normalisation t and the float
    # sinc values in iteration order.
    t = 0.0
    sincxval = []
    x = x0
    while x < bound:
        sincx = _f32(x - dst_pos)
        if -lobes <= sincx <= lobes:
            if sincx == 0.0:
                y = 1.0
            else:
                y = ((math.sin(sincx * _PI) / (sincx * _PI))
                     * (math.sin(sincx * _PI / lobes) / (sincx * _PI / lobes)))
            if upscale:
                srcline = int(math.floor(
                    _f32(np.float32(np.float32(dst_pos) * np.float32(inv_step))
                         + np.float32(sincx)) + 0.5))
            else:
                srcline = int(math.floor(x * inv_step + 0.5))
            if 0 <= srcline < inputsizefield:
                t += y
                sincxval.append(_f32(y))
        x += step

    # Second pass: quantise to 8.8 fixed point.
    samples = []
    tt = 0
    pos = 0
    x = x0
    while x < bound:
        sincx = _f32(x - dst_pos)
        if -lobes <= sincx <= lobes:
            if upscale:
                srcline = int(math.floor(
                    _f32(np.float32(np.float32(dst_pos) * np.float32(inv_step))
                         + np.float32(sincx)) + 0.5))
            else:
                srcline = int(math.floor(x * inv_step + 0.5))
            if 0 <= srcline < inputsizefield:
                y = (sincxval[pos] * 256.0) / t
                pos += 1
                if y > 0.5:
                    y += 0.5
                else:
                    y -= 0.5
                val = int(y)  # C cast: truncation toward zero
                if val != 0:
                    samples.append([srcline, val])
                tt += val
        x += step

    # Residue correction: the largest tap absorbs 256-tt.
    if tt != 256 and samples:
        maxpos = 0
        maxval = 0
        for j, (_, mix) in enumerate(samples):
            if mix > maxval:
                maxval = mix
                maxpos = j
        samples[maxpos][1] += 256 - tt

    if scaleinput > 1:
        for s in samples:
            s[0] *= scaleinput

    if interlaced and upscale:
        # ComputeColumnScaleFactors doubles srclines for field rendering.
        pass

    return [(s[0], s[1]) for s in samples]


def row_scale_factors(input_width: int, output_width: int, lobes: int = 3):
    """Per-destination-column taps: {dstx: [(srcx, mixval), ...]}."""
    return {x: lanczos_coeff(input_width, output_width, x, False, False, lobes)
            for x in range(output_width)}


def column_scale_factors(row: int, input_height: int, output_height: int,
                         render_field_type: int = 0, lobes: int = 3):
    """Column taps for one output row (empty when heights match)."""
    if input_height == output_height:
        return []
    if render_field_type == 0:
        return lanczos_coeff(input_height, output_height, row,
                             False, False, lobes)
    taps = lanczos_coeff(input_height, output_height, row, False, True, lobes)
    return [(s * 2 + (row & 1), m) for s, m in taps]


def _mix8(values: np.ndarray, taps) -> np.ndarray:
    """8.8 fixed-point tap mix with >>8 and [0, 65535] clamp.

    ``values`` is indexed by srcline along axis 0; the result has the
    remaining axes.
    """
    acc = np.zeros(values.shape[1:], dtype=np.int64)
    for src, mix in taps:
        acc += values[src].astype(np.int64) * mix
    acc >>= 8
    return np.clip(acc, 0, 65535)


def _scale_rows(values: np.ndarray, factors) -> np.ndarray:
    """Horizontally scale (rows, src) -> (rows, dst) with clamped 8.8 mix."""
    rows, _ = values.shape
    out = np.zeros((rows, len(factors)), dtype=np.int64)
    v64 = values.astype(np.int64)
    for dstx, taps in factors.items():
        acc = np.zeros(rows, dtype=np.int64)
        for srcx, mix in taps:
            acc += v64[:, srcx] * mix
        out[:, dstx] = np.clip(acc >> 8, 0, 65535)
    return out


_BT601_CS = dict(luma_offset=16, ymult=1.164, r_vmult=1.596,
                 g_vmult=0.813, g_umult=0.391, b_umult=2.018)
_CS709_CS = dict(luma_offset=16, ymult=1.164, r_vmult=1.793,
                 g_vmult=0.534, g_umult=0.213, b_umult=2.115)


def _yuv_to_rgb16(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                  coeffs=_BT601_CS):
    """ConvertToBGRA64 scalar conversion (ImageConverter.cpp:183-262).

    ``u``/``v`` follow the parameter names in the reference: ``u`` is the
    red/blue-independent chroma multiplied by r_vmult (the caller passes
    its V component here) and ``v`` the one multiplied by b_umult.
    Float32 arithmetic with C truncation to int and a [0, 65535] clamp.
    """
    mid_luma = coeffs["luma_offset"] << 8
    y1 = (y.astype(np.int64) - mid_luma).astype(np.float32)
    u1 = (u.astype(np.int64) - (128 << 8)).astype(np.float32)
    v1 = (v.astype(np.int64) - (128 << 8)).astype(np.float32)

    ymult = np.float32(coeffs["ymult"])
    r_vmult = np.float32(coeffs["r_vmult"])
    g_vmult = np.float32(coeffs["g_vmult"])
    g_umult = np.float32(coeffs["g_umult"])
    b_umult = np.float32(coeffs["b_umult"])

    base = (ymult * y1).astype(np.float32)
    r = (base + (r_vmult * u1).astype(np.float32)).astype(np.float32)
    g = ((base - (g_vmult * u1).astype(np.float32)).astype(np.float32)
         - (g_umult * v1).astype(np.float32)).astype(np.float32)
    b = (base + (b_umult * v1).astype(np.float32)).astype(np.float32)

    def clamp(c):
        return np.clip(c.astype(np.int64), 0, 65535)

    return clamp(r), clamp(g), clamp(b)


def scale_yu64_triples(yu64: bytes, input_width: int, input_height: int,
                       output_width: int, output_height: int):
    """Lanczos-scale LE YU64 to full-lattice 16-bit (Y, U, V) planes.

    The YU64 row layout is 16-bit slots [y, c1, y, c2]; the horizontal
    stage scales luma on the full lattice and chroma (slots 3 and 1) on
    the half lattice up to the full output width (the 4:4:4 upconversion
    is built into the scale), then the vertical stage mixes each plane
    with per-output-row column taps.  This is the shared front half of
    every ScaleTo* method on CImageScalerYU64.

    Returns (Y, U, V) int64 arrays of shape (output_height, output_width)
    where U is the slot-3 chroma (Cb) and V the slot-1 chroma (Cr).
    """
    data = np.frombuffer(yu64, dtype='<u2')
    data = data[:input_width * 2 * input_height].reshape(
        input_height, input_width * 2)

    luma = data[:, 0::2]
    # ScaleRowChroma: tmpU <- slot srcx*4+3, tmpV <- slot srcx*4+1
    chroma_u = data[:, 3::4]
    chroma_v = data[:, 1::4]

    fl = row_scale_factors(input_width, output_width)
    fc = row_scale_factors(input_width >> 1, output_width)

    inter_y = _scale_rows(luma, fl)
    inter_u = _scale_rows(chroma_u, fc)
    inter_v = _scale_rows(chroma_v, fc)

    if input_height == output_height:
        return inter_y, inter_u, inter_v

    ys = np.zeros((output_height, output_width), dtype=np.int64)
    us = np.zeros_like(ys)
    vs = np.zeros_like(ys)
    for yy in range(output_height):
        taps = column_scale_factors(yy, input_height, output_height)
        ys[yy] = _mix8(inter_y, taps)
        us[yy] = _mix8(inter_u, taps)
        vs[yy] = _mix8(inter_v, taps)
    return ys, us, vs


def scale_yu64_to_bgra64(yu64: bytes, input_width: int, input_height: int,
                         output_width: int, output_height: int,
                         swap_bytes: bool = True,
                         is709: bool = False) -> bytes:
    """ScaleToBGRA64: Lanczos-scale LE YU64 and convert to BGRA64 (ARGB16).

    Output is big-endian ARGB16 when ``swap_bytes`` (the non-Windows
    default in the reference).  Byte-exact vs the compiled reference
    scaler (tests/test_scaler.py).
    """
    ys, us, vs = scale_yu64_triples(yu64, input_width, input_height,
                                    output_width, output_height)
    coeffs = _CS709_CS if is709 else _BT601_CS
    out = np.zeros((output_height, output_width, 4), dtype=np.uint16)
    # Thread passes ConvertToBGRA64(y, v, u, ...): the triple's V slot
    # becomes the converter's "u" parameter and vice versa.
    r, g, b = _yuv_to_rgb16(ys, vs, us, coeffs)
    out[:, :, 0] = 65535
    out[:, :, 1] = r
    out[:, :, 2] = g
    out[:, :, 3] = b

    if swap_bytes:
        return out.astype('>u2').tobytes()
    return out.astype('<u2').tobytes()


def scale_yu64_to(yu64: bytes, input_width: int, input_height: int,
                  output_width: int, output_height: int,
                  fourcc: str, is709: bool = False) -> bytes:
    """Scaled decode output packing for every supported pixel format.

    The reference release only reaches the scaler for b64a output
    (ScaleToOutputBuffer, DecoderSDK/Conversion.cpp:455-474 — everything
    else asserts CFHD_ERROR_BADFORMAT, and the whole path is compiled out
    by ``_SCALING 0``).  For the remaining formats this applies the same
    fixed-point Lanczos engine and then packs with the codec's native
    output conversions: YUV formats take the scaled 16-bit triples
    directly; RGB formats go through ConvertToBGRA64's float coefficients
    (the only YUV->RGB the reference pairs with this scaler).
    """
    ys, us, vs = scale_yu64_triples(yu64, input_width, input_height,
                                    output_width, output_height)

    if fourcc == "b64a":
        return scale_yu64_to_bgra64(yu64, input_width, input_height,
                                    output_width, output_height,
                                    swap_bytes=True, is709=is709)

    if fourcc in ("YUY2", "2vuy"):
        y8 = (ys >> 8).astype(np.uint8)
        u8 = (us[:, 0::2] >> 8).astype(np.uint8)
        v8 = (vs[:, 0::2] >> 8).astype(np.uint8)
        quad = np.empty((output_height, output_width // 2, 4), np.uint8)
        if fourcc == "YUY2":
            quad[:, :, 0] = y8[:, 0::2]
            quad[:, :, 1] = u8
            quad[:, :, 2] = y8[:, 1::2]
            quad[:, :, 3] = v8
        else:
            quad[:, :, 0] = u8
            quad[:, :, 1] = y8[:, 0::2]
            quad[:, :, 2] = v8
            quad[:, :, 3] = y8[:, 1::2]
        return quad.tobytes()

    if fourcc == "YU64":
        row = np.empty((output_height, output_width * 2), np.uint16)
        row[:, 0::2] = ys
        row[:, 1::4] = vs[:, 0::2]
        row[:, 3::4] = us[:, 0::2]
        return row.astype('<u2').tobytes()

    if fourcc == "v210":
        y10 = (ys >> 6).astype(np.int64)
        u10 = (us[:, 0::2] >> 6).astype(np.int64)
        v10 = (vs[:, 0::2] >> 6).astype(np.int64)
        return _pack_v210(y10, u10, v10, output_width)

    coeffs = _CS709_CS if is709 else _BT601_CS
    r, g, b = _yuv_to_rgb16(ys, vs, us, coeffs)

    if fourcc == "RG48":
        row = np.empty((output_height, output_width, 3), np.uint16)
        row[:, :, 0] = r
        row[:, :, 1] = g
        row[:, :, 2] = b
        return row.astype('<u2').tobytes()
    if fourcc == "BGRA":
        row = np.empty((output_height, output_width, 4), np.uint8)
        row[:, :, 0] = b >> 8
        row[:, :, 1] = g >> 8
        row[:, :, 2] = r >> 8
        row[:, :, 3] = 255
        return row.tobytes()
    if fourcc in ("r210", "DPX0", "RG30", "AB10", "AR10"):
        r10, g10, b10 = r >> 6, g >> 6, b >> 6
        if fourcc == "r210":
            word = (r10 << 20) | (g10 << 10) | b10
            return word.astype('>u4').tobytes()
        if fourcc == "DPX0":
            word = (r10 << 22) | (g10 << 12) | (b10 << 2)
            return word.astype('>u4').tobytes()
        if fourcc == "RG30" or fourcc == "AB10":
            word = (b10 << 20) | (g10 << 10) | r10
            return word.astype('<u4').tobytes()
        word = (r10 << 20) | (g10 << 10) | b10        # AR10
        return word.astype('<u4').tobytes()

    raise ValueError(f"scaled decode to {fourcc!r} is not supported")


def _pack_v210(y10: np.ndarray, u10: np.ndarray, v10: np.ndarray,
               width: int) -> bytes:
    """Pack full-height 10-bit 4:2:2 planes into v210 rows (48-pixel
    groups, 128-byte row alignment), zero-filled tail."""
    h = y10.shape[0]
    row_words = ((width + 47) // 48) * 32
    out = np.zeros((h, row_words), dtype=np.uint32)
    ncomp = width * 2
    # interleave the Cb Y Cr Y Cb Y ... component stream
    stream = np.zeros((h, ncomp), dtype=np.uint32)
    stream[:, 0::4] = u10
    stream[:, 1::2] = y10
    stream[:, 2::4] = v10
    comp = np.zeros((h, ((ncomp + 5) // 6) * 6), dtype=np.uint32)
    comp[:, :ncomp] = stream
    words = (comp[:, 0::3] | (comp[:, 1::3] << 10) | (comp[:, 2::3] << 20))
    out[:, :words.shape[1]] = words
    return out.astype('<u4').tobytes()


def _scale_b64a_rows(argb: np.ndarray, input_width: int, output_width: int):
    """CImageScalerB64A::ScaleRowValues on (h, w, 4) LE ARGB16."""
    factors = row_scale_factors(input_width, output_width)
    h = argb.shape[0]
    inter = np.zeros((h, output_width, 4), dtype=np.int64)
    flat = argb.reshape(h, -1)
    for c in range(4):
        inter[:, :, c] = _scale_rows(flat[:, c::4], factors)
    return inter


def scale_b64a_to_b64a(argb16le: bytes, input_width: int, input_height: int,
                       output_width: int, output_height: int,
                       swap_bytes: bool = True) -> bytes:
    """ScaleToB64A: Lanczos-scale native LE ARGB16 to big-endian b64a."""
    argb = np.frombuffer(argb16le, dtype='<u2')
    argb = argb[:input_width * input_height * 4].reshape(
        input_height, input_width, 4)

    inter = _scale_b64a_rows(argb, input_width, output_width)

    out = np.zeros((output_height, output_width, 4), dtype=np.uint16)
    for yy in range(output_height):
        if input_height == output_height:
            vals = inter[yy]
        else:
            taps = column_scale_factors(yy, input_height, output_height)
            vals = np.stack([_mix8(inter[:, :, c], taps) for c in range(4)],
                            axis=-1)
        out[yy] = np.clip(vals, 0, 65535)

    # Non-Windows writer always byte swaps (ImageScaler.cpp:3030-3035).
    if swap_bytes:
        return out.astype('>u2').tobytes()
    return out.astype('<u2').tobytes()


def scale_b64a_to_bgra(argb16le: bytes, input_width: int, input_height: int,
                       output_width: int, output_height: int) -> bytes:
    """ScaleToBGRA: Lanczos-scale LE ARGB16 to 8-bit BGRA.

    Mirrors the reference's column stride quirk: ScaleToBGRAThread uses a
    stride of output_width*3 values when walking the 4-value-per-pixel
    intermediate buffer (ImageScaler.cpp:3597), so vertical taps read
    misaligned rows.  Deterministic, so reproduced verbatim.
    """
    argb = np.frombuffer(argb16le, dtype='<u2')
    argb = argb[:input_width * input_height * 4].reshape(
        input_height, input_width, 4)

    inter = _scale_b64a_rows(argb, input_width, output_width)
    flat = inter.reshape(-1)  # value stream, 4 per pixel per row
    stride = output_width * 3

    out = np.zeros((output_height, output_width, 4), dtype=np.uint8)
    for yy in range(output_height):
        taps = column_scale_factors(yy, input_height, output_height)
        for x in range(output_width):
            if input_height == output_height:
                base = stride * yy + 4 * x
                a, r, g, b = (int(flat[base + i]) for i in range(4))
            else:
                a = r = g = b = 0
                for src, mix in taps:
                    base = stride * src + 4 * x
                    if base + 4 > flat.size:
                        continue
                    a += int(flat[base]) * mix
                    r += int(flat[base + 1]) * mix
                    g += int(flat[base + 2]) * mix
                    b += int(flat[base + 3]) * mix
                a = min(max(a >> 8, 0), 65535)
                r = min(max(r >> 8, 0), 65535)
                g = min(max(g >> 8, 0), 65535)
                b = min(max(b >> 8, 0), 65535)
            a >>= 8
            r >>= 8
            g >>= 8
            b >>= 8
            out[yy, x] = (min(b, 255), min(g, 255), min(r, 255), min(a, 255))
    return out.tobytes()


def decoded_scale(input_width: int, input_height: int,
                  output_width: int, output_height: int):
    """DecodedScale (Codec/decoder.c:17437): pick the smallest half-step
    decode resolution still >= the output size (at most quarter)."""
    dw, dh = input_width, input_height
    output_height = abs(output_height)
    reduction = 0
    while dw > output_width and dh > output_height and reduction < 2:
        rw, rh = dw // 2, dh // 2
        if rw >= output_width and rh >= output_height:
            dw, dh = rw, rh
            reduction += 1
        else:
            break
    return dw, dh
