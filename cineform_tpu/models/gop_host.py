"""Host decode/encode of 2-frame GOP (FIELDPLUS) CFHD group samples.

Decode contract: `Codec/decoder.c:11180` DecodeSampleGroup with the
17-subband map at `decoder.c:11191`; encode assembles the GROUP sample
layout captured from the reference (SAMPLE=2 header, 6 wavelets, the
temporal wavelet's empty band entry with subband 255, GROUP trailer).

Group encode is BYTE-EXACT vs the reference encoder: for progressive
input the level-1 wavelets are spatial (encoder.c:9504), the temporal-high
LL (subband 7) is stored as an uncompressed big-endian 16-bit band
(BAND_ENCODING_16BIT) followed by the band-end codeword, and everything
else shares the intra machinery.

Group decode replicates the reference's full-res behavior (both frames
reconstructed from w0 + the temporal lowpass, see
ref/gop.inverse_channel_gop) FULLY byte-exactly, bottom strip included
(the pyramid bottom borders are pinned per function — stale low-pair
taps in InvertSpatialQuantOverflowProtected16s for w5/w3, standard in
Descale16s for w4 — and the temporal combine saturates before its >>1).
Interlaced groups decode with the replicated output dither within +-1
(>99.5% byte-exact).
"""

from __future__ import annotations

import numpy as np

from cineform_tpu.bitstream import parse_sample
from cineform_tpu.bitstream.writer import SampleWriter
from cineform_tpu.entropy import native as entropy_native
from cineform_tpu.models import intra_host
from cineform_tpu.models.intra_host import EncoderMetadata, align16_pixels
from cineform_tpu.ref import gop as gxf
from cineform_tpu.ref import intra as xf
from cineform_tpu.spec import tags
from cineform_tpu.spec.production import IntraParams, pack_prescale_table

# subband -> (wavelet index, band slot)
SUBBAND_MAP = {}
for _sb in (1, 2, 3):
    SUBBAND_MAP[_sb] = (5, _sb - 1)
for _sb in (4, 5, 6):
    SUBBAND_MAP[_sb] = (4, _sb - 4)
for _sb in (7, 8, 9, 10):
    SUBBAND_MAP[_sb] = (3, _sb - 7)
for _sb in (11, 12, 13):
    SUBBAND_MAP[_sb] = (1, _sb - 11)
for _sb in (14, 15, 16):
    SUBBAND_MAP[_sb] = (0, _sb - 14)


def _bandend_marker(codeset: int = 17) -> bytes:
    """The band-end codeword, MSB-aligned and zero-padded to 32 bits (what
    the reference emits after an uncompressed 16-bit band)."""
    from cineform_tpu.spec import codebooks as cb

    cs = cb.get_codeset(codeset)
    word = cs.bandend_bits << (32 - cs.bandend_size)
    return word.to_bytes(4, "big")


def decode_group(sample: bytes, reference_compatible: bool = True,
                 dither: bool = True,
                 dither_base: int = 0) -> tuple[bytes, bytes]:
    """Decode one GROUP sample into two YUY2 frames.

    reference_compatible=True replicates the reference decoder's
    repeated-call output (both frames from w0 + the temporal lowpass,
    differing only in output dither); False reconstructs the TRUE second
    frame from w1's bands over (tlow + thigh) >> 1 — the reference's own
    SAMPLE_TYPE_FRAME streaming path (`DecodeSampleFrame`,
    decoder.c:11482), byte-exact vs the binary.

    dither_base: index of the decoder's glibc rand() window for the first
    output frame (the stream continues across DecodeSample calls in one
    decoder instance; each emitted 8-bit frame consumes one window)."""
    from cineform_tpu.utils.glibc_random import glibc_rand_sequence

    s = parse_sample(sample)
    progressive = s.progressive
    frames0 = []
    frames1 = []
    if dither and progressive:
        d0 = xf.decode_dither_rows(s.height, dither_base)
        d1 = xf.decode_dither_rows(s.height, dither_base + 1)
    elif dither:
        # interlaced: 16 rand()&1 per output row PAIR, pairs in linear
        # order (InvertInterlacedRow16s10bitToYUV, temporal.c:5994);
        # frame 2 consumes the next window
        pairs = s.height // 2
        seq = glibc_rand_sequence(16 * pairs * (dither_base + 2)) & 1
        d0 = seq[16 * pairs * dither_base:
                 16 * pairs * (dither_base + 1)].reshape(pairs, 16)
        d1 = seq[16 * pairs * (dither_base + 1):].reshape(pairs, 16)
    else:
        d0 = d1 = None
    for ci, c in enumerate(s.channels):
        bands: dict[int, dict] = {0: {}, 1: {}, 3: {}, 4: {}, 5: {}}
        for b in c.bands:
            if b.subband == 255 or b.subband == 0:
                continue
            widx, slot = SUBBAND_MAP[b.subband]
            if getattr(b, "encoding", tags.BAND_ENCODING_RUNLENGTHS) == \
                    tags.BAND_ENCODING_16BIT:
                raw = np.frombuffer(b.data[:b.width * b.height * 2], ">i2")
                bands[widx][slot] = raw.reshape(b.height, b.width).astype(
                    np.int32) * b.quantization
                continue
            codeset = 18 if b.coding_flags == 18 else 17
            pitchw = align16_pixels(b.width)
            vals, _ = entropy_native.decode_band(
                b.data, pitchw * b.height, codeset=codeset,
                quant=b.quantization)
            vals = vals.reshape(b.height, pitchw)[:, :b.width]
            if b.peaks is not None and b.peak_level:
                # peaks substitution (`Codec/decoder.c:19808`
                # DecodeBandFSM16sNoGapWithPeaks): decoded values beyond
                # PEAK_LEVEL take the next value from the band's peak
                # table, in raster order, as (peak / quant) * quant with
                # C truncating division (the FSM writes peak/quant into
                # the raw band, which the dequant pass multiplies back)
                mask = np.abs(vals) > b.peak_level
                flat = vals[mask]
                # bound by the peak table length: a truncated/corrupt sample
                # may decode more over-peak values than the table holds
                nsub = min(flat.size, b.peaks.size)
                q = b.quantization
                pk = b.peaks[:nsub].astype(np.int32)
                flat[:nsub] = (np.abs(pk) // q) * np.sign(pk) * q
                vals = vals.copy()
                vals[mask] = flat
            bands[widx][slot] = vals
        wb = {k: tuple(v[i] for i in sorted(v)) for k, v in bands.items()}
        if progressive:
            off = intra_host.lowpass_channel_offset(c.lowpass.shape[1],
                                                    num_frames=2)
        else:
            # the interlaced final stage is the absolute formula, so it
            # takes the reference's offset verbatim (+48 / +10 odd)
            off = intra_host.lowpass_offset_absolute(
                c.lowpass.shape[1], False, num_frames=2)
        lp = (c.lowpass + off).astype(c.lowpass.dtype) if off else c.lowpass
        f0, f1 = gxf.inverse_channel_gop(
            lp, wb, reference_compatible=reference_compatible,
            dither0=d0, dither1=d1, progressive=progressive,
            dither_group=16 if ci == 0 else 8, channel=ci)
        frames0.append(f0)
        frames1.append(f1)
    return xf.pack_yuy2(*frames0), xf.pack_yuy2(*frames1)


def decode_group_deep16(sample: bytes, deep_yuv: bool = True,
                        frame: int = 0) -> list[np.ndarray]:
    """Decode one GROUP frame to the reference's 16-bit planar rows
    (the deep-output reconstruction: `TransformInverseSpatial...ToRow16u`
    over the GOP pyramid).  Lowpass channel offset: +14 for deep YUV
    outputs / +48 otherwise at even widths, +10 at odd widths
    (`decoder.c:12258-12505`, num_frames=2 brackets).  frame selects the
    temporal field; the reference's own full-res group decode emits
    frame 0's reconstruction for both."""
    from cineform_tpu.models.intra_host import lowpass_offset_absolute

    s = parse_sample(sample)
    planes = []
    for ci, c in enumerate(s.channels):
        bands: dict[int, dict] = {0: {}, 1: {}, 3: {}, 4: {}, 5: {}}
        for b in c.bands:
            if b.subband in (255, 0):
                continue
            widx, slot = SUBBAND_MAP[b.subband]
            if getattr(b, "encoding", tags.BAND_ENCODING_RUNLENGTHS) == \
                    tags.BAND_ENCODING_16BIT:
                raw = np.frombuffer(b.data[:b.width * b.height * 2], ">i2")
                bands[widx][slot] = raw.reshape(
                    b.height, b.width).astype(np.int32) * b.quantization
                continue
            codeset = 18 if b.coding_flags == 18 else 17
            pitchw = align16_pixels(b.width)
            vals, _ = entropy_native.decode_band(
                b.data, pitchw * b.height, codeset=codeset,
                quant=b.quantization)
            bands[widx][slot] = vals.reshape(b.height, pitchw)[:, :b.width]
        wb = {k: tuple(v[i] for i in sorted(v)) for k, v in bands.items()}
        if deep_yuv:
            off = lowpass_offset_absolute(c.lowpass.shape[1], True,
                                          num_frames=2)
        else:
            off = lowpass_offset_absolute(c.lowpass.shape[1], False,
                                          num_frames=2)
        lp = (c.lowpass + off).astype(c.lowpass.dtype)
        ll4 = xf.dwt2d_inverse(lp, *wb[5], descale=1, bottom_shift=True)
        tlow = xf.dwt2d_inverse(ll4, *wb[4], descale=2)
        thigh = xf.dwt2d_inverse(wb[3][0], *wb[3][1:], descale=1,
                                 bottom_shift=True)
        if frame == 0:
            ll = xf.sat16(tlow.astype(np.int64) - thigh) >> 1
            lh, hl, hh = wb[0]
        else:
            # TRUE second frame: its own temporal field plus w1's coded
            # highpass bands (ReconstructSampleFrameToBuffer frame_index 1)
            ll = xf.sat16(tlow.astype(np.int64) + thigh) >> 1
            lh, hl, hh = wb[1]
        low = xf.v26_inverse(ll.astype(np.int32), hl)
        high = xf.v26_inverse(lh, hh)
        planes.append(xf.h26_inverse_to_row16u(low, high, s.precision))
    return planes


def decode_group_to(sample: bytes, fourcc: str, frame: int = 0) -> bytes:
    """Decode one GROUP frame to an alternate output format (the same
    deep-output packers as the intra path; YU64/v210/RG48/BGRA/... are
    byte-exact vs the reference decoding the GROUP sample)."""
    if fourcc == "2vuy":
        f0, f1 = decode_group(sample)
        a = np.frombuffer(f0 if frame == 0 else f1,
                          np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(a[:, [1, 0, 3, 2]]).tobytes()
    if fourcc == "BGRA":
        return decode_group_bgra(sample, frame)
    return intra_host.pack_deep_output(
        fourcc, decode_group_deep16(sample, deep_yuv=True, frame=frame),
        lambda: decode_group_deep16(sample, deep_yuv=False, frame=frame))


def decode_group_bgra(sample: bytes, frame: int = 0) -> bytes:
    """BYTE-EXACT GROUP BGRA decode: the GOP pyramid down to the final
    v26 strips (+48 absolute lowpass offset), then the fused
    PackedRGB32 kernel (ref.intra.strip_to_bgra,
    `InvertHorizontalStripYUV16sToPackedRGB32`); rows bottom-up."""
    from cineform_tpu.models.intra_host import lowpass_offset_absolute

    s = parse_sample(sample)
    strips = []
    for ci, c in enumerate(s.channels):
        bands: dict[int, dict] = {0: {}, 1: {}, 3: {}, 4: {}, 5: {}}
        for b in c.bands:
            if b.subband in (255, 0):
                continue
            widx, slot = SUBBAND_MAP[b.subband]
            if getattr(b, "encoding", tags.BAND_ENCODING_RUNLENGTHS) == \
                    tags.BAND_ENCODING_16BIT:
                raw = np.frombuffer(b.data[:b.width * b.height * 2], ">i2")
                bands[widx][slot] = raw.reshape(
                    b.height, b.width).astype(np.int32) * b.quantization
                continue
            codeset = 18 if b.coding_flags == 18 else 17
            pitchw = align16_pixels(b.width)
            vals, _ = entropy_native.decode_band(
                b.data, pitchw * b.height, codeset=codeset,
                quant=b.quantization)
            bands[widx][slot] = vals.reshape(b.height, pitchw)[:, :b.width]
        wb = {k: tuple(v[i] for i in sorted(v)) for k, v in bands.items()}
        off = lowpass_offset_absolute(c.lowpass.shape[1], False,
                                      num_frames=2)
        lp = (c.lowpass + off).astype(c.lowpass.dtype)
        ll4 = xf.dwt2d_inverse(lp, *wb[5], descale=1, bottom_shift=True)
        tlow = xf.dwt2d_inverse(ll4, *wb[4], descale=2)
        thigh = xf.dwt2d_inverse(wb[3][0], *wb[3][1:], descale=1,
                                 bottom_shift=True)
        if frame == 0:
            ll = xf.sat16(tlow.astype(np.int64) - thigh) >> 1
            lh, hl, hh = wb[0]
        else:
            ll = xf.sat16(tlow.astype(np.int64) + thigh) >> 1
            lh, hl, hh = wb[1]
        strips.append((xf.v26_inverse(ll.astype(np.int32), hl),
                       xf.v26_inverse(lh, hh)))
    (yl, yh), (c1l, c1h), (c2l, c2h) = strips
    out = xf.strip_to_bgra(yl, yh, c2l, c2h, c1l, c1h, s.precision)
    return out[::-1].tobytes()


def sequence_header(width: int, height: int,
                    input_format: int = tags.COLOR_FORMAT_YUYV) -> bytes:
    """The tiny sequence-header sample emitted for the first GOP frame
    (`PutVideoSequenceHeader`, observed layout from the reference)."""
    w = SampleWriter()
    w.put_tag(tags.SAMPLE, tags.SAMPLE_TYPE_SEQUENCE_HEADER)
    w.put_tag(tags.VERSION_MAJOR, 0)
    w.put_tag(tags.VERSION_MINOR, 1)
    w.put_tag(tags.VERSION_REVISION, 0)
    w.put_tag(tags.VERSION_EDIT, 0)
    w.put_tag(tags.SEQUENCE_FLAGS, 0)
    w.put_tag(tags.FRAME_WIDTH, width)
    w.put_tag(tags.FRAME_HEIGHT, height)
    w.put_tag(tags.FRAME_FORMAT, 2)
    w.put_tag_optional(tags.INPUT_FORMAT, input_format)
    return w.getvalue()


def frame_header_sample(width: int, height: int,
                        frame_number: int) -> bytes:
    """The 24-byte SAMPLE_TYPE_FRAME sample the encoder emits for the
    first submission of every group after the first (the reference emits
    the sequence header only for the stream's first frame,
    `Codec/encoder.c:3226-3229`).  In decode order this sample asks the
    decoder for the TRUE second frame of the group it currently holds
    (`DecodeSampleFrame`, `Codec/decoder.c:11482` ->
    `ReconstructSampleFrameToBuffer(frame_index=1)`).  Byte-exact vs the
    reference's 6-frame GOP stream (tests/test_gop.py).

    frame_number is the display number of that second frame (1-based
    stream position minus one: the sample emitted at submission 2k
    carries 2k-1)."""
    w = SampleWriter()
    w.put_tag(tags.SAMPLE, tags.SAMPLE_TYPE_FRAME)
    w.put_tag(tags.FRAME_TYPE, 2)
    w.put_tag(tags.FRAME_WIDTH, width)
    w.put_tag(tags.FRAME_HEIGHT, height)
    w.put_tag_optional(tags.FRAME_NUMBER, frame_number)
    w.put_tag(tags.FRAME_INDEX, 1)
    return w.getvalue()


def encode_group(frame0_yuy2: bytes, frame1_yuy2: bytes, width: int,
                 height: int, quality: int, frame_number: int = 1,
                 metadata: EncoderMetadata | None = None,
                 progressive: bool = True) -> bytes:
    """Encode two YUY2 frames into one CFHD GROUP sample.

    progressive=False encodes interlaced input through the HORZTEMP frame
    wavelets (`Codec/wavelet.c:6076` TransformForwardFrameYUV)."""
    f0 = xf.unpack_yuy2(frame0_yuy2, width, height)
    f1 = xf.unpack_yuy2(frame1_yuy2, width, height)
    channels = []
    for ch in range(3):
        bq = gxf.fieldplus_band_quant(quality, tags.PRECISION_10BIT, ch,
                                      progressive=progressive)
        lowpass, bands = gxf.forward_channel_gop(f0[ch], f1[ch], bq,
                                                 progressive=progressive)
        channels.append((lowpass, bands, bq))
    return write_group(channels, width, height, quality, frame_number,
                       metadata, progressive=progressive)


def write_group(channels, width: int, height: int, quality: int,
                frame_number: int = 1,
                metadata: EncoderMetadata | None = None,
                progressive: bool = True) -> bytes:
    """Assemble a GROUP sample from per-channel (lowpass, bands, quants)."""
    scales = gxf.fieldplus_band_scales()
    prescale = gxf.FIELDPLUS_PRESCALE

    w = SampleWriter()
    w.put_tag(tags.SAMPLE, tags.SAMPLE_TYPE_GROUP)
    index_off = w.put_index_placeholder(3)
    w.put_tag(tags.TRANSFORM_TYPE, tags.TRANSFORM_TYPE_FIELDPLUS)
    w.put_tag(tags.NUM_FRAMES, 2)
    w.put_tag(tags.NUM_CHANNELS, 3)
    w.put_tag_optional(tags.INPUT_FORMAT, tags.COLOR_FORMAT_YUYV)
    w.put_tag_optional(tags.ENCODED_COLORSPACE, tags.COLOR_SPACE_BT_709)
    w.put_tag(tags.NUM_WAVELETS, 6)
    w.put_tag(tags.NUM_SUBBANDS, 17)
    w.put_tag(tags.NUM_SPATIAL, 3)
    w.put_tag(tags.FIRST_WAVELET, tags.WAVELET_TYPE_SPATIAL)
    w.put_tag(tags.FRAME_WIDTH, width)
    w.put_tag(tags.FRAME_HEIGHT, height)
    w.put_tag_optional(tags.FRAME_NUMBER, frame_number)
    w.put_tag(tags.PRECISION, tags.PRECISION_10BIT)
    w.put_tag_optional(tags.FRAME_DISPLAY_HEIGHT, height)
    w.put_tag_optional(tags.VERSION, tags.FILE_VERSION_CODE)
    w.put_tag_optional(tags.QUALITY_L, quality & 0xFFFF)
    w.put_tag_optional(tags.QUALITY_H, (quality >> 16) & 0xFFFF)
    w.put_tag_optional(tags.PRESCALE_TABLE, pack_prescale_table(prescale))
    w.push_chunk(tags.SAMPLE_SIZE)
    meta = (metadata or EncoderMetadata()).block()
    w.put_tag_optional(tags.METADATA_CHUNK, len(meta) // 4)
    w.put_bytes(meta)
    w.put_tag_optional(tags.METADATA_CHUNK, 512 // 4)
    w.put_bytes(b"FREE" + (504).to_bytes(4, "little") + b"\0" * 504)
    w.put_tag_optional(tags.INTERLACED_FLAGS, 0)
    w.put_tag_optional(tags.PROTECTION_FLAGS, 0)
    w.put_tag_optional(tags.PICTURE_ASPECT_X, 16)
    w.put_tag_optional(tags.PICTURE_ASPECT_Y, 9)
    if progressive:
        # interlaced groups omit the tag; the decoder's default is
        # interlaced (`PutVideoGroupHeader` emits it only when progressive)
        w.put_tag(tags.SAMPLE_FLAGS, tags.SAMPLE_FLAGS_PROGRESSIVE)

    channel_sizes = []
    for ch in range(3):
        if ch > 0:
            w.pad_to_tag()
            w.put_tag(tags.SAMPLE, tags.SAMPLE_TYPE_CHANNEL)
            w.put_tag(tags.CHANNEL, ch)
        start = len(w.buf)
        lowpass, bands, bq = channels[ch]

        # lowpass band (subband 0)
        w.put_marker(tags.LOWPASS_START_CODE)
        w.put_tag(tags.LOWPASS_SUBBAND, 0)
        w.put_tag(tags.NUM_LEVELS, 4)
        w.put_tag(tags.LOWPASS_WIDTH, lowpass.shape[1])
        w.put_tag(tags.LOWPASS_HEIGHT, lowpass.shape[0])
        for t in (tags.MARGIN_LEFT, tags.MARGIN_TOP, tags.MARGIN_RIGHT,
                  tags.MARGIN_BOTTOM, tags.PIXEL_OFFSET):
            w.put_tag(t, 0)
        w.put_tag(tags.QUANTIZATION, 1)
        w.put_tag(tags.PIXEL_DEPTH, 16)
        w.push_chunk(tags.SUBBAND_SIZE)
        w.put_marker(tags.COEFFICIENT_START_CODE)
        w.put_bytes(lowpass.astype(">i2").tobytes())
        w.put_marker(tags.LOWPASS_END_CODE)
        w.pop_chunk()

        def put_band(band_number, subband, vals, quant, scale, coding_flags=1,
                     encoding=tags.BAND_ENCODING_RUNLENGTHS, codeset=17,
                     peaks=False):
            bh, bw = vals.shape
            w.put_marker(tags.BAND_START_CODE)
            w.put_tag(tags.BAND_NUMBER, band_number)
            w.put_tag(tags.BAND_CODING_FLAGS, coding_flags)
            w.put_tag(tags.BAND_WIDTH, bw)
            w.put_tag(tags.BAND_HEIGHT, bh)
            w.put_tag(tags.BAND_SUBBAND, subband)
            w.put_tag(tags.BAND_ENCODING, encoding)
            w.put_tag(tags.BAND_QUANTIZATION, quant)
            w.put_tag(tags.BAND_SCALE, scale)
            peak_list = None
            if peaks:
                # peaks coding (`Codec/encoder.c:6445` EncodeQuantLongRuns
                # PlusPeaks): values beyond PEAK_THRESHOLD=250 are clamped
                # to +/-251 in the stream and carried dequantized in a
                # PEAK_TABLE chunk after the band; three placeholder tags
                # sit in the band header and are patched afterwards.
                vals = np.asarray(vals, np.int32)
                mask = np.abs(vals) > 250
                peak_list = (vals[mask] * quant).astype(np.int16)
                vals = np.where(mask, np.sign(vals) * 251, vals)
                peak_off = len(w.buf)
                w.put_tag_optional(tags.PEAK_TABLE_OFFSET_L, 0)
                w.put_tag_optional(tags.PEAK_TABLE_OFFSET_H, 0)
                w.put_tag_optional(tags.PEAK_LEVEL, 0)
            w.push_chunk(tags.SUBBAND_SIZE)
            w.put_tag(tags.BAND_HEADER, 0)
            if encoding == tags.BAND_ENCODING_16BIT:
                # raw big-endian coefficients + the codeset band-end marker
                # (the temporal-high LL, subband 7, is stored uncompressed:
                # EncodeBand... BAND_ENCODING_16BIT path)
                w.put_bytes(np.asarray(vals, dtype=">i2").tobytes())
                w.put_bytes(_bandend_marker())
            else:
                w.put_bytes(intra_host.encode_band_payload(vals, codeset))
            w.pad_to_tag()
            w.put_tag(tags.BAND_TRAILER, 0)
            w.pop_chunk()
            if peaks and len(peak_list):
                n = len(peak_list)
                rounded = n + (n & 1)
                delta = len(w.buf) - peak_off
                w.patch_tag_value(peak_off, delta & 0xFFFF)
                w.patch_tag_value(peak_off + 4, delta >> 16)
                w.patch_tag_value(peak_off + 8, (250 * quant) & 0xFFFF)
                w.put_tag_optional(tags.PEAK_TABLE, rounded // 2)
                data = peak_list.astype("<i2").tobytes()
                w.put_bytes(data + b"\x00\x00" * (rounded - n))

        def wavelet_header(wtype, number, level, nbands, bw, bh, lscale):
            w.put_marker(tags.HIGHPASS_START_CODE)
            w.put_tag(tags.WAVELET_TYPE, wtype)
            w.put_tag(tags.WAVELET_NUMBER, number)
            w.put_tag(tags.WAVELET_LEVEL, level)
            w.put_tag(tags.NUM_BANDS, nbands)
            w.put_tag(tags.HIGHPASS_WIDTH, bw)
            w.put_tag(tags.HIGHPASS_HEIGHT, bh)
            w.put_tag(tags.LOWPASS_BORDER, 0)
            w.put_tag(tags.HIGHPASS_BORDER, 0)
            w.put_tag(tags.LOWPASS_SCALE, lscale)
            w.put_tag(tags.LOWPASS_DIVISOR, 0)
            w.push_chunk(tags.LEVEL_SIZE)

        def wavelet_trailer():
            w.put_marker(tags.HIGHPASS_END_CODE)
            w.pop_chunk()

        # w5 (number 6, level 4): subbands 1-3
        bh, bw = bands[5][0].shape
        wavelet_header(tags.WAVELET_TYPE_SPATIAL, 6, 4, 4, bw, bh, scales[5][0])
        for i in range(3):
            put_band(i + 1, i + 1, bands[5][i], bq[5][i], scales[5][i + 1])
        wavelet_trailer()
        # w4 (number 5, level 3): subbands 4-6
        bh, bw = bands[4][0].shape
        wavelet_header(tags.WAVELET_TYPE_SPATIAL, 5, 3, 4, bw, bh, scales[4][0])
        for i in range(3):
            put_band(i + 1, i + 4, bands[4][i], bq[4][i], scales[4][i + 1])
        wavelet_trailer()
        # w3 (number 4, level 3): subbands 7-10 (band 0 = coded LL)
        bh, bw = bands[3][0].shape
        wavelet_header(tags.WAVELET_TYPE_SPATIAL, 4, 3, 4, bw, bh, scales[3][0])
        for i in range(4):
            put_band(i, i + 7, bands[3][i], bq[3][i],
                     scales[3][i] if i else scales[3][0] // 1,
                     encoding=(tags.BAND_ENCODING_16BIT if i == 0 else
                               tags.BAND_ENCODING_RUNLENGTHS))
        wavelet_trailer()
        # w2 (number 3, level 2): temporal, one empty band entry (the
        # temporal bands are rebuilt from w3/w4 on decode; the reference
        # still emits a placeholder band with subband 255 and no payload)
        chan_w = width if ch == 0 else width // 2
        th, tw = height // 2, chan_w // 2
        wavelet_header(tags.WAVELET_TYPE_TEMPORAL, 3, 2, 2, tw, th, scales[2][0])
        w.put_marker(tags.BAND_START_CODE)
        w.put_tag(tags.BAND_NUMBER, 1)
        w.put_tag(tags.BAND_CODING_FLAGS, 1)
        w.put_tag(tags.BAND_WIDTH, tw)
        w.put_tag(tags.BAND_HEIGHT, th)
        w.put_tag(tags.BAND_SUBBAND, 255)
        w.put_tag(tags.BAND_ENCODING, tags.BAND_ENCODING_RUNLENGTHS)
        w.put_tag(tags.BAND_QUANTIZATION, 1)
        w.put_tag(tags.BAND_SCALE, scales[2][1])
        w.push_chunk(tags.SUBBAND_SIZE)
        w.put_tag(tags.BAND_HEADER, 0)
        w.put_tag(tags.BAND_TRAILER, 0)
        w.pop_chunk()
        wavelet_trailer()
        # w1 (number 2, level 1): subbands 11-13 (frame 1).  Interlaced
        # frame wavelets difference-code the HL band and entropy-code it
        # with codeset 18 (band coding_flags 18).
        def frame_band_args(i):
            if progressive or i != 1:
                return dict()
            return dict(coding_flags=18, codeset=18, peaks=True)
        bh, bw = bands[1][0].shape
        wavelet_header(tags.WAVELET_TYPE_HORZTEMP, 2, 1, 4, bw, bh, scales[1][0])
        for i in range(3):
            put_band(i + 1, i + 11, bands[1][i], bq[1][i], scales[1][i + 1],
                     **frame_band_args(i))
        wavelet_trailer()
        # w0 (number 1, level 1): subbands 14-16 (frame 0)
        bh, bw = bands[0][0].shape
        wavelet_header(tags.WAVELET_TYPE_HORZTEMP, 1, 1, 4, bw, bh, scales[0][0])
        for i in range(3):
            put_band(i + 1, i + 14, bands[0][i], bq[0][i], scales[0][i + 1],
                     **frame_band_args(i))
        wavelet_trailer()
        w.pad_to_tag()
        channel_sizes.append(len(w.buf) - start)

    w.put_tag(tags.SAMPLE, tags.SAMPLE_TYPE_GROUP_TRAILER)
    w.put_tag(tags.GROUP_TRAILER, 0)
    w.pop_chunk()
    w.patch_index(index_off, channel_sizes)
    return w.getvalue()
