"""Host (NumPy) CFHD intra-frame codec: full sample encode/decode.

This is the framework's reference implementation of the complete pipeline;
the JAX/TPU path in models/intra.py must produce identical samples.  It is
validated byte-for-byte against the reference SDK encoder
(tests/golden/samples, produced by tools/probe_sample.c).

Sample layout contract: `Codec/encoder.c:7461-7885` (EncodeQuantizedGroup,
intra branch) + `Codec/codec.c:1369-1584` (PutVideoIntraFrameHeader et al.).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from cineform_tpu.bitstream import parse_sample
from cineform_tpu.bitstream.writer import SampleWriter
from cineform_tpu.entropy import host as entropy
from cineform_tpu.ref import intra as xf
from cineform_tpu.spec import tags
from cineform_tpu.spec.production import (
    IntraParams,
    intra_prescale,
    pack_prescale_table,
    spatial_band_scales,
)


def align16_pixels(width: int) -> int:
    """Wavelet band row pitch in pixels: ALIGN16(width * 2) / 2.

    The reference encodes each band row padded to this pitch with zeros
    (band buffers are allocated zeroed; `EncodeQuantLongRuns` walks the
    full pitch), so the entropy stream includes the zero pad columns.
    """
    return ((width * 2 + 15) // 16 * 16) // 2


@dataclass
class EncoderMetadata:
    """Global metadata block contents (`EncoderSDK/MetadataWriter.cpp:325`)."""

    guid: bytes = b"\xa5" * 16
    date: str = "2026-01-01"
    time: str = "00:00:00"
    timecode: str = "00:00:00:00"
    unique_frame: int = 0
    video_channels: int = 0      # VCHN: 2 = stereo 3D dual-channel

    def block(self) -> bytes:
        """FOURCC + 24-bit LE size + type char + payload, each padded to 4B
        (`Common/CFHDMetadataTags.h:79-85`)."""
        def tup(fourcc: bytes, typ: bytes, payload: bytes) -> bytes:
            size = len(payload)
            pad = (-size) % 4
            return fourcc + bytes([size & 0xFF, (size >> 8) & 0xFF,
                                   (size >> 16) & 0xFF]) + typ + payload + b"\0" * pad

        vchn = (tup(b"VCHN", b"\x00",
                    self.video_channels.to_bytes(4, "little"))
                if self.video_channels else b"")
        return (
            tup(b"GUID", b"G", self.guid)
            + vchn
            + tup(b"DATE", b"c", self.date.encode())
            + tup(b"TIME", b"c", self.time.encode())
            + tup(b"TIMC", b"c", self.timecode.encode())
            + tup(b"UFRM", b"L", self.unique_frame.to_bytes(4, "little"))
        )


    def advanced(self, k: int) -> "EncoderMetadata":
        """Metadata for the k-th frame after this one: the reference's
        CSampleEncoder auto-increments the unique frame number and the
        timecode (24 fps default base) on every EncodeSample
        (`EncoderSDK/SampleEncoder.cpp:795-880`)."""
        if k == 0:
            return self
        from dataclasses import replace

        try:
            hh, mm, ss, ff = (int(x) for x in self.timecode.split(":"))
            total = ((hh * 60 + mm) * 60 + ss) * 24 + ff + k
            ff = total % 24
            ss = (total // 24) % 60
            mm = (total // (24 * 60)) % 60
            hh = (total // (24 * 3600)) % 24
            tc = f"{hh:02d}:{mm:02d}:{ss:02d}:{ff:02d}"
        except ValueError:
            tc = self.timecode
        return replace(self, unique_frame=self.unique_frame + k,
                       timecode=tc)


@dataclass
class EncodedChannel:
    lowpass: np.ndarray                      # int32 (h, w), raw 16-bit values
    bands: list                              # [(lh, hl, hh)] per wavelet, finest first
    quants: list                             # [(q_lh, q_hl, q_hh)] per wavelet
    # optional precomputed entropy payloads [(bytes, bytes, bytes)] per
    # wavelet (device entropy path); None entries fall back to host coding
    payloads: list | None = None


def transform_channel(plane: np.ndarray, params: IntraParams,
                      channel: int) -> EncodedChannel:
    quants = params.band_quant(channel)
    lowpass, bands = xf.forward_channel(plane, quants, params.prescale)
    return EncodedChannel(lowpass=lowpass, bands=bands, quants=quants)


def encode_band_payload(values: np.ndarray, codeset: int = 17) -> bytes:
    """Zero-pad rows to the band pitch and entropy-encode.

    Uses the native (C++) coder; entropy/host.py is the pure-Python
    reference it is validated against."""
    from cineform_tpu.entropy import native as entropy_native

    h, w = values.shape
    pitchw = align16_pixels(w)
    padded = np.zeros((h, pitchw), dtype=np.int32)
    padded[:, :w] = values
    return entropy_native.encode_band_bytes(padded, codeset=codeset)


def write_sample(channels: list[EncodedChannel], params: IntraParams,
                 frame_number: int = 1,
                 metadata: EncoderMetadata | None = None,
                 input_format: int = tags.COLOR_FORMAT_YUYV,
                 encoded_format: int = tags.ENCODED_FORMAT_YUV_422,
                 colorspace: int | None = tags.COLOR_SPACE_BT_709,
                 quality_high: int = 0,
                 video_channels: int = 0,
                 channel_number: int = 0) -> bytes:
    """Assemble a complete CFHD intra sample."""
    w = SampleWriter()
    num_channels = len(channels)
    num_wavelets = params.num_wavelets
    scales = spatial_band_scales(params.num_spatial)

    # --- sample header (PutVideoIntraFrameHeader, codec.c:1369) -------------
    w.put_tag(tags.SAMPLE, tags.SAMPLE_TYPE_IFRAME)
    index_off = w.put_index_placeholder(num_channels)
    w.put_tag(tags.TRANSFORM_TYPE, tags.TRANSFORM_TYPE_SPATIAL)
    w.put_tag(tags.NUM_FRAMES, 1)
    w.put_tag(tags.NUM_CHANNELS, num_channels)
    if input_format >= 100:
        # formats >= COLOR_FORMAT_INPUT_FORMAT_TAG_REQUIRED (codec.c:1407)
        w.put_tag(tags.INPUT_FORMAT, input_format)
    else:
        w.put_tag_optional(tags.INPUT_FORMAT, input_format)
    w.put_tag(tags.ENCODED_FORMAT, encoded_format)
    if colorspace:
        w.put_tag_optional(tags.ENCODED_COLORSPACE, colorspace)
    w.put_tag(tags.NUM_WAVELETS, num_wavelets)
    w.put_tag(tags.NUM_SUBBANDS, 3 * num_wavelets + 1)
    w.put_tag(tags.NUM_SPATIAL, params.num_spatial)
    w.put_tag(tags.FIRST_WAVELET, tags.WAVELET_TYPE_SPATIAL)
    w.put_tag(tags.FRAME_WIDTH, params.width)
    w.put_tag(tags.FRAME_HEIGHT, params.height)
    w.put_tag_optional(tags.FRAME_NUMBER, frame_number)
    w.put_tag(tags.PRECISION, params.precision)
    w.put_tag_optional(tags.FRAME_DISPLAY_HEIGHT, params.height)
    w.put_tag_optional(tags.VERSION, tags.FILE_VERSION_CODE)
    w.put_tag_optional(tags.QUALITY_L, params.quality & 0xFFFF)
    w.put_tag_optional(tags.QUALITY_H, ((params.quality >> 16) | quality_high) & 0xFFFF)
    if params.precision == tags.PRECISION_12BIT:
        # 12-bit prescales fail TestTransformPrescaleMatch -> required tag
        w.put_tag(tags.PRESCALE_TABLE, pack_prescale_table(params.prescale))
    else:
        w.put_tag_optional(tags.PRESCALE_TABLE, pack_prescale_table(params.prescale))
    if video_channels > 1:
        # stereo 3D: both eyes share one sample (`Codec/encoder.c:7548-7556`)
        w.put_tag_optional(tags.ENCODED_CHANNELS, video_channels)
        w.put_tag_optional(tags.ENCODED_CHANNEL_NUMBER, channel_number)
    elif channel_number:
        w.put_tag_optional(tags.ENCODED_CHANNEL_NUMBER, channel_number)

    # --- sample size chunk + metadata + extension (encoder.c:7559-7621) -----
    w.push_chunk(tags.SAMPLE_SIZE)
    meta = (metadata or EncoderMetadata()).block()
    w.put_tag_optional(tags.METADATA_CHUNK, len(meta) // 4)
    w.put_bytes(meta)
    # FREE metadata space (encoder.c:7596-7613)
    free_size = 512
    w.put_tag_optional(tags.METADATA_CHUNK, free_size // 4)
    w.put_bytes(b"FREE" + (free_size - 8).to_bytes(4, "little") + b"\0" * (free_size - 8))
    # group extension (codec.c:1177)
    w.put_tag_optional(tags.INTERLACED_FLAGS, 0)
    w.put_tag_optional(tags.PROTECTION_FLAGS, 0)
    w.put_tag_optional(tags.PICTURE_ASPECT_X, 16)
    w.put_tag_optional(tags.PICTURE_ASPECT_Y, 9)
    w.put_tag(tags.SAMPLE_FLAGS, tags.SAMPLE_FLAGS_PROGRESSIVE)

    # --- per-channel content -------------------------------------------------
    channel_sizes = []
    for ch, enc in enumerate(channels):
        if ch > 0:
            w.pad_to_tag()
            w.put_tag(tags.SAMPLE, tags.SAMPLE_TYPE_CHANNEL)
            w.put_tag(tags.CHANNEL, ch)
        start = len(w.buf)

        # lowpass band (EncodeLowPassBand, encoder.c:4251)
        lp = enc.lowpass
        w.put_marker(tags.LOWPASS_START_CODE)
        w.put_tag(tags.LOWPASS_SUBBAND, 0)
        w.put_tag(tags.NUM_LEVELS, num_wavelets)
        w.put_tag(tags.LOWPASS_WIDTH, lp.shape[1])
        w.put_tag(tags.LOWPASS_HEIGHT, lp.shape[0])
        w.put_tag(tags.MARGIN_LEFT, 0)
        w.put_tag(tags.MARGIN_TOP, 0)
        w.put_tag(tags.MARGIN_RIGHT, 0)
        w.put_tag(tags.MARGIN_BOTTOM, 0)
        w.put_tag(tags.PIXEL_OFFSET, 0)
        w.put_tag(tags.QUANTIZATION, 1)
        w.put_tag(tags.PIXEL_DEPTH, 16)
        w.push_chunk(tags.SUBBAND_SIZE)
        w.put_marker(tags.COEFFICIENT_START_CODE)
        w.put_bytes(lp.astype(">i2").tobytes())
        w.put_marker(tags.LOWPASS_END_CODE)
        w.pop_chunk()

        # wavelets, deepest first (EncodeQuantizedFrameTransform, encoder.c:7889)
        subband = 1
        for k in range(num_wavelets - 1, -1, -1):
            bands = enc.bands[k]
            quants = enc.quants[k]
            wtype = (tags.WAVELET_TYPE_HORZTEMP if k == 0
                     else tags.WAVELET_TYPE_SPATIAL)
            bh, bw = bands[0].shape
            w.put_marker(tags.HIGHPASS_START_CODE)
            w.put_tag(tags.WAVELET_TYPE, wtype)
            w.put_tag(tags.WAVELET_NUMBER, k + 1)
            w.put_tag(tags.WAVELET_LEVEL, k + 1)
            w.put_tag(tags.NUM_BANDS, 4)
            w.put_tag(tags.HIGHPASS_WIDTH, bw)
            w.put_tag(tags.HIGHPASS_HEIGHT, bh)
            w.put_tag(tags.LOWPASS_BORDER, 0)
            w.put_tag(tags.HIGHPASS_BORDER, 0)
            w.put_tag(tags.LOWPASS_SCALE, scales[k][0])
            w.put_tag(tags.LOWPASS_DIVISOR, 0)
            w.push_chunk(tags.LEVEL_SIZE)
            for b in range(3):
                w.put_marker(tags.BAND_START_CODE)
                w.put_tag(tags.BAND_NUMBER, b + 1)
                w.put_tag(tags.BAND_CODING_FLAGS, 1)  # codebook 1 = cs17
                w.put_tag(tags.BAND_WIDTH, bw)
                w.put_tag(tags.BAND_HEIGHT, bh)
                w.put_tag(tags.BAND_SUBBAND, subband)
                w.put_tag(tags.BAND_ENCODING, tags.BAND_ENCODING_RUNLENGTHS)
                w.put_tag(tags.BAND_QUANTIZATION, quants[b])
                w.put_tag(tags.BAND_SCALE, scales[k][b + 1])
                w.push_chunk(tags.SUBBAND_SIZE)
                w.put_tag(tags.BAND_HEADER, 0)
                payload = (enc.payloads[k][b]
                           if enc.payloads is not None
                           and enc.payloads[k] is not None
                           and enc.payloads[k][b] is not None else None)
                w.put_bytes(payload if payload is not None
                            else encode_band_payload(bands[b]))
                w.pad_to_tag()
                w.put_tag(tags.BAND_TRAILER, 0)
                w.pop_chunk()
                subband += 1
            w.put_marker(tags.HIGHPASS_END_CODE)
            w.pop_chunk()
        w.pad_to_tag()
        channel_sizes.append(len(w.buf) - start)

    # --- trailer + patches ----------------------------------------------------
    w.put_tag(tags.FRAME_TRAILER, 0)
    w.pop_chunk()  # SAMPLE_SIZE
    w.patch_index(index_off, channel_sizes)
    return w.getvalue()


def write_sample_uncompressed(raw_rows: bytes, width: int, height: int,
                              quality_word: int, frame_number: int,
                              metadata: EncoderMetadata | None,
                              input_format: int,
                              encoded_format: int = tags.ENCODED_FORMAT_YUV_422,
                              colorspace: int = tags.COLOR_SPACE_BT_709,
                              later_form: bool | None = None) -> bytes:
    """Uncompressed passthrough sample (`Codec/encoder.c:7625-7720`):
    the intra header (required-tag form, dummy channel index, no
    precision tag), metadata, SKIP padding to a 16-byte boundary, then
    the raw frame rows in a CODEC_TAG_UNCOMPRESS 24-bit chunk and a
    trailer.  Byte-exact vs the reference for v210 input."""
    w = SampleWriter()
    w.put_tag(tags.SAMPLE, tags.SAMPLE_TYPE_IFRAME)
    w.put_tag(2, 3)                       # channel-count index header
    for i in range(3):
        w.put_tag(3, i)                   # dummy channel index entries
    w.put_tag(tags.TRANSFORM_TYPE, tags.TRANSFORM_TYPE_SPATIAL)
    w.put_tag(tags.NUM_FRAMES, 1)
    w.put_tag(tags.NUM_CHANNELS, 3)
    if input_format >= 100:
        w.put_tag(tags.INPUT_FORMAT, input_format)
    else:
        w.put_tag_optional(tags.INPUT_FORMAT, input_format)
    w.put_tag(tags.ENCODED_FORMAT, encoded_format)
    w.put_tag_optional(tags.ENCODED_COLORSPACE, colorspace)
    w.put_tag(tags.NUM_WAVELETS, 3)
    w.put_tag(tags.NUM_SUBBANDS, 10)
    w.put_tag(tags.NUM_SPATIAL, 2)
    w.put_tag(tags.FIRST_WAVELET, tags.WAVELET_TYPE_SPATIAL)
    w.put_tag(tags.FRAME_WIDTH, width)
    w.put_tag(tags.FRAME_HEIGHT, height)
    w.put_tag_optional(tags.FRAME_NUMBER, frame_number)
    # The "later" header form (precision tag + leaked 10-bit prescale
    # table) appears only after a COMPRESSED frame has initialized the
    # codec state — NOT simply from the 2nd sample on: a series whose
    # first frames are all uncompressed keeps the first form (pinned
    # against reference series where the decision chose UNC,UNC,...)
    if later_form is None:
        later_form = frame_number > 1
    if later_form:
        w.put_tag(tags.PRECISION, tags.PRECISION_10BIT)
    w.put_tag_optional(tags.FRAME_DISPLAY_HEIGHT, height)
    w.put_tag_optional(tags.VERSION, tags.FILE_VERSION_CODE)
    w.put_tag_optional(tags.QUALITY_L, quality_word & 0xFFFF)
    w.put_tag_optional(tags.QUALITY_H, (quality_word >> 16) & 0xFFFF)
    # the codec state's prescale table leaks into later uncompressed
    # headers (0 until a compressed frame sets the 10-bit intra table;
    # pinned against series goldens)
    w.put_tag_optional(tags.PRESCALE_TABLE, 0x2000 if later_form else 0)
    w.push_chunk(tags.SAMPLE_SIZE)
    meta = (metadata or EncoderMetadata()).block()
    w.put_tag_optional(tags.METADATA_CHUNK, len(meta) // 4)
    w.put_bytes(meta)
    free_size = 512
    w.put_tag_optional(tags.METADATA_CHUNK, free_size // 4)
    w.put_bytes(b"FREE" + (free_size - 8).to_bytes(4, "little")
                + b"\0" * (free_size - 8))
    w.put_tag_optional(tags.INTERLACED_FLAGS, 0)
    w.put_tag_optional(tags.PROTECTION_FLAGS, 0)
    w.put_tag_optional(tags.PICTURE_ASPECT_X, 16)
    w.put_tag_optional(tags.PICTURE_ASPECT_Y, 9)
    w.put_tag(tags.SAMPLE_FLAGS, tags.SAMPLE_FLAGS_PROGRESSIVE)
    # SKIP padding so the raw data lands on a 16-byte boundary
    # (`encoder.c:7630-7646`)
    alignment = (len(w.buf) & 0xF) + 4
    while alignment & 0xC:
        w.put_tag_optional(tags.SKIP, 0)
        alignment += 4
    size_words = len(raw_rows) >> 2
    w.put_tag(tags.UNCOMPRESSED | (size_words >> 16), size_words & 0xFFFF)
    w.put_bytes(raw_rows)
    w.put_tag(tags.FRAME_TRAILER, 0)
    # the sample-size chunk is NOT patched over the raw payload in the
    # reference; pop without rewriting beyond its 24-bit capacity
    w.pop_chunk()
    return w.getvalue()


def uncompressed_decision(frame_head_u32: int, metadata_block: bytes,
                          quality_word: int, last16: list[int]) -> bool:
    """The reference's per-frame uncompressed selection
    (`Codec/encoder.c:1979-2016`): a target count out of each 16 frames,
    adapted by the recent window, decided by glibc rand() seeded from the
    frame's first word + the CRC32 of the metadata block."""
    import zlib

    from cineform_tpu.utils.glibc_random import glibc_rand_sequence

    target = (quality_word >> 8) & 0x1F
    if target <= 0:
        return False
    count = sum(1 for v in last16 if v)
    del last16[0]
    last16.append(0)
    target += target - count
    if target < 0:
        target = 0
    seed = frame_head_u32 & 0xFFFFFFFF
    if metadata_block:
        seed = (seed + zlib.crc32(metadata_block)) & 0xFFFFFFFF
    draw = int(glibc_rand_sequence(1, seed)[0])
    if (draw & 15) < target:
        last16[-1] = 1
        return True
    return False


def encode_sample(frame_yuy2: bytes, width: int, height: int, quality: int,
                  frame_number: int = 1,
                  metadata: EncoderMetadata | None = None,
                  fs_rate_limiter: int | None = None,
                  custom_quant: tuple | None = None) -> bytes:
    """Encode one YUY2 frame to a CFHD intra sample (the host oracle path).

    fs_rate_limiter: FILMSCAN2/3 rate-control state (see
    spec.production.update_fs_rate_limiter); None = first-frame default.
    custom_quant: (luma17, chroma17) override tables
    (spec.production.custom_quant_tables)."""
    params = IntraParams(width=width, height=height, quality=quality,
                         fs_rate_limiter=fs_rate_limiter,
                         custom_quant=custom_quant)
    planes = xf.unpack_yuy2(frame_yuy2, width, height, params.precision)
    channels = [transform_channel(p, params, ch) for ch, p in enumerate(planes)]
    return write_sample(channels, params, frame_number, metadata)


def encode_sample_planes(planes: list[np.ndarray], width: int, height: int,
                         quality: int, input_format: int,
                         frame_number: int = 1,
                         metadata: EncoderMetadata | None = None,
                         quality_tag: int | None = None,
                         fs_rate_limiter: int | None = None) -> bytes:
    """Encode pre-unpacked 10-bit [Y, C1, C2] planes (v210/YU64 front ends).

    quality_tag: value written into QUALITY_L when it differs from the
    quantization tables actually used (the reference's uncompressed
    fallback labels samples quality 6 but quantizes with the q5 tables;
    `Codec/encoder.c:2022-2026`, pinned against series goldens)."""
    params = IntraParams(width=width, height=height, quality=quality,
                         fs_rate_limiter=fs_rate_limiter)
    channels = [transform_channel(p, params, ch) for ch, p in enumerate(planes)]
    sample = write_sample(channels, params, frame_number, metadata,
                          input_format=input_format)
    if quality_tag is not None and quality_tag != quality:
        import struct
        needle = struct.pack(">hH", -(tags.QUALITY_L), quality & 0xFFFF)
        repl = struct.pack(">hH", -(tags.QUALITY_L), quality_tag & 0xFFFF)
        sample = sample.replace(needle, repl, 1)
    return sample


def encode_sample_rgb(frame: bytes, width: int, height: int, quality: int,
                      alpha: bool = False, frame_number: int = 1,
                      metadata: EncoderMetadata | None = None) -> bytes:
    """Encode RG48 (RGB 4:4:4) or b64a (RGBA 4:4:4:4) at 12-bit precision.

    Byte-exact vs the reference for both formats (tests/test_formats.py).
    """
    if alpha:
        planes = xf.unpack_b64a(frame, width, height)
        params = IntraParams(width=width, height=height, quality=quality,
                             precision=tags.PRECISION_12BIT,
                             chroma_full_res=False)
        input_format, encoded_format, qhigh = 30, tags.ENCODED_FORMAT_RGBA_4444, 0x2000
    else:
        planes = xf.unpack_rg48(frame, width, height)
        params = IntraParams(width=width, height=height, quality=quality,
                             precision=tags.PRECISION_12BIT,
                             chroma_full_res=True)
        input_format, encoded_format, qhigh = 120, tags.ENCODED_FORMAT_RGB_444, 0
    channels = [transform_channel(p, params, ch) for ch, p in enumerate(planes)]
    return write_sample(channels, params, frame_number, metadata,
                        input_format=input_format,
                        encoded_format=encoded_format, colorspace=None,
                        quality_high=qhigh)


def encode_sample_rgb10(frame: bytes, width: int, height: int, quality: int,
                        fourcc: str, frame_number: int = 1,
                        metadata: EncoderMetadata | None = None) -> bytes:
    """Encode packed 10-bit RGB (r210 / DPX0 / RG30 / AB10 / AR10) at
    12-bit RGB 4:4:4, byte-exact vs the reference for all five layouts."""
    planes = xf.unpack_rgb10(frame, width, height, fourcc)
    params = IntraParams(width=width, height=height, quality=quality,
                         precision=tags.PRECISION_12BIT, chroma_full_res=True)
    channels = [transform_channel(p, params, ch) for ch, p in enumerate(planes)]
    return write_sample(channels, params, frame_number, metadata,
                        input_format=xf.RGB10_INPUT_FORMATS[fourcc][0],
                        encoded_format=tags.ENCODED_FORMAT_RGB_444,
                        colorspace=None, quality_high=0)


def encode_sample_rgb8(frame: bytes, width: int, height: int, quality: int,
                       fourcc: str = "BGRA", frame_number: int = 1,
                       metadata: EncoderMetadata | None = None) -> bytes:
    """Encode 8-bit RGB input (BGRA with alpha dropped, BGRa top-down,
    or RG24 BGR), as 12-bit RGB 4:4:4; byte-exact vs the reference.
    BGRa is COLOR_FORMAT_RGB32_INVERTED (`Codec/color.h:71`): the same
    pixel layout as BGRA with rows stored top-down instead of
    bottom-up."""
    if fourcc == "BGRA":
        planes, input_format = xf.unpack_bgra(frame, width, height), 32
    elif fourcc == "BGRa":
        flipped = np.frombuffer(frame, np.uint8).reshape(
            height, 4 * width)[::-1].tobytes()
        planes, input_format = xf.unpack_bgra(flipped, width, height), 9
    else:
        planes, input_format = xf.unpack_rg24(frame, width, height), 7
    params = IntraParams(width=width, height=height, quality=quality,
                         precision=tags.PRECISION_12BIT, chroma_full_res=True)
    channels = [transform_channel(p, params, ch) for ch, p in enumerate(planes)]
    # the reference writes QUALITY_H 0x09A0 for 8-bit RGB inputs
    return write_sample(channels, params, frame_number, metadata,
                        input_format=input_format,
                        encoded_format=tags.ENCODED_FORMAT_RGB_444,
                        colorspace=None, quality_high=0x09A0)


def encode_sample_rg64(frame: bytes, width: int, height: int, quality: int,
                       frame_number: int = 1,
                       metadata: EncoderMetadata | None = None) -> bytes:
    """Encode RG64 (16-bit RGBA little-endian) as RGBA 4:4:4:4,
    byte-exact vs the reference (alpha gets the b64a companding curve)."""
    planes = xf.unpack_rg64(frame, width, height)
    params = IntraParams(width=width, height=height, quality=quality,
                         precision=tags.PRECISION_12BIT, chroma_full_res=True)
    channels = [transform_channel(p, params, ch) for ch, p in enumerate(planes)]
    return write_sample(channels, params, frame_number, metadata,
                        input_format=121,
                        encoded_format=tags.ENCODED_FORMAT_RGBA_4444,
                        colorspace=None, quality_high=0x2000)


def encode_sample_bayer(frame: bytes, width: int, height: int, quality: int,
                        bayer_format: int = 0, frame_number: int = 1,
                        metadata: EncoderMetadata | None = None,
                        packed: bool = False) -> bytes:
    """Encode a BYR4 (16-bit) or BYR5 (packed 12-bit) Bayer mosaic
    (ENCODED_FORMAT_BAYER).

    width/height are the mosaic dimensions; channels are quarter-res.
    Byte-exact vs the reference (tests/test_formats.py).
    """
    if packed:
        planes = xf.unpack_byr5(frame, width, height, bayer_format)
    else:
        planes = xf.unpack_byr4(frame, width, height, bayer_format)
    # the encoder forces rgb_quality=3 for Bayer (`encoder.c:2637`)
    params = IntraParams(width=width // 2, height=height // 2, quality=quality,
                         precision=tags.PRECISION_12BIT, chroma_full_res=True,
                         rgb_quality=3)
    channels = [transform_channel(p, params, ch) for ch, p in enumerate(planes)]
    return write_sample(channels, params, frame_number, metadata,
                        input_format=105 if packed else 104,  # BYR5 / BYR4
                        encoded_format=tags.ENCODED_FORMAT_BAYER,
                        colorspace=None)


class BadSampleError(ValueError):
    """Raised when a sample fails a validation the reference decoder
    enforces (it returns CFHD_ERROR_CODEC_ERROR); api.Decoder wraps this
    into CFHDError(BADSAMPLE)."""


#: intra subband -> wavelet index (`Codec/decoder.c:11596`); subbands
#: 10..16 are legal tag values (CODEC_MAX_SUBBANDS) that route past the
#: intra map — the reference decodes them into an out-of-map wavelet that
#: reconstruction never reads, so their content is dropped.
_INTRA_SUBBAND_WAVELET = {**{sb: 2 for sb in (1, 2, 3)},
                          **{sb: 1 for sb in (4, 5, 6)},
                          **{sb: 0 for sb in (7, 8, 9)},
                          **{sb: None for sb in range(10, 17)}}


def intra_channels(s):
    """Channels in stream order, validated like the reference: a channel
    header whose number breaks the 0,1,2,... sequence is a bad frame
    (`DecodeSampleChannelHeader`, `Codec/decoder.c:11894`)."""
    if not s.channels:
        raise BadSampleError("no channels")
    for i, c in enumerate(s.channels):
        if c.channel != i:
            raise BadSampleError(f"channel header {c.channel} != {i}")
    if s.end_marker is not None and s.end_marker >> 8 != 0x0C:
        # the frame-end MARKER's high value byte is validated by the
        # reference (low byte is not -- pinned by tools/diff_fuzz.py)
        raise BadSampleError(f"frame end marker {s.end_marker:#06x}")
    return s.channels


def collect_wavelet_bands(c, *, codeset: int = 17):
    """ERROR_TOLERANT band collection for one intra channel, pinned
    against the reference binary's accept/reject behavior on corrupted
    headers (tools/diff_fuzz.py; `Codec/decoder.c:11920`
    DecodeSampleSubband + the FSM loop `decoder.c:19532`):

    - NUM_LEVELS must be 3 (the intra pyramid depth) -> else reject
    - lowpass QUANTIZATION as int16 must be >= 1 -> else reject
    - BAND_SUBBAND outside [1, 16] -> reject (CODEC_MAX_SUBBANDS);
      subbands 10..16 decode-then-drop (out-of-map wavelet)
    - BAND_NUMBER must be 0..3 (a wavelet band slot); slot 0 overwrites
      the lowpass content loaded from the LOWPASS_SUBBAND chunk
    - band dims must match the target wavelet's pyramid dims (a resize
      makes the reference's reconstruction fail) -> else reject
    - BAND_ENCODING must be run-lengths (3) -> else reject
    - BAND_QUANTIZATION as int16 must be >= 1 -> else reject
    - missing bands stay zero (fresh wavelets are zero-filled); a
      duplicate band overwrites the earlier one

    Returns (lowpass int32 (lh, lw), wb) where wb[k] = (lh, hl, hh) for
    wavelet k = 0 (finest) .. 2 (coarsest).
    """
    from cineform_tpu.entropy import native as entropy_native

    if c.lowpass is None:
        raise BadSampleError(f"channel {c.channel}: no lowpass band")
    if c.num_levels != 3:
        raise BadSampleError(f"channel {c.channel}: NUM_LEVELS "
                             f"{c.num_levels} != 3")
    if not 1 <= ((c.lowpass_quant + 0x8000) % 0x10000) - 0x8000:
        raise BadSampleError(f"lowpass quantization {c.lowpass_quant}")
    if len(c.bands) < 9:
        # a channel cut short mid-walk: the reference hits end-of-stream
        # (or the next channel header) before its subband count is met
        raise BadSampleError(
            f"channel {c.channel}: {len(c.bands)} of 9 highpass bands")
    lh, lw = c.lowpass.shape
    expected = {2: (lh, lw), 1: (2 * lh, 2 * lw), 0: (4 * lh, 4 * lw)}
    lowpass = c.lowpass
    slots: list[list] = [[None] * 4 for _ in range(3)]
    for b in c.bands:
        if b.truncated:
            # a band chunk that extends past the sample end: the
            # reference's tag walk hits end-of-stream mid-band and
            # errors (`GetSegment` BITSTREAM_ERROR, decoder.c:11627)
            raise BadSampleError(f"subband {b.subband} band truncated")
        if b.data[-4:] != b"\x00\x38\x00\x00":
            # after the band-end codeword the reference scans for the
            # (BAND_TRAILER, 0) pair and validates it exactly
            # (`DecodeBandTrailer` IsTagValue, `Codec/codec.c:2614`)
            raise BadSampleError(f"subband {b.subband} band trailer")
        if not 1 <= b.subband <= 16:
            raise BadSampleError(f"subband {b.subband} out of range")
        if not 0 <= b.band <= 3:
            raise BadSampleError(f"band number {b.band} out of range")
        if b.encoding != 3:
            raise BadSampleError(f"band encoding {b.encoding} != runlengths")
        quant = ((b.quantization + 0x8000) % 0x10000) - 0x8000
        if quant < 1:
            raise BadSampleError(f"band quantization {b.quantization}")
        widx = _INTRA_SUBBAND_WAVELET[b.subband]
        if widx is None:
            continue                      # out-of-map: decoded then dropped
        if (b.height, b.width) != expected[widx]:
            if (b.height, b.width) in expected.values():
                # a rerouted subband number carrying another level's dims:
                # the reference reallocs the target wavelet to these dims
                # and the level's real bands realloc it back, wiping the
                # content -- the band data is effectively dropped
                continue
            raise BadSampleError(
                f"subband {b.subband} dims {b.width}x{b.height} != "
                f"wavelet dims {expected[widx][1]}x{expected[widx][0]}")
        pitchw = align16_pixels(b.width)
        vals, _ = entropy_native.decode_band(
            b.data, pitchw * b.height, codeset=codeset, quant=quant)
        plane = vals.reshape(b.height, pitchw)[:, :b.width]
        if widx == 2 and b.band == 0:
            lowpass = plane.astype(np.int32)
        else:
            slots[widx][b.band] = plane
    wb = []
    for k in range(3):
        eh, ew = expected[k]
        wb.append(tuple(
            slots[k][n] if slots[k][n] is not None
            else np.zeros((eh, ew), np.int32) for n in (1, 2, 3)))
    return lowpass, wb


def decode_sample_bayer_row16u(sample: bytes) -> list[np.ndarray]:
    """Decode a Bayer sample's four channels (G, RG, BG, GD) to the
    reference's Row16u 16-bit planar rows at mosaic-half resolution
    (`TransformInverseSpatialToRow16u` into RawBayer16,
    `Codec/decoder.c:14630-14637`; the lowpass channel offset is 0 for
    Bayer sources, decoder.c:12318-12319)."""
    from cineform_tpu.entropy import native as entropy_native

    s = parse_sample(sample)
    prescale = intra_prescale(s.precision)[:3]
    planes = []
    for c in intra_channels(s):
        lowpass, wb = collect_wavelet_bands(c)
        ll = xf.inverse_channel_to_16s(lowpass, wb, prescale)
        lh, hl, hh = wb[0]
        low = xf.v26_inverse(ll, hl)
        high = xf.v26_inverse(lh, hh)
        planes.append(xf.h26_inverse_to_row16u(low, high, s.precision))
    return planes


def decode_sample_bayer_to(sample: bytes, fourcc: str) -> bytes:
    """Decode a Bayer sample to a full-mosaic-resolution output format,
    BYTE-EXACT vs the reference decoder:

    - 'BYR4': GenerateBYR2's scalar un-difference with the
      BYR4LinearRestore log-to-linear LUT (`Codec/bayer.c:13237`,
      `decoder.c:10714`).
    - 'RG48': the full DemosaicRAW chain — ColorDifference2Bayer,
      CF-enhanced 5x5 debayer with Advanced Detail 1 sharpening, and the
      direct 16-bit store (`Codec/bayer.c:9339`, ref/demosaic.py).

    WBAL white balance attached to the sample (gated by PRCS) runs the
    ApplyActiveMetaData 1D-LUT develop stage — also byte-exact
    (`CURVES_PROCESSING_MACRO`, bayer.c:7164).
    """
    from cineform_tpu.models import active_metadata as am
    from cineform_tpu.ref import demosaic as dm

    G, RG, BG, GD = decode_sample_bayer_row16u(sample)
    if fourcc in ("BYR4", "BYR2"):
        # BYR2 is GenerateBYR2 without the linear-restore curve: the
        # low bit is masked instead (`Codec/bayer.c:13322-13328`)
        lut = dm.log2lin_lut() if fourcc == "BYR4" else None
        r, g1, g2, b = dm.generate_byr2_components(G, RG, BG, GD, lut)
        h, w = G.shape
        out = np.zeros((h * 2, w * 2), np.uint16)
        out[0::2, 0::2] = r
        out[0::2, 1::2] = g1
        out[1::2, 0::2] = g2
        out[1::2, 1::2] = b
        return out.astype("<u2").tobytes()
    if fourcc in ("WP13", "W13A"):
        # the Active-Metadata working format: the byte-exact RG48 chain
        # shifted to the 13-bit whitepoint (+ opaque 8191 alpha)
        rgb = np.frombuffer(decode_sample_bayer_to(sample, "RG48"), "<u2")
        h2, w2 = 2 * G.shape[0], 2 * G.shape[1]
        return _wp13_pack((rgb.astype(np.int64) >> 3).reshape(h2, w2, 3),
                          fourcc)
    if fourcc in ("YUY2", "2vuy"):
        # 8-bit outputs use the bilinear (non-hq, unsharpened) debayer
        # then the deterministic YUYV conversion — byte-exact
        p = am.develop_params(sample)
        m = dm.compose_develop_matrix(
            p.matrix, p.saturation, p.exposure,
            p.wb if tuple(p.wb) != (1.0, 1.0, 1.0) else None)
        rgb = dm.demosaic_bilinear_rgb(G, RG, BG, GD)
        h2 = rgb.shape[0]
        parity = dm.bayer_yuyv_parity(h2)
        if p.enabled and (np.any(m[:, :3] != np.eye(3)) or np.any(m[:, 3])):
            out13 = dm.apply_active_metadata_matrix(
                np.clip(rgb, 0, 65535).astype(np.uint16), m)
            return dm.convert_rgb16_to_yuyv(out13, parity=parity,
                                            whitepoint=13,
                                            uyvy=(fourcc == "2vuy"))
        return dm.convert_rgb16_to_yuyv(rgb, parity=parity,
                                        uyvy=(fourcc == "2vuy"))
    if fourcc not in ("RG48", "b64a"):
        raise ValueError(f"bayer decode to {fourcc!r} is not supported")

    p = am.develop_params(sample)
    # compose the linear develop matrix like NeedCube (bayer.c:4431-4530)
    m = dm.compose_develop_matrix(
        p.matrix, p.saturation, p.exposure,
        p.wb if tuple(p.wb) != (1.0, 1.0, 1.0) else None)
    gamma_active = p.enabled and (tuple(p.rgb_gamma) != (1.0, 1.0, 1.0)
                                  or p.contrast != 1.0)
    vignette_active = p.enabled and p.vignette_start != 0.0
    sharpen_active = p.enabled and p.blur_sharpen != 0.0
    matrix_active = bool(np.any(m[:, :3] != np.eye(3)) or np.any(m[:, 3]))
    look_active = bool(p.enabled and (p.flags & am.PROCESSING_LOOK_FILE)
                       and p.look_crc)
    if look_active:
        # LOOK 3D-LUT develop (pinned byte-exact vs the binary for the
        # built-in Protune preview look, CRC 0x3f6f5788, and .cflook
        # files): the WHOLE develop folds into one RawCube —
        # BuildCube's change==0 branch samples the LUT on the 65^3
        # lattice when everything else is unity (`Codec/bayer.c:4978`),
        # otherwise the change==1 branch composes curves + matrix +
        # gamma tweaks + LUT (`bayer.c:4768-4977`).  TestCubeFor1Dness
        # picks the separable fast apply; the RAW decode applies the
        # cube on the full 16-bit demosaic output (`bayer.c:8350`),
        # then the geometric/sharpen passes run on the result.
        lut, lutsize = am.resolve_look(p.look_crc)
        if lut is not None:
            rgb16 = dm.demosaic_raw_rg48(G, RG, BG, GD)
            if matrix_active or gamma_active:
                cube = dm.build_raw_cube_developed(
                    m if matrix_active else None, p.rgb_gamma, p.contrast,
                    lut, lutsize)
            else:
                cube = dm.build_raw_cube(lut, lutsize)
            if dm.cube_is_separable(cube):
                out13 = dm.apply_raw_cube_rgb16_1d(rgb16, cube)
            else:
                out13 = dm.apply_raw_cube_rgb16_trilinear(rgb16, cube)
            if vignette_active:
                out13 = dm.fast_vignette_wp13(out13,
                                              p.vignette_start - 1.0,
                                              p.vignette_end - 1.0,
                                              p.vignette_gain)
            if sharpen_active:
                out13 = dm.fast_sharpening_blur_h_wp13(out13,
                                                       p.blur_sharpen)
                out13 = dm.fast_sharpening_blur_v_wp13(out13,
                                                       p.blur_sharpen)
            rgb = np.clip(out13 << 3, 0, 65535).astype(np.uint16)
            return _pack_bayer_rgb(rgb, fourcc)
    if p.enabled and (matrix_active or vignette_active or sharpen_active):
        # vignette/sharpen engage the WP13 local-buffer chain even with
        # an identity matrix; in that case the buffer is the RAW
        # demosaic WP13 (rgb16 >> 3) — the identity matrix does NOT run
        # the 1D-LUT develop roundtrip (pinned byte-exact both ways)
        rgb16 = dm.demosaic_raw_rg48(G, RG, BG, GD)
        out13 = dm.apply_active_metadata_matrix(rgb16, m) \
            if matrix_active else rgb16.astype(np.int64) >> 3
        if vignette_active:
            # the VGNS/VGNE tags are unity-1.0 GUI values; the decoder
            # state holds them MINUS ONE (`DemoasicFrames.cpp:5983`,
            # decoder.c:7444 adds the 1 back); vignette runs first in
            # the geometric pass (`decoder.c:7874`)
            out13 = dm.fast_vignette_wp13(out13,
                                          p.vignette_start - 1.0,
                                          p.vignette_end - 1.0,
                                          p.vignette_gain)
        if sharpen_active:
            # BLSH is applied as TWO separable passes on the WP13 local
            # buffer: the in-place integer horizontal FIR in the
            # geometric pass (`decoder.c:7880`), then the float vertical
            # FIR at output-conversion time (`decoder.c:8838`)
            out13 = dm.fast_sharpening_blur_h_wp13(out13, p.blur_sharpen)
            out13 = dm.fast_sharpening_blur_v_wp13(out13, p.blur_sharpen)
        rgb = np.clip(out13 << 3, 0, 65535).astype(np.uint16)
    elif gamma_active:
        rgb16 = dm.demosaic_raw_rg48(G, RG, BG, GD)
        out13 = dm.apply_gamma_tweaks(rgb16, p.rgb_gamma, p.contrast)
        rgb = np.clip(out13 << 3, 0, 65535).astype(np.uint16)
    else:
        rgb = dm.demosaic_raw_rg48(G, RG, BG, GD)
    return _pack_bayer_rgb(rgb, fourcc)


def _pack_bayer_rgb(rgb: np.ndarray, fourcc: str) -> bytes:
    if fourcc == "RG48":
        return rgb.astype("<u2").tobytes()
    # Bayer-source b64a is stored LITTLE-endian ARGB16 (unlike the
    # byte-swapped YUV-source b64a writer) with opaque alpha —
    # verified against the binary (bayer.c ConvertLinesToOutput)
    h, w, _ = rgb.shape
    out = np.empty((h, w, 4), np.uint16)
    out[..., 0] = 0xFFFF
    out[..., 1:] = rgb
    return out.astype("<u2").tobytes()


def decode_sample_bayer(sample: bytes) -> tuple[np.ndarray, object]:
    """Decode a Bayer sample to quarter-res linear RGB (simple develop:
    un-difference the channels, invert the LOG-90 curve; the full
    byte-exact demosaic lives in decode_sample_bayer_to /
    ref/demosaic.py)."""
    from cineform_tpu.entropy import native as entropy_native

    s = parse_sample(sample)
    prescale = intra_prescale(s.precision)[:3]
    planes = []
    for c in intra_channels(s):
        ll, wb = collect_wavelet_bands(c)
        for k in (2, 1):
            ll = xf.dwt2d_inverse(ll, *wb[k], 2 if prescale[k] == 2 else 1)
        plane = xf.dwt2d_inverse(ll, *wb[0], 1)
        planes.append(plane)
    g = np.clip(planes[0], 0, 4095)
    r = np.clip(((planes[1] - 2048) << 1) + g, 0, 4095)
    b = np.clip(((planes[2] - 2048) << 1) + g, 0, 4095)
    # invert LOG-90: lin = (90**(x/4095) - 1) / 89, back to 12-bit linear
    curve = xf.byr4_log90_curve()
    inv = np.zeros(4096, np.int64)
    idx14 = np.arange(1 << 14)
    np.maximum.at(inv, np.clip(curve, 0, 4095), idx14 >> 2)
    rgb = np.stack([inv[r], inv[g], inv[b]], axis=-1)
    return np.clip(rgb, 0, 4095).astype(np.uint16), s


def decode_sample_rgb(sample: bytes,
                      fourcc: str | None = None) -> tuple[bytes, object]:
    """Decode an RGB 4:4:4 / RGBA 4:4:4:4 sample to RG48 / b64a bytes,
    BYTE-EXACT vs the reference decoder.

    The Row16u reconstruction at precision 12 takes no lowpass channel
    offset (`decoder.c:12296-12302`).  RG48 output keeps the scalar-tail
    SATURATE_16U values (65535); the b64a writer stays in the 12-bit
    domain so saturated values cap at 65520 (4095 << 4), with opaque
    alpha 65520 for 3-channel sources and the inverted alpha step curve
    (`Codec/frame.c:6699-6706`) for RGBA."""
    from cineform_tpu.entropy import native as entropy_native

    s = parse_sample(sample)
    prescale = intra_prescale(s.precision)[:3]
    planes = []
    for c in intra_channels(s):
        lowpass, wb = collect_wavelet_bands(c)
        # deep RGB at precision 12 takes no lowpass channel offset
        # (`decoder.c:12296-12302`); the Row16u chain reproduces the
        # scalar-tail SATURATE_16U (65535, not 65520) exactly
        ll = xf.inverse_channel_to_16s(lowpass, wb, prescale)
        lh, hl, hh = wb[0]
        low = xf.v26_inverse(ll, hl)
        high = xf.v26_inverse(lh, hh)
        planes.append(xf.h26_inverse_to_row16u(low, high, s.precision)
                      .astype(np.int64))
    g, r, b = planes[0], planes[1], planes[2]
    h, w = g.shape
    if fourcc is None:
        fourcc = "b64a" if len(planes) == 4 else "RG48"
    if fourcc == "RG48":
        out = np.stack([r, g, b], axis=-1)
        return out.astype("<u2").tobytes(), s
    if fourcc in ("WP13", "W13A"):
        # AM working format of an RGB 4:4:4 source: RG48 >> 3 (+ alpha)
        rgb = np.stack([r, g, b], axis=-1).astype(np.int64) >> 3
        return _wp13_pack(rgb, fourcc), s
    if fourcc in ("BGRa", "BGRA", "RG24"):
        # 8-bit RGB of an RGB 4:4:4 source: the reference dithers with
        # rand()&127 rounding vectors (`ConvertPlanarRGB16uToPackedRGB32`,
        # `Codec/convert.c:6192`) whose consumption order is not
        # recoverable from its outputs; we round to nearest instead
        # (within +/-1 of the binary, ~87% of bytes identical)
        v8 = np.clip((np.stack([b, g, r], axis=-1) + 128) >> 8, 0, 255)
        if fourcc == "RG24":
            out = v8[::-1] if fourcc == "RG24" else v8
            return out.astype(np.uint8).tobytes(), s
        bgra = np.concatenate([v8, np.full((h, w, 1), 255, v8.dtype)], -1)
        if fourcc == "BGRA":
            bgra = bgra[::-1]          # bottom-up DIB rows
        return bgra.astype(np.uint8).tobytes(), s
    if fourcc != "b64a":
        raise ValueError(f"RGB-444 decode to {fourcc!r} is not supported")
    if len(planes) == 3:
        # the 3-channel b64a writer stays in the 12-bit domain (cap
        # 4095 << 4) for the SSE and scalar-tail regions, but the final
        # right-border pair keeps the Row16u SATURATE_16U value (65535);
        # the RGBA-4444 path keeps Row16u values everywhere — both
        # pinned against the binary
        def cap(p):
            q = np.minimum(p, 65520)
            q[:, -2:] = p[:, -2:]
            return q
        r, g, b = cap(r), cap(g), cap(b)
    if len(planes) == 4:
        # full-16-bit alpha decompand (the Row16u output path's variant
        # of codec.h:164-165's constants): floor at the 4096 DC offset,
        # * 9400 >> 13, clamp to 16 bits — fitted 1:1 against the binary
        a = np.clip((np.maximum(planes[3] - 4096, 0) * 9400) >> 13,
                    0, 65535)
    else:
        a = np.full_like(g, 65520)
    out = np.stack([a, r, g, b], axis=-1)
    return out.astype("<u2").tobytes(), s


def decode_sample(sample: bytes, dither: bool = True,
                  frame_index: int = 0) -> tuple[bytes, object]:
    """Decode a CFHD intra sample to YUY2 bytes. Returns (yuy2, parsed).

    With dither=True (default) the output replicates the reference
    decoder's random output dither byte-exactly (glibc rand stream, see
    ref/intra.decode_dither_rows); dither=False rounds deterministically
    (same ±1 band)."""
    from cineform_tpu.entropy import native as entropy_native

    s = parse_sample(sample)
    prescale = intra_prescale(s.precision)[:3]
    row_draws = None
    planes = []
    for ci, c in enumerate(intra_channels(s)):
        lowpass, wb = collect_wavelet_bands(c)
        if dither and row_draws is None:
            row_draws = xf.decode_dither_rows(lowpass.shape[0] * 8,
                                              frame_index)
        off = lowpass_channel_offset(lowpass.shape[1])
        lp = (lowpass + off).astype(lowpass.dtype) if off else lowpass
        planes.append(xf.inverse_channel_to_8bit(
            lp, wb, prescale, dither=row_draws if dither else None,
            dither_group=16 if ci == 0 else 8))
    return xf.pack_yuy2(*planes), s


def lowpass_channel_offset(lowpass_width: int, deep: bool = False,
                           num_frames: int = 1) -> int:
    """The reference decoder's per-channel lowpass load bias
    (`DecodeLowPassBand`, `Codec/decoder.c:12258-12505`, precision 10),
    expressed RELATIVE to this codebase's pinned decode models.

    The reference adds `channeloffset` to every deepest-lowpass
    coefficient as it parses the band.  For EVEN lowpass widths (the
    16-bit fast path) the offset is format-dependent: +24 intra / +48
    two-frame GOP for 8-bit outputs, +4 / +14 for the deep YU64/YR16/v210
    outputs.  For ODD lowpass widths (chroma at w%32==16 frame widths,
    e.g. 144) the generic path applies +5 intra / +10 GOP for EVERY
    output format.  Even offsets propagate exactly through the inverse
    pyramid's shift arithmetic, so our byte-exact 8-bit models absorb the
    +24/+48 in their empirically pinned output-stage constants; odd
    offsets do not, which was the long-unexplained narrow-width chroma
    +-1.  Hence: 8-bit paths get 0 (even) or 5-24 / 10-48 (odd); deep
    paths get the reference values verbatim."""
    if lowpass_width % 2:
        base = 10 if num_frames == 2 else 5
        if deep:
            return base
        return base - (48 if num_frames == 2 else 24)
    if deep:
        return 14 if num_frames == 2 else 4
    return 0


def lowpass_offset_absolute(lowpass_width: int, deep_yuv: bool,
                            num_frames: int = 1) -> int:
    """Absolute channeloffset values (`decoder.c:12258-12505`, precision
    10) for reconstructions built from scratch (the 16-bit planar
    paths): deep YUV outputs (YU64/YR16/v210) get +4/+14, every other
    format (incl. the RGB outputs) +24/+48; odd lowpass widths always
    +5/+10."""
    if lowpass_width % 2:
        return 10 if num_frames == 2 else 5
    if deep_yuv:
        return 14 if num_frames == 2 else 4
    return 48 if num_frames == 2 else 24


def decode_sample_deep16(sample: bytes) -> list[np.ndarray]:
    """Decode to the reference's 16-bit planar rows [Y, C1, C2].

    BYTE-EXACT deep-output reconstruction, pinned against the reference's
    16-bit planar path (`TransformInverseSpatialUniversalThreadedToRow16u`
    + `ConvertRow16uToOutput`, `Codec/decoder.c:26359-26365`): deepest
    lowpass + 4, standard pyramid inverse, final level = v26 vertical
    (floor >>1) + `InvertHorizontalStrip16sToRow16u` horizontal (clamp
    [0, 2*2^precision-1], floor >>1).  Fully deterministic — the deep
    path draws NO rand() dither (verified: rand interposer counts zero
    calls during YU64 decode).  C1/C2 are the sample's channel 1/2
    exactly as the YU64 repack emits them (`ConvertPlanarYUVToYU64`,
    `Codec/convert.c:13985`, precision-16 branch)."""
    return _decode_row16u_planes(sample, deep_yuv=True)


def _decode_deep16_rgbbias(sample: bytes) -> list[np.ndarray]:
    """Row16u planes with the DEFAULT lowpass offset (+24) — the values
    the reference feeds its RGB output conversions."""
    return _decode_row16u_planes(sample, deep_yuv=False)


def _decode_row16u_planes(sample: bytes, deep_yuv: bool) -> list[np.ndarray]:
    from cineform_tpu.entropy import native as entropy_native

    s = parse_sample(sample)
    prescale = intra_prescale(s.precision)[:3]
    planes = []
    for c in intra_channels(s):
        lowpass, wb = collect_wavelet_bands(c)
        off = lowpass_offset_absolute(lowpass.shape[1], deep_yuv)
        lp = (lowpass + off).astype(lowpass.dtype)
        ll = xf.inverse_channel_to_16s(lp, wb, prescale)
        lh, hl, hh = wb[0]
        low = xf.v26_inverse(ll, hl)
        high = xf.v26_inverse(lh, hh)
        planes.append(xf.h26_inverse_to_row16u(low, high, s.precision))
    return planes


def decode_sample_yuv10(sample: bytes) -> list[np.ndarray]:
    """10-bit view of decode_sample_deep16 (floor >>6)."""
    return [(p >> 6).astype(np.int32) for p in decode_sample_deep16(sample)]


def _chroma_444_smoothed(c: np.ndarray, width: int) -> np.ndarray:
    """`ConvertYUVRow16uToYUV444`'s 4:2:2 -> 4:4:4 chroma smoothing
    (`Codec/convert.c:13195`): the duplicated stream shifted by one,
    each half pre-shifted >>1, saturating unsigned add —
    out[2i] = (c[i-1]>>1) + (c[i]>>1), out[2i+1] = (c[i]>>1)*2."""
    half = (c.astype(np.int64) & 0xFFFF) >> 1
    prev = np.concatenate([half[:, :1], half[:, :-1]], axis=1)
    out = np.empty(c.shape[:-1] + (width,), np.int64)
    out[:, 0::2] = np.minimum(prev + half, 0xFFFF)
    out[:, 1::2] = half * 2
    return out


#: ConvertLinesToOutput's fixed 5-bit dither lanes (`Codec/bayer.c:3528`,
#: _mm_set_epi16 order reversed to lane order); Y/U share one pattern, V
#: takes the other, and the patterns swap on odd rows
_R408_DITHER_EVEN = np.array([2, 30, 6, 26, 10, 22, 14, 18], np.int64)
_R408_DITHER_ODD = np.array([18, 14, 22, 10, 26, 6, 30, 2], np.int64)


def _decode_sample_r408(sample: bytes, fourcc: str) -> bytes:
    """R408 (AYUV) / V408 (UYVA) 8-bit 4:4:4:4 output, byte-exact:
    Row16u planes (default offset) -> chroma 4:4:4 smoothing -> 16->13
    bit srli -> fixed 5-bit dither lanes -> srai 5 -> packus; R408
    subtracts 16 from Y with unsigned saturation
    (`ConvertLinesToOutput`, `Codec/bayer.c:3497-3700`, driven through
    `Row16uFull2OutputFormat`'s LUTYUV branch)."""
    y16, c116, c216 = _decode_row16u_planes(sample, False)
    h, w = y16.shape
    u444 = _chroma_444_smoothed(c216, w)
    v444 = _chroma_444_smoothed(c116, w)
    cols = np.arange(w) % 8
    rows_odd = (np.arange(h)[:, None] & 1).astype(bool)
    d_yu = np.where(rows_odd, _R408_DITHER_ODD[cols][None, :],
                    _R408_DITHER_EVEN[cols][None, :])
    d_v = np.where(rows_odd, _R408_DITHER_EVEN[cols][None, :],
                   _R408_DITHER_ODD[cols][None, :])

    def conv(p, d):
        v13 = (p.astype(np.int64) & 0xFFFF) >> 3
        return np.clip(np.clip(v13 + d, -32768, 32767) >> 5, 0, 255)

    y8 = conv(y16, d_yu)
    u8 = conv(u444, d_yu)
    v8 = conv(v444, d_v)
    a8 = np.full_like(y8, 255)
    if fourcc == "R408":
        out = np.stack([a8, np.maximum(y8 - 16, 0), u8, v8], -1)
    else:
        out = np.stack([u8, y8, v8, a8], -1)
    return out.astype(np.uint8).tobytes()


def _decode_sample_avid(sample: bytes, fourcc: str) -> bytes:
    """Avid CT output family, byte-exact vs the reference binary
    (decode_fmt goldens): the 16-bit planar reconstruction with the
    default (+24) lowpass offset, component quads ordered
    [C1, Y1, C2, Y2] per pixel pair (`ConvertYUV16ToCbYCrY_*`,
    `Codec/convert.c:19023-19929`):

    - 'av16' / 'a106': the 16-bit values verbatim
    - 'a214': signed 2.14 -- luma Clamp16s((v-4096)<<6 / 219), chroma
      Clamp16s((v-4096)<<6 / 224 - 8192), C-truncating division
    - 'av28': two planes -- 2-bit uppers ((v>>6)&3) packed 4-per-byte
      [C1|Y1|C2|Y2] high-to-low, then 8-bit lowers (v>>8) as CbYCrY rows
    """
    y16, c116, c216 = _decode_row16u_planes(sample, False)
    h, half = c116.shape
    y1, y2 = y16[:, 0::2], y16[:, 1::2]
    if fourcc in ("av16", "a106"):
        out = np.stack([c116, y1, c216, y2], -1)
        return out.astype("<u2").tobytes()
    if fourcc == "a214":
        def trunc_div(n, d):
            return np.sign(n) * (np.abs(n) // d)

        def lum(v):
            return np.clip(trunc_div((v.astype(np.int64) - 4096) << 6, 219),
                           -32768, 32767)

        def chr_(v):
            return np.clip(
                trunc_div((v.astype(np.int64) - 4096) << 6, 224) - 8192,
                -32768, 32767)
        out = np.stack([chr_(c116), lum(y1), chr_(c216), lum(y2)], -1)
        return out.astype("<i2").tobytes()
    # av28: w*h/2 bytes of packed 2-bit uppers + 2*w*h bytes of 8-bit
    # lowers; this converter wires the chroma channels the OTHER way
    # around from av16/a106/a214 (pinned against the binary's goldens)
    quads = np.stack([c216, y1, c116, y2], -1).astype(np.int64)
    upper = ((quads[..., 0] >> 6) & 3) << 6 | ((quads[..., 1] >> 6) & 3) << 4 \
        | ((quads[..., 2] >> 6) & 3) << 2 | ((quads[..., 3] >> 6) & 3)
    lower = (quads >> 8) & 0xFF
    return upper.astype(np.uint8).tobytes() + lower.astype(np.uint8).tobytes()


def yuv16_to_wp13(y16: np.ndarray, c116: np.ndarray,
                  c216: np.ndarray) -> np.ndarray:
    """16-bit planar 4:2:2 YUV -> signed 13-bit-whitepoint RGB (H, W, 3),
    the Active-Metadata working format (`ConvertYUVRow16uToBGRA64` with
    format WP13: saturate=0, whitebitdepth=13, CG 709 constants,
    `Codec/convert.c:12183-12460`; chroma duplicated, not smoothed)."""
    h, w = y16.shape

    def sat16(x):
        return np.clip(x, -32768, 32767)

    def mulhi(a, b):
        return (a.astype(np.int64) * b) >> 16

    mp = np.float32(8192.0)
    ymult = int(mp * np.float32(1.164))
    r_vmult = int(mp * np.float32(1.793))
    g_vmult = int(mp * np.float32(0.534))
    g_umult = int(mp * np.float32(0.213))
    b_umult = int(mp * np.float32(2.115))

    y15 = (y16.astype(np.int64) & 0xFFFF) >> 1
    uu = sat16(np.repeat((c216.astype(np.int64) & 0xFFFF) >> 1, 2, 1)
               - 16384)
    vv = sat16(np.repeat((c116.astype(np.int64) & 0xFFFF) >> 1, 2, 1)
               - 16384)
    y14 = mulhi(sat16(y15 - 2048), ymult) << 2
    r = sat16(y14 + (mulhi(vv, r_vmult) << 2)) >> 1
    g = sat16(sat16(y14 - (mulhi(vv, g_vmult) << 2))
              - (mulhi(uu, g_umult) << 2)) >> 1
    b = sat16(y14 + (mulhi(uu, b_umult) << 2)) >> 1
    return np.stack([r, g, b], -1)


def _wp13_pack(rgb13: np.ndarray, fourcc: str) -> bytes:
    if fourcc == "WP13":
        return rgb13.astype("<i2").tobytes()
    h, w, _ = rgb13.shape
    out = np.empty((h, w, 4), np.int64)
    out[..., :3] = rgb13
    out[..., 3] = 8191                        # 13-bit opaque white
    return out.astype("<i2").tobytes()


def _decode_sample_rg24(sample: bytes) -> bytes:
    """RG24 (8-bit BGR, bottom-up) output of a 4:2:2 sample, byte-exact:
    the scalar `ConvertRow16uToDitheredRGB` loop (`Codec/convert.c:11390`)
    with per-pixel-pair glibc rand()&0x7fff dither, rows in the decoder's
    border-strips-first dispatch order."""
    from cineform_tpu.utils.glibc_random import glibc_rand_sequence

    y16, c116, c216 = _decode_row16u_planes(sample, False)
    h, w = y16.shape
    yv = (y16.astype(np.int64) & 0xFFFF)
    u = np.repeat(c216.astype(np.int64) & 0xFFFF, 2, 1) - 32768
    v = np.repeat(c116.astype(np.int64) & 0xFFFF, 2, 1) - 32768
    ymult, r_v, g_v, g_u, b_u = 128 * 149, 230, 137, 55, 135  # CG 709
    y = (yv - (16 << 8)) * ymult >> 7
    draws = (glibc_rand_sequence(w * h) & 0x7FFF).astype(np.int64)
    order = [0, 1, h - 2, h - 1] + list(range(2, h - 2))
    dith = np.empty((h, w), np.int64)
    for blk, r in enumerate(order):
        dith[r] = draws[w * blk:w * (blk + 1)]
    rr = (y + r_v * v + dith) >> 15
    gg = (y - g_u * (u >> 1) - g_v * (v >> 1) + dith) >> 15
    bb = (y + 2 * b_u * u + dith) >> 15
    out = np.clip(np.stack([bb, gg, rr], -1), 0, 255).astype(np.uint8)
    return out[::-1].tobytes()                # bottom-up rows


def decode_sample_to(sample: bytes, fourcc: str) -> bytes:
    """Decode to an alternate output pixel format.

    '2vuy' is byte-exact vs the reference decoder (a repack of the
    byte-exact YUY2 output); 'YU64' and 'v210' are byte-exact deep
    outputs (see decode_sample_yuv10: the deterministic 16-bit planar
    reconstruction + `ConvertPlanarYUVToYU64`/`ConvertPlanarYUVToV210`
    precision-16 repack, `Codec/convert.c:13985/13526`).  The round-4
    tail — yuyv/BGRa/RG24/R408/V408/WP13/W13A — is byte-exact against
    decode_fmt goldens from the reference binary."""
    if fourcc == "2vuy":
        yuy2, _ = decode_sample(sample)
        a = np.frombuffer(yuy2, np.uint8).reshape(-1, 4)
        out = a[:, [1, 0, 3, 2]]
        return np.ascontiguousarray(out).tobytes()
    if fourcc == "yuyv":
        # DECODED_FORMAT_YUYV is the same byte layout as YUY2
        return decode_sample(sample)[0]
    if fourcc == "BGRA":
        return decode_sample_bgra(sample)
    if fourcc == "BGRa":
        # BGRa is BGRA without the bottom-up row inversion
        s = parse_sample(sample)
        rows = np.frombuffer(decode_sample_bgra(sample), np.uint8)
        return np.ascontiguousarray(
            rows.reshape(s.height, -1)[::-1]).tobytes()
    if fourcc == "RG24":
        return _decode_sample_rg24(sample)
    if fourcc in ("R408", "V408"):
        return _decode_sample_r408(sample, fourcc)
    if fourcc in ("av16", "a106", "a214", "av28"):
        return _decode_sample_avid(sample, fourcc)
    if fourcc == "avu8":
        # the reference binary CANNOT decode to CT_UCHAR through its
        # public API: CSampleDecoder::GetFramePitch has no case for it
        # and throws CFHD_ERROR_BADFORMAT, which CFHD_DecodeSample
        # surfaces as CFHD_ERROR_DECODE_BUFFER_SIZE
        # (`DecoderSDK/SampleDecoder.cpp:290-360`, CFHDDecoder.cpp:754)
        raise ValueError("avu8 output is rejected by the reference SDK")
    if fourcc in ("WP13", "W13A"):
        return _wp13_pack(yuv16_to_wp13(*_decode_row16u_planes(
            sample, False)), fourcc)
    return pack_deep_output(fourcc, decode_sample_deep16(sample),
                            lambda: _decode_deep16_rgbbias(sample))


def decode_sample_bgra(sample: bytes) -> bytes:
    """BYTE-EXACT BGRA decode: the fused final-level horizontal inverse
    + YUV->RGB kernel (`InvertHorizontalStripYUV16sToPackedRGB32`,
    `Codec/spatial.c:29577`) modeled exactly in ref.intra.strip_to_bgra,
    fed the v26 vertical-inverse strips with the default +24 lowpass
    channel offset; RGB32 rows are written bottom-up."""
    from cineform_tpu.entropy import native as entropy_native

    s = parse_sample(sample)
    prescale = intra_prescale(s.precision)[:3]
    strips = []
    for c in intra_channels(s):
        lowpass, wb = collect_wavelet_bands(c)
        off = lowpass_offset_absolute(lowpass.shape[1], False, 1)
        lp = (lowpass + off).astype(lowpass.dtype)
        ll = xf.inverse_channel_to_16s(lp, wb, prescale)
        lh, hl, hh = wb[0]
        strips.append((xf.v26_inverse(ll, hl), xf.v26_inverse(lh, hh)))
    (yl, yh), (c1l, c1h), (c2l, c2h) = strips
    # the kernel maps u <- channel 2 and v <- channel 1 (spatial.c:29585)
    out = xf.strip_to_bgra(yl, yh, c2l, c2h, c1l, c1h, s.precision)
    return out[::-1].tobytes()


def pack_deep_output(fourcc: str, planes_yuv: list[np.ndarray],
                     planes_rgb_fn) -> bytes:
    """Pack 16-bit planar reconstructions into the deep output formats
    (shared by the intra and GOP deep decode paths).

    planes_yuv: Row16u planes with the deep-YUV lowpass offset (for
    YU64/v210/NV12); planes_rgb_fn: lazy planes with the DEFAULT offset
    (for the RGB family — `decoder.c:12278` brackets)."""
    y16, c116, c216 = planes_yuv
    y, cb, cr = (y16 >> 6).astype(np.int32), (c116 >> 6).astype(np.int32), \
        (c216 >> 6).astype(np.int32)
    h, w = y16.shape
    if fourcc == "YU64":
        row = np.empty((h, 2 * w), np.uint16)
        row[:, 0::4] = y16[:, 0::2].astype(np.uint16)
        row[:, 1::4] = c116.astype(np.uint16)
        row[:, 2::4] = y16[:, 1::2].astype(np.uint16)
        row[:, 3::4] = c216.astype(np.uint16)
        return row.astype("<u2").tobytes()
    if fourcc == "NV12":
        # 4:2:0 planar Y + interleaved UV: vertical chroma decimation by
        # averaging row pairs (DECODED_FORMAT_NV12 analog)
        y8 = np.clip((y + 2) >> 2, 0, 255).astype(np.uint8)
        cb2 = (cb[0::2] + cb[1::2] + 1) >> 1
        cr2 = (cr[0::2] + cr[1::2] + 1) >> 1
        uv = np.empty((h // 2, w), np.uint8)
        uv[:, 0::2] = np.clip((cb2 + 2) >> 2, 0, 255).astype(np.uint8)
        uv[:, 1::2] = np.clip((cr2 + 2) >> 2, 0, 255).astype(np.uint8)
        return y8.tobytes() + uv.tobytes()
    if fourcc in ("RG48", "BGRA", "b64a", "r210", "DPX0", "RG30",
                  "AB10", "AR10"):
        # BYTE-EXACT RGB outputs of 4:2:2 YUV samples, pinned against the
        # reference's deterministic chain (no rand() drawn — verified):
        # Row16u planar reconstruction with the DEFAULT lowpass channel
        # offset (+24, NOT the deep-YUV +4: `decoder.c:12278`), chroma
        # REPLICATED to 4:4:4 (`ChannelYUYV16toPlanarYUV16` without
        # COLOR_SPACE_422_TO_444), `PlanarYUV16toPlanarRGB16` fixed-point
        # CG 709 matrix incl. TWEAK adjustments and int16 wrap quirks,
        # then `ConvertLinesToOutput` per-format packing (bayer.c:478).
        planes = planes_rgb_fn()
        y16, c116, c216 = planes
        u444 = xf.chroma_422_to_444(c216, w, interpolate=False)
        v444 = xf.chroma_422_to_444(c116, w, interpolate=False)
        r16, g16, b16 = xf.yuv16_to_rgb16(y16, u444, v444)
        if fourcc == "RG48":
            return np.stack([r16, g16, b16], -1).astype("<u2").tobytes()
        if fourcc == "b64a":
            out = np.empty((h, w, 4), np.int32)
            out[..., 0] = 0xFFFF
            out[..., 1] = r16
            out[..., 2] = g16
            out[..., 3] = b16
            return out.astype("<u2").tobytes()
        r, g, b = r16 >> 6, g16 >> 6, b16 >> 6
        if fourcc == "AR10":
            word = (r.astype(np.uint32) << 20) | (g << 10) | b
        else:
            _, swap, (rs, gs, bs) = xf.RGB10_INPUT_FORMATS[fourcc]
            word = ((r.astype(np.uint32) << rs) | (g << gs) | (b << bs))
            if swap:
                word = (((word & 0xFF) << 24) | ((word & 0xFF00) << 8)
                        | ((word >> 8) & 0xFF00) | (word >> 24))
        return word.astype("<u4").tobytes()
    if fourcc == "v210":
        # 6 pixels -> 4 words -> 12 component slots per group
        # (`ConvertPlanarYUVToV210`, `Codec/convert.c:13526`, the
        # precision-16 / downshift branch).  NOTE: the reference's v210
        # OUTPUT writer swaps Cb/Cr relative to its own v210 reader
        # (slot 0 carries channel 2), pinned against decode_fmt goldens.
        cb, cr = cr, cb
        pitch_words = ((w + 47) // 48) * 32
        stream = np.zeros((h, pitch_words * 3), np.int64)
        gfull = w // 6
        sl = stream[:, :12 * gfull].reshape(h, gfull, 12)
        yg = y[:, :6 * gfull].reshape(h, gfull, 6)
        cbg = cb[:, :3 * gfull].reshape(h, gfull, 3)
        crg = cr[:, :3 * gfull].reshape(h, gfull, 3)
        sl[:, :, 0] = cbg[:, :, 0]
        sl[:, :, 1] = yg[:, :, 0]
        sl[:, :, 2] = crg[:, :, 0]
        sl[:, :, 3] = yg[:, :, 1]
        sl[:, :, 4] = cbg[:, :, 1]
        sl[:, :, 5] = yg[:, :, 2]
        sl[:, :, 6] = crg[:, :, 1]
        sl[:, :, 7] = yg[:, :, 3]
        sl[:, :, 8] = cbg[:, :, 2]
        sl[:, :, 9] = yg[:, :, 4]
        sl[:, :, 10] = crg[:, :, 2]
        sl[:, :, 11] = yg[:, :, 5]
        if 6 * gfull != w:
            # partial tail group: the reference's scalar loop updates its
            # y1/y2/u/v registers only while `column + k < width`, so
            # out-of-range slots REUSE the last assigned value (not edge
            # replication) — convert.c:13891-13975
            c0 = 6 * gfull
            t = stream[:, 12 * gfull:12 * gfull + 12]
            u = cb[:, c0 // 2].copy()
            v = cr[:, c0 // 2].copy()
            y1 = y[:, c0].copy()
            y2 = y[:, c0].copy()
            t[:, 0] = u; t[:, 1] = y1; t[:, 2] = v
            if c0 + 1 < w:
                y1 = y[:, c0 + 1]
            if c0 + 2 < w:
                u = cb[:, c0 // 2 + 1]
                y2 = y[:, c0 + 2]
            t[:, 3] = y1; t[:, 4] = u; t[:, 5] = y2
            if c0 + 2 < w:
                v = cr[:, c0 // 2 + 1]
            if c0 + 3 < w:
                y1 = y[:, c0 + 3]
                u = cb[:, c0 // 2 + 2]
            t[:, 6] = v; t[:, 7] = y1; t[:, 8] = u
            if c0 + 4 < w:
                y1 = y[:, c0 + 4]
                v = cr[:, c0 // 2 + 2]
            if c0 + 5 < w:
                y2 = y[:, c0 + 5]
            t[:, 9] = y1; t[:, 10] = v; t[:, 11] = y2
        words = (stream[:, 0::3] | (stream[:, 1::3] << 10)
                 | (stream[:, 2::3] << 20))
        return words.astype("<u4").tobytes()
    raise ValueError(f"unsupported output format {fourcc}")


def decode_sample_scaled(sample: bytes, resolution: int) -> bytes:
    """Resolution-scalable decode: stop the wavelet inverse early.

    resolution: 2=half, 3=quarter, 4=thumbnail (CFHD_DECODED_RESOLUTION_*,
    `Common/CFHDTypes.h:451-470`; reference `ReconstructQuarterFrame`
    `Codec/decoder.c:16565`).  The partially reconstructed lowpass carries a
    known gain over the 10-bit pixels — x16 at the deepest level, x4 after
    one or two inverse levels (the prescale-2 middle level keeps the extra
    bits) — so the 8-bit output descale shifts are 6/4/4.
    """
    from cineform_tpu.entropy import native as entropy_native

    s = parse_sample(sample)
    prescale = intra_prescale(s.precision)[:3]
    levels = {4: 0, 3: 1, 2: 2}[resolution]
    planes = []
    for c in s.channels:
        bands: list[dict] = [dict() for _ in range(3)]
        for b in c.bands:
            widx = 2 - (b.subband - 1) // 3
            if widx < 3 - levels:
                continue  # deeper resolution truncation skips this band
            pitchw = align16_pixels(b.width)
            vals, _ = entropy_native.decode_band(
                b.data, pitchw * b.height, codeset=17, quant=b.quantization)
            bands[widx][b.band] = vals.reshape(b.height, pitchw)[:, :b.width]
        off = lowpass_channel_offset(c.lowpass.shape[1])
        ll = (c.lowpass + off).astype(c.lowpass.dtype) if off else c.lowpass
        shift = 6 if levels == 0 else 4
        for k in range(2, 2 - levels, -1):
            lh, hl, hh = bands[k][1], bands[k][2], bands[k][3]
            descale = 2 if prescale[k] == 2 else 1
            ll = xf.dwt2d_inverse(ll, lh, hl, hh, descale)
        # rounding bias is half-1, like the full-res output stage's +3>>3
        # (byte-exact vs the reference, which adds no dither below full res)
        plane = np.clip((ll + (1 << (shift - 1)) - 1) >> shift, 0, 255)
        planes.append(plane.astype(np.uint8))
    return xf.pack_yuy2(*planes)
