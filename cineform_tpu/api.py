"""Public CFHD-shaped API: the framework's equivalent of CFHDEncoder.h /
CFHDDecoder.h (`Common/CFHDEncoder.h:254-428`, `Common/CFHDDecoder.h:201-309`).

The surface mirrors the reference's ~40 `CFHD_*` entry points as two small
classes plus module-level aliases, so a reference user can map calls 1:1:

    CFHD_OpenEncoder / CFHD_PrepareToEncode / CFHD_EncodeSample /
    CFHD_GetSampleData / CFHD_CloseEncoder            -> Encoder
    CFHD_OpenDecoder / CFHD_GetOutputFormats /
    CFHD_PrepareToDecode / CFHD_DecodeSample / ...    -> Decoder
    CFHD_CreateEncoderPool / CFHD_EncodeAsyncSample /
    CFHD_WaitForSample / ...                          -> pool.EncoderPool

Errors raise CFHDError carrying the CFHD_ERROR_* code instead of returning
status ints (`Common/CFHDError.h:25-82`).
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass

import numpy as np


def _fourcc(s: str) -> int:
    b = s.encode()
    return (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]


class ErrorCode(enum.IntEnum):
    """CFHD_Error values (`Common/CFHDError.h:25-82`)."""

    OKAY = 0
    INVALID_ARGUMENT = 1
    OUTOFMEMORY = 2
    BADFORMAT = 3
    BADSCALING = 4
    BADSAMPLE = 5
    INTERNAL = 6
    METADATA_CLASS = 7
    METADATA_UNDEFINED = 8
    METADATA_END = 9
    UNEXPECTED = 10
    BAD_RESOLUTION = 11
    BAD_PIXEL_SIZE = 12
    NOT_FINISHED = 13
    ENCODING_NOT_STARTED = 14
    METADATA_ATTACHED = 15
    BAD_METADATA = 16
    THREAD_CREATE_FAILED = 17
    THREAD_WAIT_FAILED = 18
    UNKNOWN_TAG = 19
    LICENSING = 20
    CODEC_ERROR = 2048


class CFHDError(Exception):
    def __init__(self, code: ErrorCode, message: str = "") -> None:
        super().__init__(f"{code.name}: {message}" if message else code.name)
        self.code = code


class PixelFormat(enum.IntEnum):
    """CFHD_PixelFormat FOURCCs (`Common/CFHDTypes.h:112-178`)."""

    YUY2 = _fourcc("YUY2")
    UYVY = _fourcc("2vuy")
    BGRA = _fourcc("BGRA")
    RG24 = _fourcc("RG24")
    RG48 = _fourcc("RG48")
    B64A = _fourcc("b64a")
    V210 = _fourcc("v210")
    YU64 = _fourcc("YU64")
    BYR4 = _fourcc("BYR4")
    BYR5 = _fourcc("BYR5")
    DPX0 = _fourcc("DPX0")
    R210 = _fourcc("r210")
    RG30 = _fourcc("RG30")
    AB10 = _fourcc("AB10")
    AR10 = _fourcc("AR10")
    RG64 = _fourcc("RG64")
    NV12 = _fourcc("NV12")
    # decoder-only output formats (`Common/CFHDTypes.h:63-70`)
    YUYV = _fourcc("yuyv")
    BGRa = _fourcc("BGRa")
    R408 = _fourcc("R408")
    V408 = _fourcc("V408")
    WP13 = _fourcc("WP13")
    W13A = _fourcc("W13A")
    BYR2 = _fourcc("BYR2")
    # Avid CT family (`Common/CFHDTypes.h:79-84`)
    CT_UCHAR = _fourcc("avu8")
    CT_10BIT_2_8 = _fourcc("av28")
    CT_SHORT_2_14 = _fourcc("a214")
    CT_USHORT_10_6 = _fourcc("a106")
    CT_SHORT = _fourcc("av16")


class EncodedFormat(enum.IntEnum):
    """CFHD_EncodedFormat (`Common/CFHDTypes.h:231-240`)."""

    YUV_422 = 0
    RGB_444 = 1
    RGBA_4444 = 2
    BAYER = 3


class EncodingQuality(enum.IntEnum):
    """CFHD_EncodingQuality (`Common/CFHDTypes.h:200-221`)."""

    FIXED = 0
    LOW = 1
    MEDIUM = 2
    HIGH = 3
    FILMSCAN1 = 4
    FILMSCAN2 = 5
    FILMSCAN3 = 6
    DEFAULT = 4


class DecodedResolution(enum.IntEnum):
    """CFHD_DecodedResolution (`Common/CFHDTypes.h:451-470`)."""

    FULL = 1
    HALF = 2
    QUARTER = 3
    THUMBNAIL = 4


class EncodingFlags(enum.IntFlag):
    NONE = 0
    YUV_INTERLACED = 1 << 0      # CFHD_ENCODING_FLAGS_YUV_INTERLACED
    YUV_2FRAME_GOP = 1 << 1      # CFHD_ENCODING_FLAGS_YUV_2FRAME_GOP (`Common/CFHDTypes.h:254`)


class DecodingFlags(enum.IntFlag):
    NONE = 0


@dataclass
class SampleInfo:
    """CFHD_GetSampleInfo results (`DecoderSDK/CFHDDecoder.cpp`)."""

    width: int
    height: int
    display_height: int
    key_frame: bool
    encoded_format: EncodedFormat
    quality: int
    frame_number: int


# ---------------------------------------------------------------------------
# Device (TPU) routing for the synchronous API
# ---------------------------------------------------------------------------

def _use_device() -> bool:
    """True when the sync API should run its hot path on the accelerator.

    CINEFORM_API_DEVICE=1 forces it on (e.g. tests on the CPU backend),
    =0 forces host-only; default: any non-CPU JAX backend."""
    import os
    mode = os.environ.get("CINEFORM_API_DEVICE", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    try:
        import jax
        return jax.default_backend() != "cpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=16)
def _device_codec(width: int, height: int, quality: int, fmt: str):
    from cineform_tpu.models.intra import IntraCodec

    return IntraCodec(width=width, height=height, quality=quality,
                      input_format=fmt)


# ---------------------------------------------------------------------------
# Encoder (CFHD_OpenEncoder .. CFHD_CloseEncoder)
# ---------------------------------------------------------------------------

class Encoder:
    """Synchronous sample encoder (`EncoderSDK/SampleEncoder.cpp:115-620`)."""

    INPUT_FORMATS = (PixelFormat.YUY2, PixelFormat.UYVY, PixelFormat.V210,
                     PixelFormat.YU64, PixelFormat.RG48, PixelFormat.B64A,
                     PixelFormat.R210, PixelFormat.DPX0, PixelFormat.RG30,
                     PixelFormat.AB10, PixelFormat.AR10, PixelFormat.BGRA,
                     PixelFormat.RG24, PixelFormat.RG64, PixelFormat.BYR4,
                     PixelFormat.BYR5, PixelFormat.CT_UCHAR,
                     PixelFormat.CT_10BIT_2_8, PixelFormat.CT_SHORT_2_14,
                     PixelFormat.CT_USHORT_10_6, PixelFormat.CT_SHORT,
                     PixelFormat.BGRa)
    # internal COLOR_FORMAT codes written into the INPUT_FORMAT tag
    # (Avid CbYCrY codes: `Codec/color.h:104-108`)
    _INPUT_FORMAT_CODES = {PixelFormat.YUY2: 2, PixelFormat.UYVY: 1,
                           PixelFormat.V210: 10, PixelFormat.YU64: 12,
                           PixelFormat.CT_UCHAR: 65, PixelFormat.CT_SHORT: 66,
                           PixelFormat.CT_10BIT_2_8: 67,
                           PixelFormat.CT_SHORT_2_14: 68,
                           PixelFormat.CT_USHORT_10_6: 69}

    def __init__(self) -> None:
        self._prepared = False
        self._sample: bytes | None = None
        self._frame_number = 0
        self._fs_limiter = None
        self._custom_quant = None
        self._metadata = None

    # CFHD_GetInputFormats
    def get_input_formats(self) -> tuple[PixelFormat, ...]:
        return self.INPUT_FORMATS

    # CFHD_PrepareToEncode
    def prepare_to_encode(self, width: int, height: int,
                          pixel_format: PixelFormat,
                          encoded_format: EncodedFormat = EncodedFormat.YUV_422,
                          encoding_flags: EncodingFlags = EncodingFlags.NONE,
                          quality: EncodingQuality = EncodingQuality.FILMSCAN1,
                          ) -> None:
        if pixel_format not in self.INPUT_FORMATS:
            raise CFHDError(ErrorCode.BADFORMAT, f"{pixel_format!r}")
        rgb444 = (PixelFormat.RG48, PixelFormat.R210, PixelFormat.DPX0,
                  PixelFormat.RG30, PixelFormat.AB10, PixelFormat.AR10,
                  PixelFormat.BGRA, PixelFormat.RG24)
        rgba = (PixelFormat.B64A, PixelFormat.RG64)
        bayer = (PixelFormat.BYR4, PixelFormat.BYR5)
        # RGB/RGBA/Bayer inputs imply their natural encoded format (the
        # reference maps them the same way in CFHD_PrepareToEncode)
        ok = (encoded_format == EncodedFormat.YUV_422
              and pixel_format not in rgb444 + rgba + bayer) or \
             (encoded_format == EncodedFormat.RGB_444 and pixel_format in rgb444) or \
             (encoded_format == EncodedFormat.RGBA_4444 and pixel_format in rgba) or \
             (encoded_format == EncodedFormat.BAYER and pixel_format in bayer) or \
             (encoded_format == EncodedFormat.YUV_422 and pixel_format in rgb444 + rgba + bayer)
        if not ok:
            raise CFHDError(ErrorCode.BADFORMAT, f"{encoded_format!r}")
        if width % 16 or height % 8 or width < 32 or height < 48:
            # dims must survive 3 halvings with filter-legal extents
            raise CFHDError(ErrorCode.INVALID_ARGUMENT,
                            f"unsupported dimensions {width}x{height}")
        if (encoding_flags & EncodingFlags.YUV_2FRAME_GOP) and \
                pixel_format != PixelFormat.YUY2:
            raise CFHDError(ErrorCode.BADFORMAT,
                            "2-frame GOP supports YUY2 input")
        if (encoding_flags & EncodingFlags.YUV_INTERLACED) and not \
                (encoding_flags & EncodingFlags.YUV_2FRAME_GOP):
            raise CFHDError(ErrorCode.BADFORMAT,
                            "interlaced encoding requires the 2-frame GOP")
        self.width = width
        self.height = height
        self.pixel_format = pixel_format
        self.encoded_format = encoded_format
        self.encoding_flags = encoding_flags
        self.quality = EncodingQuality(int(quality) & 0xFF)
        #: full quality word incl. the *_UNCOMPRESSED target bits 8-12
        #: (`Common/CFHDTypes.h:210-216`, `Codec/encoder.c:1979`)
        self.quality_word = int(quality)
        self._unc_last16 = [0] * 16
        #: True once a compressed frame has initialized the codec state
        #: (prescale table); uncompressed samples switch header form then
        self._compressed_encoded = False
        self._pending_gop_frame = None
        self._prepared = True

    # CFHD_MetadataAttach
    def attach_metadata(self, metadata) -> None:
        self._metadata = metadata

    def _encoder_overrides(self) -> dict:
        """Collect encoder setting overrides in the reference's priority
        order: attached metadata, then defaults.colr, then override.colr
        (`Codec/encoder.c:2070-2078`, `encoder.c:8792`)."""
        from cineform_tpu.utils import override_db

        local = b""
        if self._metadata is not None and hasattr(self._metadata, "block"):
            try:
                local = self._metadata.block()
            except Exception:
                local = b""
        base, force = override_db.load_disk_blocks()
        ov = override_db.parse_overrides(local)
        if not ov.get("ignore_database"):
            ov.update(override_db.parse_overrides(base, force))
        return ov

    def _encode_device(self, buf: np.ndarray) -> bytes | None:
        """Route the sync encode through the device codec (the TPU
        re-expression of the reference's single hot path,
        `EncoderSDK/SampleEncoder.cpp:480` -> `Codec/encoder.c:1897`).
        Byte-identical to the host path; returns None when the config is
        host-only or the device is unavailable (CPU fallback)."""
        if not _use_device():
            return None
        try:
            from cineform_tpu.models.intra import IntraCodec
            codec = _device_codec(self.width, self.height,
                                  int(self.quality), "YUY2")
            samples = codec.encode_batch_device(
                buf.reshape(1, self.height, 2 * self.width),
                frame_numbers=[self._frame_number],
                metadata=[self._metadata] if self._metadata else None)
            return samples[0]
        except Exception:
            return None

    # CFHD_EncodeSample
    def set_custom_quantization(self, quant_y, quant_c=None) -> None:
        """Custom per-subband quantization override (the low-level codec
        API's custom_quant struct, `Codec/encoder.c:1143`): 17-entry
        luma/chroma tables replace the quality presets; the reference's
        precision scaling and gop-length remap apply on top
        (spec.production.custom_quant_tables, oracle-validated)."""
        from cineform_tpu.spec.production import custom_quant_tables
        self._custom_quant = custom_quant_tables(
            list(quant_y), list(quant_c if quant_c is not None else quant_y),
            10, gop_length=1)

    def encode_sample(self, frame: bytes | np.ndarray, pitch: int | None = None) -> None:
        from cineform_tpu.models import intra_host
        from cineform_tpu.ref import intra as xf

        if not self._prepared:
            raise CFHDError(ErrorCode.ENCODING_NOT_STARTED)
        pf = PixelFormat
        gop = bool(getattr(self, "encoding_flags", 0)
                   & EncodingFlags.YUV_2FRAME_GOP)
        row_bytes = {
            pf.YUY2: 2 * self.width, pf.UYVY: 2 * self.width,
            pf.V210: ((self.width + 47) // 48) * 128,
            pf.RG48: 6 * self.width, pf.B64A: 8 * self.width,
            pf.YU64: 4 * self.width, pf.BYR4: 2 * self.width,
            pf.BYR5: 3 * self.width // 2,
            pf.BGRA: 4 * self.width, pf.RG24: 3 * self.width,
            pf.RG64: 8 * self.width,
            pf.R210: 4 * self.width, pf.DPX0: 4 * self.width,
            pf.RG30: 4 * self.width, pf.AB10: 4 * self.width,
            pf.AR10: 4 * self.width,
            pf.CT_UCHAR: 2 * self.width,
            # av28: w*h/2 upper plane + 2*w*h lower plane = 2.5 B/px
            pf.CT_10BIT_2_8: 5 * self.width // 2,
            pf.CT_SHORT_2_14: 4 * self.width,
            pf.CT_USHORT_10_6: 4 * self.width,
            pf.CT_SHORT: 4 * self.width,
            pf.BGRa: 4 * self.width,
        }[self.pixel_format]
        buf = (np.frombuffer(frame, dtype=np.uint8)
               if isinstance(frame, (bytes, bytearray)) else frame.view(np.uint8))
        if pitch is not None and pitch != row_bytes:
            buf = buf.reshape(-1, pitch)[:self.height, :row_bytes]
        buf = np.ascontiguousarray(buf).reshape(-1)
        if buf.size != self.height * row_bytes:
            raise CFHDError(ErrorCode.INVALID_ARGUMENT, "bad frame size")
        self._frame_number += 1
        # FILMSCAN2/3 rate control (`QuantizationSetQuality`,
        # quantize.c:236-310): the limiter advances each frame from the
        # previous sample's achieved compression
        if (int(self.quality) & 0xFF) >= 5 and not (self.quality_word & 0x1F00):
            from cineform_tpu.spec.production import update_fs_rate_limiter
            if self._fs_limiter is None:
                self._fs_limiter = {5: 8, 6: 4}.get(int(self.quality) & 0xFF, 0)
            if self._sample is not None:
                self._fs_limiter = update_fs_rate_limiter(
                    self._fs_limiter, self.quality_word, len(self._sample),
                    self.width, self.height)
        # per-frame metadata: the reference auto-increments UFRM and the
        # timecode on every EncodeSample (`SampleEncoder.cpp:795-880`)
        base_meta = self._metadata or intra_host.EncoderMetadata()
        frame_meta = (base_meta.advanced(self._frame_number - 1)
                      if hasattr(base_meta, "advanced") else base_meta)
        if self.pixel_format in (PixelFormat.RG48, PixelFormat.B64A):
            self._sample = intra_host.encode_sample_rgb(
                buf.tobytes(), self.width, self.height, int(self.quality),
                alpha=(self.pixel_format == PixelFormat.B64A),
                frame_number=self._frame_number, metadata=frame_meta)
        elif self.pixel_format in (PixelFormat.R210, PixelFormat.DPX0,
                                   PixelFormat.RG30, PixelFormat.AB10,
                                   PixelFormat.AR10):
            fourcc = {PixelFormat.R210: "r210", PixelFormat.DPX0: "DPX0",
                      PixelFormat.RG30: "RG30", PixelFormat.AB10: "AB10",
                      PixelFormat.AR10: "AR10"}[self.pixel_format]
            self._sample = intra_host.encode_sample_rgb10(
                buf.tobytes(), self.width, self.height, int(self.quality),
                fourcc, frame_number=self._frame_number,
                metadata=frame_meta)
        elif self.pixel_format in (PixelFormat.BGRA, PixelFormat.BGRa,
                                   PixelFormat.RG24):
            self._sample = intra_host.encode_sample_rgb8(
                buf.tobytes(), self.width, self.height, int(self.quality),
                {PixelFormat.BGRA: "BGRA", PixelFormat.BGRa: "BGRa",
                 PixelFormat.RG24: "RG24"}[self.pixel_format],
                frame_number=self._frame_number, metadata=frame_meta)
        elif self.pixel_format == PixelFormat.RG64:
            self._sample = intra_host.encode_sample_rg64(
                buf.tobytes(), self.width, self.height, int(self.quality),
                frame_number=self._frame_number, metadata=frame_meta)
        elif self.pixel_format in (PixelFormat.BYR4, PixelFormat.BYR5):
            self._sample = intra_host.encode_sample_bayer(
                buf.tobytes(), self.width, self.height, int(self.quality),
                frame_number=self._frame_number, metadata=frame_meta,
                packed=(self.pixel_format == PixelFormat.BYR5))
        elif self.pixel_format == PixelFormat.YUY2 and gop:
            # 2-frame GOP streaming protocol (byte-exact vs the reference
            # CFHD_EncodeSample over a 6-frame series): the stream's very
            # first submission returns the tiny sequence-header sample
            # (`EncodeFirstSample`, encoder.c:3226-3229); the first
            # submission of every LATER pair returns a 24-byte
            # SAMPLE_TYPE_FRAME sample that, on decode, emits the held
            # group's true second frame; the second submission of each
            # pair returns the GROUP sample.
            from cineform_tpu.models import gop_host
            if self._pending_gop_frame is None:
                self._pending_gop_frame = buf.tobytes()
                if self._frame_number == 1:
                    self._sample = gop_host.sequence_header(self.width,
                                                            self.height)
                else:
                    self._sample = gop_host.frame_header_sample(
                        self.width, self.height, self._frame_number - 2)
            else:
                first = self._pending_gop_frame
                self._pending_gop_frame = None
                # the group's FRAME_NUMBER is the display number of its
                # first frame (1, 3, 5, ... across the stream)
                self._sample = gop_host.encode_group(
                    first, buf.tobytes(), self.width, self.height,
                    int(self.quality), self._frame_number - 1,
                    self._metadata,
                    progressive=not (self.encoding_flags
                                     & EncodingFlags.YUV_INTERLACED))
        elif self.pixel_format == PixelFormat.YUY2:
            ov = self._encoder_overrides()
            if ov.get("limit_yuv") or ov.get("conv_601_709"):
                # LYUV/CV67 overrides transform the input pixels during
                # unpack (`Codec/convert.c:5176-5290`); the hidden tags
                # themselves are not written into the sample
                from cineform_tpu.utils.override_db import limit_convert_yuy2
                y, v, u = limit_convert_yuy2(
                    buf.reshape(self.height, 2 * self.width),
                    ov.get("limit_yuv", 0), ov.get("conv_601_709", 0))
                self._sample = intra_host.encode_sample_planes(
                    [y, v, u], self.width, self.height, int(self.quality),
                    input_format=self._INPUT_FORMAT_CODES[PixelFormat.YUY2],
                    frame_number=self._frame_number, metadata=frame_meta,
                    fs_rate_limiter=self._fs_limiter)
            else:
                default_limiter = {5: 8, 6: 4}.get(int(self.quality) & 0xFF)
                sample = (self._encode_device(buf)
                          if self._fs_limiter in (None, default_limiter)
                          and self._custom_quant is None else None)
                self._sample = sample if sample is not None else \
                    intra_host.encode_sample(
                        buf.tobytes(), self.width, self.height,
                        int(self.quality), frame_number=self._frame_number,
                        metadata=frame_meta,
                        fs_rate_limiter=self._fs_limiter,
                        custom_quant=self._custom_quant)
        else:
            quality = int(self.quality)
            quality_tag = None
            if self.pixel_format == PixelFormat.V210 and \
                    (self.quality_word >> 8) & 0x1F:
                # uncompressed passthrough (`Codec/encoder.c:1971-2026`):
                # eligible 10-bit formats roll a per-frame decision; frames
                # not chosen fall back to FILMSCAN3
                meta_block = frame_meta.block()
                head = int.from_bytes(buf.tobytes()[:4], "little")
                if intra_host.uncompressed_decision(
                        head, meta_block, self.quality_word,
                        self._unc_last16):
                    self._sample = intra_host.write_sample_uncompressed(
                        buf.tobytes(), self.width, self.height,
                        self.quality_word, self._frame_number,
                        frame_meta,
                        input_format=self._INPUT_FORMAT_CODES[
                            self.pixel_format],
                        later_form=self._compressed_encoded)
                    return
                # the reference labels fallback samples quality 6 but
                # quantizes with the q5 tables (pinned vs series goldens)
                quality = 5
                quality_tag = 6
            if self.pixel_format == PixelFormat.V210:
                planes = xf.unpack_v210(buf.tobytes(), self.width, self.height,
                                        pitch=row_bytes)
            elif self.pixel_format == PixelFormat.UYVY:
                planes = xf.unpack_uyvy(buf.tobytes(), self.width, self.height)
            elif self.pixel_format == PixelFormat.CT_UCHAR:
                planes = xf.unpack_avu8(buf.tobytes(), self.width, self.height)
            elif self.pixel_format == PixelFormat.CT_10BIT_2_8:
                planes = xf.unpack_av28(buf.tobytes(), self.width, self.height)
            elif self.pixel_format == PixelFormat.CT_SHORT_2_14:
                planes = xf.unpack_a214(buf.tobytes(), self.width, self.height)
            elif self.pixel_format in (PixelFormat.CT_USHORT_10_6,
                                       PixelFormat.CT_SHORT):
                planes = xf.unpack_av16(buf.tobytes(), self.width, self.height)
            else:
                planes = xf.unpack_yu64(buf.tobytes(), self.width, self.height)
            self._sample = intra_host.encode_sample_planes(
                planes, self.width, self.height, quality,
                input_format=self._INPUT_FORMAT_CODES[self.pixel_format],
                frame_number=self._frame_number, metadata=frame_meta,
                quality_tag=quality_tag,
                fs_rate_limiter=self._fs_limiter)
        # every non-uncompressed branch reaches here: the codec state
        # (prescale table) is initialized by the first compressed frame
        self._compressed_encoded = True

    # CFHD_GetSampleData
    def get_sample_data(self) -> bytes:
        if self._sample is None:
            raise CFHDError(ErrorCode.NOT_FINISHED)
        return self._sample

    # CFHD_GetEncodeThumbnail
    def get_encode_thumbnail(self, sample: bytes):
        from cineform_tpu.models import thumbnail

        return thumbnail.extract(sample)

    # CFHD_CloseEncoder
    def close(self) -> None:
        self._prepared = False
        self._sample = None


# ---------------------------------------------------------------------------
# Decoder (CFHD_OpenDecoder .. CFHD_CloseDecoder)
# ---------------------------------------------------------------------------

class Decoder:
    """Sample decoder (`DecoderSDK/SampleDecoder.cpp:387-1936`)."""

    OUTPUT_FORMATS = (PixelFormat.YUY2, PixelFormat.UYVY, PixelFormat.YU64,
                      PixelFormat.V210, PixelFormat.RG48, PixelFormat.BGRA,
                      PixelFormat.B64A, PixelFormat.NV12, PixelFormat.R210,
                      PixelFormat.DPX0, PixelFormat.RG30,
                      PixelFormat.BYR4, PixelFormat.BYR2, PixelFormat.YUYV,
                      PixelFormat.BGRa, PixelFormat.RG24, PixelFormat.R408,
                      PixelFormat.V408, PixelFormat.WP13, PixelFormat.W13A,
                      PixelFormat.CT_SHORT, PixelFormat.CT_USHORT_10_6,
                      PixelFormat.CT_SHORT_2_14, PixelFormat.CT_10BIT_2_8,
                      PixelFormat.CT_UCHAR)

    def __init__(self) -> None:
        self._prepared = False

    # CFHD_GetOutputFormats
    def get_output_formats(self, sample: bytes | None = None) -> tuple[PixelFormat, ...]:
        return self.OUTPUT_FORMATS

    # CFHD_GetSampleInfo / CFHD_ParseSampleHeader
    def get_sample_info(self, sample: bytes) -> SampleInfo:
        from cineform_tpu.bitstream import parse_sample
        from cineform_tpu.spec import tags

        try:
            s = parse_sample(sample)
            encoded_format = EncodedFormat(max(0, s.encoded_format - 1))
        except Exception as exc:
            raise CFHDError(ErrorCode.BADSAMPLE, str(exc)) from exc
        # the reference doubles the reported dimensions for Bayer sources
        # (`ParseSampleHeader`, Codec/decoder.c:2619-2623)
        mult = 2 if s.encoded_format == 2 else 1
        return SampleInfo(
            width=s.width * mult, height=s.height * mult,
            display_height=(s.display_height or s.height) * mult,
            key_frame=(s.sample_type == tags.SAMPLE_TYPE_IFRAME),
            encoded_format=encoded_format,
            quality=s.quality, frame_number=s.frame_number)

    # CFHD_PrepareToDecode
    def prepare_to_decode(self, width: int, height: int,
                          output_format: PixelFormat = PixelFormat.YUY2,
                          resolution: DecodedResolution = DecodedResolution.FULL,
                          decoding_flags: DecodingFlags = DecodingFlags.NONE,
                          sample: bytes | None = None,
                          ) -> tuple[int, int, PixelFormat]:
        if output_format not in self.OUTPUT_FORMATS:
            raise CFHDError(ErrorCode.BADFORMAT, f"{output_format!r}")
        if sample is not None and (width == 0 or height == 0):
            # 0x0 = decode at the native coded size; explicit dimensions
            # request scaling through the Lanczos scaler
            # (`DecoderSDK/SampleDecoder.cpp:1593-1597`)
            info = self.get_sample_info(sample)
            width, height = info.width, info.height
        if resolution == DecodedResolution.HALF:
            width, height = width // 2, height // 2
        elif resolution == DecodedResolution.QUARTER:
            width, height = width // 4, height // 4
        elif resolution == DecodedResolution.THUMBNAIL:
            width, height = width // 8, height // 8
        self.width = width
        self.height = height
        self.output_format = output_format
        self.resolution = resolution
        self._prepared = True
        return width, height, output_format

    # CFHD_SetActiveMetadata(TAG_CHANNELS_ACTIVE) analog
    def set_channels_active(self, mask: int) -> None:
        """Select the video channel(s) of stereo 3D samples: 1 = left,
        2 = right (`Codec/decoder.c:10310-10340` channel_mask).

        Mask 3 (both eyes) composites the eyes per the channel blend
        mode (set_channel_blend; default stacked anamorphic like the
        reference's 3D display default)."""
        if int(mask) not in (1, 2, 3):
            raise CFHDError(
                ErrorCode.INVALID_ARGUMENT,
                f"channel mask {mask}: supported masks are 1 (left), "
                "2 (right), 3 (both eyes composited)")
        self._channels_active = int(mask)

    # CFHD_SetActiveMetadata(TAG_BLEND_TYPE) analog
    def set_channel_blend(self, mode: int) -> None:
        """3D display compositing for mask-3 decodes (`Do3DWork`,
        `Codec/bayer.c:10761`; modes `Codec/codec.h:1261-1278`):
        stacked/side-by-side anamorphic, line interleaved, onion,
        difference, freeview, anaglyph RC/AB/GM (+BW variants)."""
        self._channel_blend = int(mode)

    # --- decode dispatch tables ---------------------------------------------
    # Output-format -> fourcc per SOURCE KIND, mirroring the reference's
    # per-encoded-format converter selection (`DecoderSDK/SampleDecoder.cpp`
    # output negotiation + `Codec/decoder.c:11584` format dispatch).

    #: GOP (2-frame group) / FRAME sample deep outputs
    _GOP_FOURCC = {PixelFormat.YU64: "YU64", PixelFormat.V210: "v210",
                   PixelFormat.RG48: "RG48", PixelFormat.BGRA: "BGRA",
                   PixelFormat.B64A: "b64a", PixelFormat.R210: "r210",
                   PixelFormat.DPX0: "DPX0", PixelFormat.RG30: "RG30"}
    #: RGB 4:4:4 / RGBA 4:4:4:4 sources (Row16u reconstruction)
    _RGB_FOURCC = {PixelFormat.RG48: "RG48", PixelFormat.B64A: "b64a",
                   PixelFormat.WP13: "WP13", PixelFormat.W13A: "W13A",
                   PixelFormat.BGRA: "BGRA", PixelFormat.BGRa: "BGRa",
                   PixelFormat.RG24: "RG24"}
    #: Bayer RAW sources (DemosaicRAW chain / GenerateBYR2)
    _BAYER_FOURCC = {PixelFormat.RG48: "RG48", PixelFormat.B64A: "b64a",
                     PixelFormat.YUY2: "YUY2", PixelFormat.UYVY: "2vuy",
                     PixelFormat.BYR4: "BYR4", PixelFormat.BYR2: "BYR2",
                     PixelFormat.WP13: "WP13", PixelFormat.W13A: "W13A"}
    #: YUV 4:2:2 intra sources, every supported output
    _YUV_FOURCC = {PixelFormat.UYVY: "2vuy", PixelFormat.YU64: "YU64",
                   PixelFormat.V210: "v210", PixelFormat.RG48: "RG48",
                   PixelFormat.BGRA: "BGRA", PixelFormat.B64A: "b64a",
                   PixelFormat.NV12: "NV12", PixelFormat.R210: "r210",
                   PixelFormat.DPX0: "DPX0", PixelFormat.RG30: "RG30",
                   PixelFormat.YUYV: "yuyv", PixelFormat.BGRa: "BGRa",
                   PixelFormat.RG24: "RG24", PixelFormat.R408: "R408",
                   PixelFormat.V408: "V408", PixelFormat.WP13: "WP13",
                   PixelFormat.W13A: "W13A",
                   PixelFormat.CT_SHORT: "av16",
                   PixelFormat.CT_USHORT_10_6: "a106",
                   PixelFormat.CT_SHORT_2_14: "a214",
                   PixelFormat.CT_10BIT_2_8: "av28",
                   # accepted by PrepareToDecode but rejected at decode,
                   # matching the binary (GetFramePitch throws for avu8)
                   PixelFormat.CT_UCHAR: "avu8"}
    #: output row pitch in bytes as a function of width
    _ROW_BYTES = {
        PixelFormat.YUY2: lambda w: 2 * w,
        PixelFormat.UYVY: lambda w: 2 * w,
        PixelFormat.YU64: lambda w: 4 * w,
        PixelFormat.V210: lambda w: ((w + 47) // 48) * 128,
        PixelFormat.RG48: lambda w: 6 * w,
        PixelFormat.BGRA: lambda w: 4 * w,
        PixelFormat.B64A: lambda w: 8 * w,
        PixelFormat.NV12: lambda w: 3 * w // 2,
        PixelFormat.R210: lambda w: 4 * w,
        PixelFormat.DPX0: lambda w: 4 * w,
        PixelFormat.RG30: lambda w: 4 * w,
        PixelFormat.BYR4: lambda w: 2 * w,
        PixelFormat.BYR2: lambda w: 2 * w,
        PixelFormat.YUYV: lambda w: 2 * w,
        PixelFormat.BGRa: lambda w: 4 * w,
        PixelFormat.RG24: lambda w: 3 * w,
        PixelFormat.R408: lambda w: 4 * w,
        PixelFormat.V408: lambda w: 4 * w,
        PixelFormat.WP13: lambda w: 6 * w,
        PixelFormat.W13A: lambda w: 8 * w,
        PixelFormat.CT_SHORT: lambda w: 4 * w,
        PixelFormat.CT_USHORT_10_6: lambda w: 4 * w,
        PixelFormat.CT_SHORT_2_14: lambda w: 4 * w,
        PixelFormat.CT_10BIT_2_8: lambda w: 5 * w // 2,
        PixelFormat.CT_UCHAR: lambda w: 2 * w,
    }

    def _gop_fourcc(self, what: str) -> str:
        fourcc = self._GOP_FOURCC.get(self.output_format)
        if fourcc is None:
            raise CFHDError(ErrorCode.BADFORMAT,
                            f"{what} decode to {self.output_format!r}")
        return fourcc

    @staticmethod
    def _to_uyvy(out: bytes) -> bytes:
        a = np.frombuffer(out, np.uint8).reshape(-1, 4)
        return np.ascontiguousarray(a[:, [1, 0, 3, 2]]).tobytes()

    # --- per-sample-kind decode handlers -------------------------------------

    def _route_stereo(self, sample: bytes):
        """Stereo pre-route: returns (sample-to-decode, composite-or-None).
        For dual-channel samples selects the active eye, or composites
        both per the blend mode (`Codec/decoder.c:10086-10104` stereo
        channel logic + `Do3DWork` `Codec/bayer.c:10761`).  Parse errors
        fall through to the main dispatch (which reports them properly)."""
        from cineform_tpu.models import intra_host

        try:
            from cineform_tpu.bitstream import parse_sample
            info0 = parse_sample(sample)
            if info0.encoded_channels >= 2:
                from cineform_tpu.models import stereo
                eyes = stereo.split_3d(sample)
                mask = getattr(self, "_channels_active", 1)
                if mask == 3 and len(eyes) > 1:
                    if self.output_format not in (PixelFormat.YUY2,
                                                  PixelFormat.BGRA):
                        raise CFHDError(
                            ErrorCode.BADFORMAT,
                            "3D composite decode outputs YUY2 (geometric "
                            "modes) or BGRA (anaglyph modes)")
                    blend = getattr(self, "_channel_blend",
                                    stereo.BLEND_STACKED_ANAMORPHIC)
                    l, _ = intra_host.decode_sample(eyes[0])
                    r, _ = intra_host.decode_sample(eyes[1], frame_index=1)
                    out, fmt = stereo.blend_eyes(l, r, info0.width,
                                                 info0.height, blend)
                    want = ("BGRA" if self.output_format == PixelFormat.BGRA
                            else "YUY2")
                    if fmt != want:
                        raise CFHDError(
                            ErrorCode.BADFORMAT,
                            f"blend mode {blend} produces {fmt}; prepare "
                            f"with that output format")
                    return sample, np.frombuffer(out, np.uint8)
                sample = eyes[1] if mask == 2 and len(eyes) > 1 else eyes[0]
            return sample, None
        except CFHDError:
            raise
        except Exception:
            return sample, None

    def _decode_frame_sample(self, sample: bytes):
        """24-byte SAMPLE_TYPE_FRAME sample: emit the TRUE second frame of
        the group this decoder holds (`DecodeSampleFrame` ->
        ReconstructSampleFrameToBuffer(frame_index=1),
        decoder.c:11482/11546) -- byte-exact vs the reference stream
        decode incl. the second dither window.  Returns (held, out)."""
        from cineform_tpu.bitstream import parse_sample
        from cineform_tpu.models import gop_host

        held = getattr(self, "_held_group", None)
        if held is None:
            raise CFHDError(ErrorCode.BADSAMPLE,
                            "FRAME sample without a decoded group")
        if (self.width, self.height) != \
                (parse_sample(held).width, parse_sample(held).height):
            out = self._decode_to_size(held, self.width, self.height, frame=1)
        elif self.output_format in (PixelFormat.YUY2, PixelFormat.UYVY):
            # the rand() dither stream persists across samples in one
            # decoder instance: this frame takes the NEXT window after
            # everything already emitted
            base = getattr(self, "_gop_dither_count", 1) - 1
            self._gop_dither_count = base + 2
            out = gop_host.decode_group(held, reference_compatible=False,
                                        dither_base=base)[1]
            if self.output_format == PixelFormat.UYVY:
                out = self._to_uyvy(out)
        else:
            out = gop_host.decode_group_to(
                held, self._gop_fourcc("FRAME sample"), frame=1)
        return held, out

    def _decode_group(self, sample: bytes, info0):
        """GROUP (2-frame GOP) sample: decode frame 1 and hold the group
        for a following SAMPLE_TYPE_FRAME sample; consecutive calls on the
        same group return frame 1 then frame 1-with-advanced-dither, like
        the reference decoder's repeated-call behavior."""
        import hashlib

        from cineform_tpu.models import gop_host

        self._held_group = sample
        if self.resolution != DecodedResolution.FULL:
            raise CFHDError(ErrorCode.BADFORMAT,
                            "scaled GOP decode is not supported")
        if info0 is not None and (self.width, self.height) != \
                (info0.width, info0.height):
            # arbitrary-size GOP decode: Lanczos-scale each frame,
            # alternating frame 1/2 like the unscaled GOP path
            key = hashlib.sha256(sample).digest()
            cache = getattr(self, "_gop_scale_cache", None)
            idx = cache[1] if cache is not None and cache[0] == key else 0
            self._gop_scale_cache = (key, 1 - idx)
            return self._decode_to_size(sample, self.width, self.height,
                                        frame=idx)
        if self.output_format in (PixelFormat.YUY2, PixelFormat.UYVY):
            # every group decode emits frame 1 with the NEXT rand() dither
            # window: repeated calls on the same group therefore return
            # frame 1 then frame 1 with advanced dither, exactly like the
            # reference binary
            base = getattr(self, "_gop_dither_count", 0)
            self._gop_dither_count = base + 1
            out = gop_host.decode_group(sample, dither_base=base)[0]
            if self.output_format == PixelFormat.UYVY:
                out = self._to_uyvy(out)
            return out
        return gop_host.decode_group_to(sample, self._gop_fourcc("GOP"))

    def _decode_rgb_source(self, sample: bytes):
        """RGB 4:4:4 / RGBA 4:4:4:4 sources: byte-exact Row16u
        reconstruction with the per-writer saturation semantics and the
        alpha decompand (intra_host.decode_sample_rgb)."""
        from cineform_tpu.models import intra_host

        fourcc = self._RGB_FOURCC.get(self.output_format)
        if fourcc is None:
            raise CFHDError(
                ErrorCode.BADFORMAT,
                f"RGB-source decode to {self.output_format!r} "
                f"(RG48/b64a/WP13/W13A/BGRA/BGRa/RG24 outputs)")
        out, _ = intra_host.decode_sample_rgb(sample, fourcc)
        return out

    def _decode_bayer_source(self, sample: bytes):
        """Full-mosaic-resolution RAW decode (byte-exact DemosaicRAW chain
        / GenerateBYR2, `Codec/bayer.c:9339/13237`); the sample header
        reports mosaic-half channel dims."""
        from cineform_tpu.models import intra_host

        fourcc = self._BAYER_FOURCC.get(self.output_format)
        if fourcc is None:
            raise CFHDError(
                ErrorCode.BADFORMAT,
                f"Bayer decode to {self.output_format!r} (RG48, b64a, "
                f"YUY2, 2vuy, BYR4, BYR2, WP13, W13A)")
        return intra_host.decode_sample_bayer_to(sample, fourcc)

    def _decode_yuv_source(self, sample: bytes, info0):
        """YUV 4:2:2 intra sample at coded size: the device path for
        YUY2/UYVY when available, else the host path per output format."""
        from cineform_tpu.models import intra_host

        if self.output_format in (PixelFormat.YUY2, PixelFormat.UYVY):
            dev_out = self._decode_device(sample, info0)
            if dev_out is not None:
                return dev_out
        if self.output_format == PixelFormat.YUY2:
            out, _ = intra_host.decode_sample(sample)
            return out
        return intra_host.decode_sample_to(
            sample, self._YUV_FOURCC[self.output_format])

    # CFHD_DecodeSample
    def decode_sample(self, sample: bytes) -> np.ndarray:
        from cineform_tpu.models import intra_host

        if not self._prepared:
            raise CFHDError(ErrorCode.UNEXPECTED, "not prepared")
        if len(sample) % 4:
            # the tag/value stream is a sequence of 32-bit pairs; a
            # partial trailing pair is a bitstream error (the reference
            # rejects such samples; whole trailing garbage words parse as
            # unknown optional tags and are ignored — pinned by
            # tools/diff_fuzz.py against the binary)
            raise CFHDError(ErrorCode.BADSAMPLE,
                            f"sample size {len(sample)} not 32-bit aligned")
        sample, composite = self._route_stereo(sample)
        if composite is not None:
            return composite
        try:
            from cineform_tpu.bitstream import parse_sample
            try:
                info0 = parse_sample(sample)
            except Exception:
                info0 = None
            if len(sample) >= 4 and sample[:4] == b"\x00\x01\x00\x07":
                # video sequence header: ignored by the decoder, no frame
                # (`DecodeSample` SAMPLE_TYPE_SEQUENCE_HEADER,
                # decoder.c:11023-11026)
                return None
            warp_sample = sample
            if len(sample) >= 4 and sample[:4] == b"\x00\x01\x00\x01":
                warp_sample, out = self._decode_frame_sample(sample)
                # FRAME samples carry no pixel data; the held group's
                # pitch and warp metadata apply
                out = self._maybe_warp(warp_sample, out)
                row_bytes = len(out) // self.height
                return np.frombuffer(out, dtype=np.uint8).reshape(
                    self.height, row_bytes)
            if parse_sample(sample).sample_type == 2:
                out = self._decode_group(sample, info0)
            elif self.resolution != DecodedResolution.FULL:
                out = intra_host.decode_sample_scaled(
                    sample, int(self.resolution))
            elif info0 is not None and \
                    getattr(info0, "encoded_format", 0) in (3, 4):
                out = self._decode_rgb_source(sample)
            elif info0 is not None and \
                    getattr(info0, "encoded_format", 0) == 2:
                out = self._decode_bayer_source(sample)
            elif info0 is not None and (self.width, self.height) != \
                    (info0.width, info0.height):
                # decoded size != requested size: scale with the Lanczos
                # scaler like the reference's ConvertLib path
                # (`DecoderSDK/SampleDecoder.cpp:1669-1725`)
                out = self._decode_to_size(sample, self.width, self.height)
            else:
                out = self._decode_yuv_source(sample, info0)
            row_bytes = self._ROW_BYTES[self.output_format](self.width)
            if len(out) != self.height * row_bytes:
                raise CFHDError(
                    ErrorCode.BADSAMPLE,
                    f"decoded {len(out)} bytes, expected "
                    f"{self.height * row_bytes}")
            out = self._maybe_warp(sample, out)
            return np.frombuffer(out, dtype=np.uint8).reshape(
                self.height, row_bytes)
        except CFHDError:
            raise
        except Exception as exc:
            raise CFHDError(ErrorCode.BADSAMPLE, str(exc)) from exc


    def _maybe_warp(self, sample: bytes, out: bytes) -> bytes:
        """Lens-correction stage: when the sample's metadata requests a
        mesh warp (LSPH/LGPR/LFIL + framing offsets), run the
        reference's WarpFrame pipeline on the final output buffer
        (`Codec/decoder.c:11140`, `models/lens.py`).  Byte-exact vs the
        binary for the lensFill=0 path."""
        fourcc = {PixelFormat.YUY2: "YUY2", PixelFormat.BGRA: "BGRA",
                  PixelFormat.W13A: "W13A", PixelFormat.WP13: "WP13",
                  PixelFormat.RG48: "RG48",
                  PixelFormat.B64A: "b64a"}.get(self.output_format)
        if fourcc is None:
            return out
        from cineform_tpu.models import lens

        params = lens.parse_lens_metadata(sample)
        if params is None:
            return out
        if not hasattr(self, "_warp_mesh_cache"):
            self._warp_mesh_cache = {}
        if fourcc in ("YUY2", "WP13"):
            # the reference's doMesh WP13-local-buffer detour, byte-exact
            return lens.warp_decode(params, sample, self.width,
                                    self.height, fourcc,
                                    self._warp_mesh_cache)
        # remaining formats: warp the direct output in its own space
        # (the reference converts WP13->output via ProcessLine3D with
        # video-safe levels; documented deviation until those
        # ConvertLinesToOutput branches are pinned)
        warped = lens.warp_output(params, out, self.width, self.height,
                                  fourcc, self._warp_mesh_cache)
        return warped.tobytes()

    def _decode_device(self, sample: bytes, info) -> bytes | None:
        """Route the sync full-res decode through the device codec: band
        entropy decode + inverse DWT + dither + packing in one traced
        program (the TPU re-expression of
        `DecoderSDK/SampleDecoder.cpp:1384` -> `Codec/decoder.c:10078`).
        Byte-identical to the host path; None -> host fallback."""
        if not _use_device() or info is None:
            return None
        try:
            from cineform_tpu.spec import tags
            if info.sample_type != tags.SAMPLE_TYPE_IFRAME or \
                    not (1 <= info.quality <= 6):
                return None
            codec = _device_codec(info.width, info.height,
                                  int(info.quality), "YUY2")
            out = codec.decode_batch_device([sample])[0]
            raw = out.tobytes()
            if self.output_format == PixelFormat.UYVY:
                a = np.frombuffer(raw, np.uint8).reshape(-1, 4)
                raw = np.ascontiguousarray(a[:, [1, 0, 3, 2]]).tobytes()
            return raw
        except Exception:
            return None

    def _decode_to_size(self, sample: bytes, out_w: int,
                        out_h: int, frame: int = 0) -> bytes:
        """Decode then Lanczos-scale to the requested size.

        The reference's arbitrary-scaling path (`ScaleToOutputBuffer`,
        `DecoderSDK/Conversion.cpp:455` -> `CLanczosScaler`,
        `ConvertLib/ImageScaler.cpp`) decodes to a deep intermediate and
        resamples with 8.8 fixed-point Lanczos-3 taps.  This decodes the
        byte-exact YU64 reconstruction and applies the pinned scaler
        model (`cineform_tpu.ref.scaler`, byte-exact vs the compiled
        reference for the b64a output it supports; the same engine packs
        every other format).  Note the release gates this path off with
        `#define _SCALING 0` (SampleDecoder.cpp:77)."""
        from cineform_tpu.bitstream import parse_sample
        from cineform_tpu.models import gop_host, intra_host
        from cineform_tpu.ref import scaler as rscaler

        info = parse_sample(sample)
        fourcc = {PixelFormat.YUY2: "YUY2", PixelFormat.UYVY: "2vuy",
                  PixelFormat.YU64: "YU64", PixelFormat.V210: "v210",
                  PixelFormat.RG48: "RG48", PixelFormat.BGRA: "BGRA",
                  PixelFormat.B64A: "b64a", PixelFormat.R210: "r210",
                  PixelFormat.DPX0: "DPX0", PixelFormat.RG30: "RG30",
                  }.get(self.output_format)
        if fourcc is None:
            raise CFHDError(
                ErrorCode.BADFORMAT,
                f"scaled decode to {self.output_format!r}")
        if info.sample_type == 2:
            yu64 = gop_host.decode_group_to(sample, "YU64", frame=frame)
        else:
            yu64 = intra_host.decode_sample_to(sample, "YU64")
        return rscaler.scale_yu64_to(yu64, info.width, info.height,
                                     out_w, out_h, fourcc)

    # CFHD_CloseDecoder
    def close(self) -> None:
        self._prepared = False


# --- C-style aliases (1:1 with the reference entry points) -------------------

def CFHD_OpenEncoder() -> Encoder:
    return Encoder()


def CFHD_OpenDecoder() -> Decoder:
    return Decoder()


def CFHD_CreateEncoderPool(thread_count: int, queue_length: int):
    from cineform_tpu.pool import EncoderPool

    return EncoderPool(thread_count, queue_length)


class StereoEncoder:
    """Dual-channel stereoscopic 3D encoder: both eyes in ONE sample.

    The reference encodes 3D by looping EncodeSample over the video
    channels, appending each eye's bitstream 16-byte-aligned into one
    sample with ENCODED_CHANNELS/ENCODED_CHANNEL_NUMBER header tags and a
    VCHN metadata tuple (`Codec/encoder.c:3407-3438`, `7548-7556`).
    Byte-exact vs the reference encoder (tests/test_stereo.py).
    """

    def __init__(self) -> None:
        self._prepared = False
        self._frame_number = 0
        self._metadata = None
        self._sample: bytes | None = None

    def prepare_to_encode(self, width: int, height: int,
                          pixel_format: PixelFormat,
                          encoded_format: EncodedFormat = EncodedFormat.YUV_422,
                          quality: EncodingQuality = EncodingQuality.FILMSCAN1,
                          ) -> None:
        if pixel_format != PixelFormat.YUY2 or \
                encoded_format != EncodedFormat.YUV_422:
            raise CFHDError(ErrorCode.BADFORMAT,
                            "stereo 3D supports YUY2 4:2:2")
        probe = Encoder()
        probe.prepare_to_encode(width, height, pixel_format, encoded_format,
                                EncodingFlags.NONE, quality)
        self.width, self.height = width, height
        self.quality = probe.quality
        self._prepared = True

    def attach_metadata(self, metadata) -> None:
        self._metadata = metadata

    def encode_sample(self, left: bytes | np.ndarray,
                      right: bytes | np.ndarray) -> bytes:
        """Encode one stereo pair into a single dual-channel sample."""
        from cineform_tpu.models import stereo

        if not self._prepared:
            raise CFHDError(ErrorCode.ENCODING_NOT_STARTED)
        to_bytes = (lambda f: np.ascontiguousarray(f).tobytes()
                    if isinstance(f, np.ndarray) else bytes(f))
        self._frame_number += 1
        self._sample = stereo.encode_sample_3d(
            to_bytes(left), to_bytes(right), self.width, self.height,
            int(self.quality), self._frame_number, self._metadata)
        return self._sample

    def get_sample_data(self) -> bytes:
        if self._sample is None:
            raise CFHDError(ErrorCode.NOT_FINISHED)
        return self._sample

    def close(self) -> None:
        self._prepared = False
        self._sample = None
