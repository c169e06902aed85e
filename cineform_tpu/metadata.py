"""CFHD metadata engine: tag database + encoder attach / decoder read APIs.

Mirrors the reference metadata system (`Common/CFHDMetadataTags.h`,
`Codec/metadata.c`, `EncoderSDK/MetadataWriter.cpp`,
`DecoderSDK/CFHDMetadata.cpp`):

- tuples of FOURCC tag + 1-char type + 24-bit size + payload, padded to
  4 bytes (`CFHDMetadataTags.h:79-85`);
- attached to samples as CODEC_TAG_METADATA chunks (`codec.h:408`);
- decoder-side iteration/lookup (CFHD_ReadMetadataFromSample /
  CFHD_FindMetadata, `DecoderSDK/CFHDMetadata.cpp:640,1057`).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


def fourcc(s: str) -> int:
    b = s.encode()
    return (b[0] << 24) | (b[1] << 16) | (b[2] << 8) | b[3]


class Tag:
    """Common metadata tags (`Common/CFHDMetadataTags.h:182+`)."""

    GUID = "GUID"           # unique clip id
    DATE = "DATE"           # encode date
    TIME = "TIME"           # encode time of day
    TIMECODE = "TIMC"       # timecode
    UNIQUE_FRAME = "UFRM"   # frame counter
    FREESPACE = "FREE"      # reserved space
    WHITE_BALANCE = "WBAL"  # RGB gains
    COLOR_MATRIX = "COLM"   # 3x4 color matrix
    LOOK_FILE = "LOOK"      # LOOK file name
    LOOK_CRC = "LCRC"       # LOOK file CRC
    GAMMA_TWEAKS = "GAMT"   # gamma adjustments
    SATURATION = "SATU"
    EXPOSURE = "EXPO"
    RGB_OFFSET = "RGBO"
    DEMOSAIC_TYPE = "DMSC"
    ENCODE_CURVE = "ENCV"
    DECODE_CURVE = "DECV"
    BAYER_FORMAT = "BFMT"
    CAMERA_NAME = "CAMN"
    REEL_NAME = "REEL"
    SHOT_NAME = "SHOT"


# metadata value types (`CFHDMetadataTags.h` METADATA_TYPE_*)
TYPE_STRING = b"c"
TYPE_GUID = b"G"
TYPE_ULONG = b"L"
TYPE_FLOAT = b"f"
TYPE_HIDDEN = b"H"
TYPE_TAG = b"T"


@dataclass
class MetadataItem:
    tag: str
    typ: bytes
    payload: bytes

    @property
    def value(self):
        if self.typ == TYPE_STRING:
            return self.payload.rstrip(b"\0").decode("latin1")
        if self.typ == TYPE_ULONG:
            return int.from_bytes(self.payload[:4], "little")
        if self.typ == TYPE_FLOAT:
            n = len(self.payload) // 4
            vals = struct.unpack(f"<{n}f", self.payload[:4 * n])
            return vals[0] if n == 1 else vals
        return self.payload


def _tuple_bytes(tag: str, typ: bytes, payload: bytes) -> bytes:
    size = len(payload)
    pad = (-size) % 4
    return (tag.encode("latin1") + bytes([size & 0xFF, (size >> 8) & 0xFF,
                                          (size >> 16) & 0xFF]) + typ
            + payload + b"\0" * pad)


class Metadata:
    """CFHD_MetadataOpen/MetadataAdd equivalent: an ordered tuple block."""

    def __init__(self) -> None:
        self.items: list[MetadataItem] = []

    # CFHD_MetadataAdd
    def add(self, tag: str, value, typ: bytes | None = None) -> "Metadata":
        if isinstance(value, str):
            payload, typ = value.encode("latin1"), typ or TYPE_STRING
        elif isinstance(value, (bytes, bytearray)):
            payload, typ = bytes(value), typ or TYPE_GUID
        elif isinstance(value, int):
            payload, typ = value.to_bytes(4, "little"), typ or TYPE_ULONG
        elif isinstance(value, float):
            payload, typ = struct.pack("<f", value), typ or TYPE_FLOAT
        elif isinstance(value, (list, tuple)):
            payload = struct.pack(f"<{len(value)}f", *value)
            typ = typ or TYPE_FLOAT
        else:
            raise TypeError(type(value))
        self.items.append(MetadataItem(tag, typ, payload))
        return self

    def block(self) -> bytes:
        return b"".join(_tuple_bytes(i.tag, i.typ, i.payload)
                        for i in self.items)

    @staticmethod
    def parse_block(blob: bytes) -> list[MetadataItem]:
        items = []
        pos = 0
        while pos + 8 <= len(blob):
            tag = blob[pos:pos + 4].decode("latin1")
            size = int.from_bytes(blob[pos + 4:pos + 7], "little")
            typ = blob[pos + 7:pos + 8]
            payload = blob[pos + 8:pos + 8 + size]
            items.append(MetadataItem(tag, typ, payload))
            pos += 8 + size + ((-size) % 4)
        return items


# ---------------------------------------------------------------------------
# Decoder-side metadata API (CFHD_OpenMetadata/ReadMetadata/FindMetadata)
# ---------------------------------------------------------------------------

def read_metadata(sample: bytes) -> list[MetadataItem]:
    """All metadata tuples from every METADATA chunk in a sample
    (CFHD_ReadMetadataFromSample, `DecoderSDK/CFHDMetadata.cpp:640`)."""
    from cineform_tpu.bitstream import parse_sample

    items: list[MetadataItem] = []
    for blob in parse_sample(sample).metadata:
        items.extend(Metadata.parse_block(blob))
    return items


def find_metadata(sample: bytes, tag: str) -> MetadataItem | None:
    """CFHD_FindMetadata (`DecoderSDK/CFHDMetadata.cpp:1057`)."""
    for item in read_metadata(sample):
        if item.tag == tag:
            return item
    return None
