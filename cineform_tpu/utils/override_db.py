"""Encoder override database: disk .colr blocks + metadata-tag overrides.

The reference encoder re-reads two metadata blocks from disk around every
EncodeSample and lets their tags (and the attached metadata block) change
encoder behavior (`Codec/encoder.c:8792` OverrideEncoderSettings,
`encoder.c:9044` UpdateEncoderOverrides, call order `encoder.c:2070-2078`):

  1. the attached (local) metadata block,
  2. ``<LUTPath>/<DBPath>/defaults.colr``  (base data),
  3. ``<OverridePath>/override.colr``      (force data, highest priority).

On Linux the paths are fixed (`Codec/lutpath.h:39-41`):
OverridePath=/var/cineform/public, LUTPath=/var/cineform/public/LUTs,
DBPath=db; the user-prefs file parse is a stub (`lutpath.cpp:743-751`).
CINEFORM_OVERRIDE_PATH / CINEFORM_LUT_PATH / CINEFORM_DB_PATH override
them here (tests point them at temp dirs).

Hidden ('H') tuples drive the encoder but are stripped from the metadata
written into samples (`encoder.c:8906` RemoveHiddenMetadata) — confirmed
against the reference binary: an override.colr with LYUV=1 changes the
encoded pixel data while the sample's metadata chunks stay identical.
"""

from __future__ import annotations

import os
import struct

METADATA_TYPE_HIDDEN = ord("H")

# tags handled by UpdateEncoderOverrides (`Codec/encoder.c:9056-9094`)
OVERRIDE_TAGS = {
    "LYUV": "limit_yuv",          # full-range 0-255 -> 16-235 (10-bit)
    "CV67": "conv_601_709",       # Canon DSLR 601 -> 709 fix
    "CLSY": "colorspace_yuv",     # 1 = 601, 2 = 709
    "ECRV": "encode_curve",
    "PCRV": "encode_curve_preset",
    "BFMT": "bayer_format",
    "VDCH": "video_channels",
    "VDCG": "video_channel_gap",
    "IGND": "ignore_database",
}


def default_paths() -> tuple[str, str, str]:
    """(override_path, luts_path, db_path) per the reference's Linux
    defaults, overridable via environment for tests."""
    return (os.environ.get("CINEFORM_OVERRIDE_PATH", "/var/cineform/public"),
            os.environ.get("CINEFORM_LUT_PATH", "/var/cineform/public/LUTs"),
            os.environ.get("CINEFORM_DB_PATH", "db"))


def load_disk_blocks() -> tuple[bytes, bytes]:
    """(base defaults.colr, force override.colr) metadata blocks; empty
    bytes when absent (`encoder.c:8820-8884`)."""
    override_path, luts_path, db_path = default_paths()
    out = []
    for path in (os.path.join(luts_path, db_path, "defaults.colr"),
                 os.path.join(override_path, "override.colr")):
        try:
            with open(path, "rb") as f:
                out.append(f.read())
        except OSError:
            out.append(b"")
    return out[0], out[1]


def iter_tuples(block: bytes):
    """Yield (tag fourcc bytes, type, payload) from a metadata block
    (`encoder.c:9052-9095` walk: entries padded to 4 bytes)."""
    pos = 0
    n = len(block)
    while pos + 8 <= n:
        tag = block[pos:pos + 4]
        if tag == b"\0\0\0\0":
            return
        size = (block[pos + 4] | (block[pos + 5] << 8)
                | (block[pos + 6] << 16))
        typ = block[pos + 7]
        payload = block[pos + 8:pos + 8 + size]
        yield tag, typ, payload
        pos += (8 + size + 3) & ~3


def parse_overrides(*blocks: bytes) -> dict[str, int]:
    """Apply blocks in priority order (later wins) and return the
    recognized override fields as a dict."""
    out: dict[str, int] = {}
    for block in blocks:
        if not block:
            continue
        for tag, typ, payload in iter_tuples(block):
            name = OVERRIDE_TAGS.get(tag.decode("latin1"))
            if name and len(payload) >= 4:
                out[name] = struct.unpack("<I", payload[:4])[0]
            if tag == b"PRXY":    # TAG_PROXY_COPY: do not apply twice
                out["limit_yuv"] = 0
                out["conv_601_709"] = 0
    return out


def remove_hidden(block: bytes) -> bytes:
    """Strip METADATA_TYPE_HIDDEN tuples (`encoder.c:8906`)."""
    out = bytearray()
    pos = 0
    n = len(block)
    while pos + 8 <= n:
        size = (block[pos + 4] | (block[pos + 5] << 8)
                | (block[pos + 6] << 16))
        typ = block[pos + 7]
        entry = (8 + size + 3) & ~3
        if typ != METADATA_TYPE_HIDDEN:
            out += block[pos:pos + entry]
        pos += entry
    out += block[pos:]
    return bytes(out)


def limit_convert_yuy2(yuy2: "np.ndarray", limit_yuv: int,
                       conv_601_709: int):
    """The encoder's LYUV/CV67 input transform for 8-bit YUY2 rows ->
    10-bit Y, V, U planes (`Codec/convert.c:4668-5290`, shift == 2).

    Replicates the SSE2 main loop's arithmetic (per-term mulhi floors and
    saturating adds, NOT the scalar tail's combined-then-shift rounding):
    limit: y' = (55*y)>>4 + 64, c' = (56*c)>>4 + 64; the 601->709 matrix
    then floors each product separately (`_mm_mulhi_epi16`), with the
    chroma path keeping 3 extra fraction bits ((c*56)>>1 - 3584).  Rows
    are a whole number of 16-byte groups for any width % 8 == 0, so the
    SSE loop covers every pixel.  Returns int32 (y, v, u) planes shaped
    like the normal <<2 unpack.  Byte-exact vs the reference encoder with
    override.colr LYUV/CV67 set (tests/test_overrides.py).
    """
    import numpy as np

    a = yuy2.reshape(yuy2.shape[0], -1, 4).astype(np.int32)
    y1, u8, y2, v8 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]

    def mulhi(x, c):
        return (x * c) >> 16

    def clamp10(x):
        return np.clip(x, 0, 1023)

    if limit_yuv:
        y1 = ((y1 * 55) >> 4) + 64
        y2 = ((y2 * 55) >> 4) + 64
        if conv_601_709:
            # luma terms use the 10-bit limited chroma
            u10 = ((u8 * 56) >> 4) + 64 - 512
            v10 = ((v8 * 56) >> 4) + 64 - 512
            y1 = clamp10(y1 - mulhi(v10, 212 << 6) - mulhi(u10, 118 << 6))
            y2 = clamp10(y2 - mulhi(v10, 212 << 6) - mulhi(u10, 118 << 6))
            # chroma terms keep 3 extra fraction bits
            u13 = ((u8 * 56) >> 1) - 3584
            v13 = ((v8 * 56) >> 1) - 3584
            u = clamp10(mulhi(u13, 1043 << 3) + mulhi(v13, 116 << 3) + 512)
            v = clamp10(mulhi(v13, 1049 << 3) + mulhi(u13, 76 << 3) + 512)
        else:
            u = ((u8 * 56) >> 4) + 64
            v = ((v8 * 56) >> 4) + 64
    elif conv_601_709:
        y1 = y1 << 2
        y2 = y2 << 2
        uc = (u8 << 2) - 512
        vc = (v8 << 2) - 512
        y1 = clamp10(y1 - mulhi(vc, 212 << 6) - mulhi(uc, 118 << 6))
        y2 = clamp10(y2 - mulhi(vc, 212 << 6) - mulhi(uc, 118 << 6))
        u = clamp10(mulhi(uc << 3, 1043 << 3) + mulhi(vc << 3, 116 << 3)
                    + 512)
        v = clamp10(mulhi(vc << 3, 1049 << 3) + mulhi(uc << 3, 76 << 3)
                    + 512)
    else:
        y1, y2, u, v = y1 << 2, y2 << 2, u8 << 2, v8 << 2
    h, w2 = y1.shape
    y = np.empty((h, 2 * w2), np.int32)
    y[:, 0::2] = y1
    y[:, 1::2] = y2
    return y, v, u
