"""DPX file I/O (SMPTE 268M) for 10-bit filled RGB — the ConvertLib
`DPXConverter.cpp` analog plus the file-header layer the reference's
tools expect.

The pixel packing is the DPX0 layout already used by the codec's
thumbnail/encode paths: big-endian 32-bit words, (r << 22) | (g << 12)
| (b << 2) with 10-bit components (`Codec/frame.c:7002`).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC_BE = 0x53445058        # 'SDPX'
_MAGIC_LE = 0x58504453        # 'XPDS'
_HEADER_SIZE = 8192


def pack_dpx0(rgb10: np.ndarray) -> np.ndarray:
    """(H, W, 3) 10-bit components -> (H, W) big-endian DPX0 words."""
    r = rgb10[..., 0].astype(np.uint32)
    g = rgb10[..., 1].astype(np.uint32)
    b = rgb10[..., 2].astype(np.uint32)
    return ((r << 22) | (g << 12) | (b << 2)).astype(">u4")


def unpack_dpx0(words: np.ndarray) -> np.ndarray:
    """(H, W) DPX0 words (native order already applied) -> (H, W, 3)."""
    w = words.astype(np.uint32)
    return np.stack([(w >> 22) & 0x3FF, (w >> 12) & 0x3FF,
                     (w >> 2) & 0x3FF], axis=-1).astype(np.uint16)


def write_dpx(path: str, rgb10: np.ndarray,
              descriptor: int = 50, transfer: int = 1) -> None:
    """Write a minimal-but-valid V2.0 DPX file: one RGB image element,
    10-bit filled method A, big-endian."""
    h, w = rgb10.shape[:2]
    data = pack_dpx0(rgb10).tobytes()
    total = _HEADER_SIZE + len(data)

    hdr = bytearray(_HEADER_SIZE)
    struct.pack_into(">I", hdr, 0, _MAGIC_BE)
    struct.pack_into(">I", hdr, 4, _HEADER_SIZE)          # image data offset
    hdr[8:16] = b"V2.0\0\0\0\0"
    struct.pack_into(">I", hdr, 16, total)                # total file size
    struct.pack_into(">I", hdr, 20, 1)                    # ditto key
    struct.pack_into(">I", hdr, 24, 768 + 640 + 256)      # generic size
    struct.pack_into(">I", hdr, 28, 256 + 128)            # industry size
    struct.pack_into(">I", hdr, 32, 0)                    # user size
    hdr[36:36 + 32] = b"cineform-tpu".ljust(32, b"\0")    # file name
    # image information header at offset 768
    struct.pack_into(">H", hdr, 768, 0)                   # orientation
    struct.pack_into(">H", hdr, 770, 1)                   # element count
    struct.pack_into(">I", hdr, 772, w)
    struct.pack_into(">I", hdr, 776, h)
    # image element 0 at 780
    struct.pack_into(">I", hdr, 780, 0)                   # data sign
    struct.pack_into(">I", hdr, 784, 0)                   # low data
    struct.pack_into(">f", hdr, 788, 0.0)
    struct.pack_into(">I", hdr, 792, 1023)                # high data
    struct.pack_into(">f", hdr, 796, 1023.0)
    hdr[800] = descriptor                                 # 50 = RGB
    hdr[801] = transfer
    hdr[802] = transfer                                   # colorimetric
    hdr[803] = 10                                         # bit depth
    struct.pack_into(">H", hdr, 804, 1)                   # packing: filled A
    struct.pack_into(">H", hdr, 806, 0)                   # encoding: none
    struct.pack_into(">I", hdr, 808, _HEADER_SIZE)        # data offset
    struct.pack_into(">I", hdr, 812, 0)                   # end-of-line pad
    struct.pack_into(">I", hdr, 816, 0)                   # end-of-image pad

    with open(path, "wb") as f:
        f.write(bytes(hdr))
        f.write(data)


def read_dpx(path: str) -> np.ndarray:
    """Read a 10-bit filled RGB DPX file -> (H, W, 3) uint16 components.
    Handles both byte orders."""
    with open(path, "rb") as f:
        buf = f.read()
    magic = struct.unpack_from(">I", buf, 0)[0]
    if magic == _MAGIC_BE:
        e = ">"
    elif struct.unpack_from("<I", buf, 0)[0] == _MAGIC_BE:
        e = "<"
    else:
        raise ValueError("not a DPX file")
    offset = struct.unpack_from(e + "I", buf, 4)[0]
    w = struct.unpack_from(e + "I", buf, 772)[0]
    h = struct.unpack_from(e + "I", buf, 776)[0]
    depth = buf[803]
    if depth != 10:
        raise ValueError(f"only 10-bit filled DPX supported, got {depth}")
    words = np.frombuffer(buf, dtype=e + "u4", count=h * w,
                          offset=offset).reshape(h, w)
    return unpack_dpx0(words)
