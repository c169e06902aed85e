"""Minimal PNG reader for logo/watermark overlays (`Codec/draw.c` loads
PNG tool images; this covers non-interlaced 8-bit RGB/RGBA/greyscale,
which is what watermark assets use).  Pure stdlib (zlib)."""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"


def read_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an (H, W, 4) uint8 RGBA array."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = bitdepth = color = interlace = None
    palette = None
    trns = None
    while pos < len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, bitdepth, color, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(chunk, np.uint8)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if bitdepth != 8:
        raise ValueError(f"unsupported bit depth {bitdepth}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    raw = zlib.decompress(idat)
    stride = w * nch
    img = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for row in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += 1 + stride
        if ft == 0:
            cur = line
        elif ft == 2:                      # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.empty(stride, np.int32)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                if ft == 1:                # Sub
                    cur[i] = (line[i] + a) & 0xFF
                elif ft == 3:              # Average
                    cur[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ft == 4:              # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    cur[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"bad filter {ft}")
        img[row] = cur.astype(np.uint8)
        prev = cur
    px = img.reshape(h, w, nch)
    out = np.empty((h, w, 4), np.uint8)
    if color == 6:
        out[:] = px
    elif color == 2:
        out[..., :3] = px
        out[..., 3] = 255
    elif color == 0:
        out[..., :3] = px
        out[..., 3] = 255
    elif color == 4:
        out[..., 0] = out[..., 1] = out[..., 2] = px[..., 0]
        out[..., 3] = px[..., 1]
    elif color == 3:
        rgb = palette[px[..., 0]]
        out[..., :3] = rgb
        out[..., 3] = 255
        if trns is not None:
            out[..., 3] = np.where(px[..., 0] < len(trns),
                                   trns[np.minimum(px[..., 0],
                                                   len(trns) - 1)], 255)
    return out
