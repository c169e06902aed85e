"""Band dump files: the `Codec/bandfile.c` analog.

The reference can dump decoded wavelet bands to a .band file for kernel
debugging (bandfile.c:  header + per-band records).  This implements a
compact npz-free binary format: magic, then records of
(channel, wavelet, band, height, width, int16 data), so band planes from
host, JAX and reference runs can be diffed offline.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"CFBD"


def write_bandfile(path: str, bands: list[tuple[int, int, int, np.ndarray]]) -> None:
    """bands: [(channel, wavelet_index, band_index, plane int16)]."""
    with open(path, "wb") as f:
        f.write(_MAGIC + struct.pack("<I", len(bands)))
        for ch, wl, bd, plane in bands:
            plane = np.ascontiguousarray(plane, dtype="<i2")
            h, w = plane.shape
            f.write(struct.pack("<4H", ch, wl, bd, 0))
            f.write(struct.pack("<II", h, w))
            f.write(plane.tobytes())


def read_bandfile(path: str) -> list[tuple[int, int, int, np.ndarray]]:
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != _MAGIC:
        raise ValueError("not a band file")
    n = struct.unpack_from("<I", buf, 4)[0]
    off = 8
    out = []
    for _ in range(n):
        ch, wl, bd, _ = struct.unpack_from("<4H", buf, off)
        h, w = struct.unpack_from("<II", buf, off + 8)
        off += 16
        plane = np.frombuffer(buf, "<i2", count=h * w, offset=off).reshape(h, w)
        off += h * w * 2
        out.append((ch, wl, bd, np.asarray(plane)))
    return out
