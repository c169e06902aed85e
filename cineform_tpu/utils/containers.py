"""Minimal MP4/MOV and AVI container I/O for CFHD samples.

Reader parity with the reference demo tools (`Example/mp4reader.cpp:96`
HandleMP4FileData walking moov/trak/mdia/minf/stbl for 'CFHD' video tracks;
`Example/readavi.cpp:619` RIFF 'movi' chunk walk), plus simple writers so
clips can be round-tripped and fed to other CFHD tools.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# MP4 / MOV
# ---------------------------------------------------------------------------

@dataclass
class Mp4Track:
    codec: str = ""
    width: int = 0
    height: int = 0
    timescale: int = 0
    sample_sizes: list = field(default_factory=list)
    chunk_offsets: list = field(default_factory=list)
    samples_per_chunk: list = field(default_factory=list)  # (first_chunk, count)


class Mp4Reader:
    """Walks the box tree and exposes CFHD video samples."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.tracks: list[Mp4Track] = []
        self._parse_children(0, len(data))
        self.video = next((t for t in self.tracks if t.codec in
                           ("CFHD", "cfhd")), None)

    def _boxes(self, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            size, = struct.unpack(">I", self.data[pos:pos + 4])
            kind = self.data[pos + 4:pos + 8].decode("latin1")
            if size == 1:  # 64-bit size
                size, = struct.unpack(">Q", self.data[pos + 8:pos + 16])
                body = pos + 16
            elif size == 0:
                size = end - pos
                body = pos + 8
            else:
                body = pos + 8
            yield kind, body, pos + size
            pos += max(size, 8)

    def _parse_children(self, start: int, end: int, track: Mp4Track | None = None):
        for kind, body, bend in self._boxes(start, end):
            if kind in ("moov", "mdia", "minf", "stbl"):
                self._parse_children(body, bend, track)
            elif kind == "trak":
                t = Mp4Track()
                self.tracks.append(t)
                self._parse_children(body, bend, t)
            elif kind == "stsd" and track is not None:
                count, = struct.unpack(">I", self.data[body + 4:body + 8])
                if count:
                    track.codec = self.data[body + 12:body + 16].decode("latin1")
                    track.width, track.height = struct.unpack(
                        ">HH", self.data[body + 40:body + 44])
            elif kind == "stsz" and track is not None:
                fixed, count = struct.unpack(">II", self.data[body + 4:body + 12])
                if fixed:
                    track.sample_sizes = [fixed] * count
                else:
                    track.sample_sizes = list(struct.unpack(
                        f">{count}I", self.data[body + 12:body + 12 + 4 * count]))
            elif kind == "stco" and track is not None:
                count, = struct.unpack(">I", self.data[body + 4:body + 8])
                track.chunk_offsets = list(struct.unpack(
                    f">{count}I", self.data[body + 8:body + 8 + 4 * count]))
            elif kind == "co64" and track is not None:
                count, = struct.unpack(">I", self.data[body + 4:body + 8])
                track.chunk_offsets = list(struct.unpack(
                    f">{count}Q", self.data[body + 8:body + 8 + 8 * count]))
            elif kind == "stsc" and track is not None:
                count, = struct.unpack(">I", self.data[body + 4:body + 8])
                for i in range(count):
                    first, spc, _ = struct.unpack(
                        ">III", self.data[body + 8 + 12 * i:body + 20 + 12 * i])
                    track.samples_per_chunk.append((first, spc))

    def samples(self):
        """Yield CFHD sample bytes in order (mp4reader GetSample parity)."""
        t = self.video
        if t is None:
            return
        # expand stsc run-length table to per-chunk counts
        counts = []
        runs = t.samples_per_chunk or [(1, 1)]
        for i, (first, spc) in enumerate(runs):
            last = (runs[i + 1][0] - 1) if i + 1 < len(runs) else len(t.chunk_offsets)
            counts += [spc] * (last - first + 1)
        sizes = iter(t.sample_sizes)
        for chunk, off in enumerate(t.chunk_offsets):
            pos = off
            for _ in range(counts[chunk] if chunk < len(counts) else 1):
                try:
                    size = next(sizes)
                except StopIteration:
                    return
                yield self.data[pos:pos + size]
                pos += size


def write_mov(samples: list[bytes], width: int, height: int,
              fps: int = 24) -> bytes:
    """Assemble a minimal CFHD MOV (one video track, one sample per chunk)."""
    mdat_body = b"".join(samples)
    # layout: ftyp | moov | mdat ; compute offsets with fixed header sizes
    def box(kind: str, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + kind.encode() + payload

    ftyp = box("ftyp", b"qt  \x00\x00\x02\x00qt  ")
    timescale = fps * 1000
    duration = len(samples) * 1000

    stsd_entry = struct.pack(">I4s", 86, b"CFHD") + b"\x00" * 6 + struct.pack(
        ">H", 1) + b"\x00" * 16 + struct.pack(">HH", width, height) + \
        struct.pack(">II", 0x00480000, 0x00480000) + b"\x00" * 4 + \
        struct.pack(">H", 1) + b"CineForm" + b"\x00" * 24 + \
        struct.pack(">HH", 24, 0xFFFF)
    stsd = box("stsd", struct.pack(">II", 0, 1) + stsd_entry)
    stts = box("stts", struct.pack(">IIII", 0, 1, len(samples), 1000))
    stsc = box("stsc", struct.pack(">II", 0, 1) + struct.pack(">III", 1, 1, 1))
    stsz = box("stsz", struct.pack(">III", 0, 0, len(samples))
               + b"".join(struct.pack(">I", len(s)) for s in samples))

    # stco needs the absolute mdat payload offsets: compute moov size with a
    # placeholder stco first (sizes are stable since the entry count is fixed)
    def build_moov(offsets):
        stco = box("stco", struct.pack(">II", 0, len(offsets))
                   + b"".join(struct.pack(">I", o) for o in offsets))
        stbl = box("stbl", stsd + stts + stsc + stsz + stco)
        vmhd = box("vmhd", struct.pack(">I", 1) + b"\x00" * 8)
        minf = box("minf", vmhd + box("dinf", box("dref",
                   struct.pack(">II", 0, 1) + box("alis", struct.pack(">I", 1)))) + stbl)
        hdlr = box("hdlr", b"\x00" * 4 + b"mhlrvide" + b"\x00" * 12 + b"\x00")
        mdhd = box("mdhd", struct.pack(">IIIIIHH", 0, 0, 0, timescale,
                                       duration, 0, 0))
        mdia = box("mdia", mdhd + hdlr + minf)
        tkhd = box("tkhd", struct.pack(">IIIII", 7, 0, 0, 1, 0)
                   + b"\x00" * 48 + struct.pack(">II", width << 16, height << 16))
        trak = box("trak", tkhd + mdia)
        mvhd = box("mvhd", struct.pack(">IIIII", 0, 0, 0, timescale, duration)
                   + b"\x00" * 76)
        return box("moov", mvhd + trak)

    probe = build_moov([0] * len(samples))
    base = len(ftyp) + len(probe) + 8
    offsets = []
    pos = base
    for s in samples:
        offsets.append(pos)
        pos += len(s)
    moov = build_moov(offsets)
    assert len(moov) == len(probe)
    return ftyp + moov + box("mdat", mdat_body)


# ---------------------------------------------------------------------------
# AVI (RIFF)
# ---------------------------------------------------------------------------

class AviReader:
    """Walks RIFF/LIST chunks and yields '00dc' video samples
    (`Example/readavi.cpp:619`)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.width = 0
        self.height = 0
        self._samples: list[bytes] = []
        if data[0:4] != b"RIFF" or data[8:12] != b"AVI ":
            raise ValueError("not an AVI file")
        self._walk(12, len(data))

    def _walk(self, pos: int, end: int) -> None:
        while pos + 8 <= end:
            four = self.data[pos:pos + 4]
            size, = struct.unpack("<I", self.data[pos + 4:pos + 8])
            if four == b"LIST":
                kind = self.data[pos + 8:pos + 12]
                self._walk(pos + 12, pos + 8 + size)
            elif four == b"strf":
                if size >= 12:
                    self.width, self.height = struct.unpack(
                        "<ii", self.data[pos + 12:pos + 20])
            elif four[2:4] == b"dc":
                self._samples.append(self.data[pos + 8:pos + 8 + size])
            pos += 8 + size + (size & 1)

    def samples(self):
        yield from self._samples


def write_avi(samples: list[bytes], width: int, height: int,
              fps: int = 24) -> bytes:
    """Assemble a minimal CFHD AVI (vids/CFHD stream in a movi list)."""
    def chunk(four: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return four + struct.pack("<I", len(payload)) + payload + pad

    def lst(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = chunk(b"avih", struct.pack(
        "<14I", 1000000 // fps, 0, 0, 0x10, len(samples), 0, 1, 0,
        width, height, 0, 0, 0, 0))
    strh = chunk(b"strh", b"vids" + b"CFHD" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(samples), 0, 0, 0, 0))
    strf = chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"CFHD",
        width * height * 3, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00dc", s) for s in samples))
    riff_body = b"AVI " + hdrl + movi
    return chunk(b"RIFF", riff_body)
