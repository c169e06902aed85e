"""End-to-end host codec vs the reference SDK (golden samples).

Golden data: tests/golden/samples/*.cfhd were produced by the reference
encoder (tools/probe_sample.c against the built reference SDK), *.yuy2 are
the reference decoder's output for those samples.

Gates:
  1. encode_sample is BYTE-EXACT vs the reference encoder for every golden
     config (160x120..1920x1080, qualities 4-6).
  2. decode_sample matches the reference decoder within the 1-bit random
     output dither (|diff| <= 1 everywhere), and the parser walks every
     sample completely.
"""

import os

import numpy as np
import pytest

from cineform_tpu.bitstream import parse_sample
from cineform_tpu.models import intra_host
from cineform_tpu.utils.testframes import yuy2_frame

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "samples")

CONFIGS = [
    ("s_160x120_q4_p0", 160, 120, 4, 0),
    ("s_320x240_q4_p1", 320, 240, 4, 1),
    ("s_640x360_q5_p1", 640, 360, 5, 1),
    ("s_1920x1080_q6_p1", 1920, 1080, 6, 1),
    # narrow deep-level widths exercising the reference's width<=16
    # SSE2 row-filter quirk (column-0 center filter with prev-row /
    # zero overread; see ref/intra._h26_forward)
    ("s_64x48_q4_p1", 64, 48, 4, 1),
    ("s_112x48_q4_p1", 112, 48, 4, 1),
    ("s_128x96_q4_p1", 128, 96, 4, 1),
    ("s_144x96_q4_p1", 144, 96, 4, 1),
]


def _golden(name: str, ext: str) -> bytes:
    with open(os.path.join(GOLDEN_DIR, f"{name}.{ext}"), "rb") as f:
        return f.read()


def _metadata_from(gold: bytes) -> intra_host.EncoderMetadata:
    """Extract the encode-time metadata (date/time) from a golden sample so
    our encoder can reproduce it byte-for-byte."""
    blob = parse_sample(gold).metadata[0]
    vals = {}
    pos = 0
    while pos + 8 <= len(blob):
        four = blob[pos:pos + 4]
        size = int.from_bytes(blob[pos + 4:pos + 7], "little")
        vals[four.decode()] = blob[pos + 8:pos + 8 + size]
        pos += 8 + size + ((-size) % 4)
    return intra_host.EncoderMetadata(
        guid=vals["GUID"],
        date=vals["DATE"].rstrip(b"\0").decode(),
        time=vals["TIME"].rstrip(b"\0").decode(),
        timecode=vals["TIMC"].rstrip(b"\0").decode(),
        unique_frame=int.from_bytes(vals["UFRM"], "little"),
    )


@pytest.mark.parametrize("name,w,h,q,p", CONFIGS)
def test_encode_byte_exact(name, w, h, q, p):
    gold = _golden(name, "cfhd")
    meta = _metadata_from(gold)
    mine = intra_host.encode_sample(yuy2_frame(w, h, p), w, h, q, 1, meta)
    assert mine == gold


@pytest.mark.parametrize("name,w,h,q,p", CONFIGS)
def test_decode_byte_exact(name, w, h, q, p):
    """Byte-exact decode: the reference's {0,1} random output dither
    (InvertHorizontalStrip16sToYUYV, InvertHorizontalStrip16s.c:3883) is
    replicated from the glibc rand stream (ref/intra.decode_dither_rows)."""
    gold_yuv = _golden(name, "yuy2")
    out, parsed = intra_host.decode_sample(_golden(name, "cfhd"))
    assert parsed.width == w and parsed.height == h
    # byte-exact at every width, including w%32==16 (odd chroma lowpass
    # widths take the +5 channel-offset parse path, decoder.c:12479)
    assert out == gold_yuv


@pytest.mark.parametrize("name,w,h,q,p", CONFIGS[:3])
def test_decode_undithered_within_dither(name, w, h, q, p):
    gold_yuv = np.frombuffer(_golden(name, "yuy2"), dtype=np.uint8).astype(int)
    out, _ = intra_host.decode_sample(_golden(name, "cfhd"), dither=False)
    mine = np.frombuffer(out, dtype=np.uint8).astype(int)
    diff = np.abs(mine - gold_yuv)
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.40


@pytest.mark.parametrize("name,w,h,q,p", CONFIGS)
def test_parser_walks_sample(name, w, h, q, p):
    s = parse_sample(_golden(name, "cfhd"))
    assert s.width == w and s.height == h
    assert s.quality & 0xFF == q
    assert s.precision == 10
    assert len(s.channels) == 3
    for c in s.channels:
        assert c.lowpass is not None
        assert len(c.bands) == 9
        assert c.lowpass.shape == (c.lowpass_height, c.lowpass_width)


def test_roundtrip_own_sample():
    """Our decoder decodes our own encoder's output; PSNR sanity."""
    w, h, q = 320, 240, 4
    raw = yuy2_frame(w, h, 1)
    sample = intra_host.encode_sample(raw, w, h, q)
    out, parsed = intra_host.decode_sample(sample)
    a = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
    b = np.frombuffer(out, dtype=np.uint8).astype(np.float64)
    mse = np.mean((a - b) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 40.0, psnr
    # constant-quality design: intra FILMSCAN1 compresses this pattern > 2:1
    assert len(sample) < len(raw) / 2


def test_filmscan_rate_control_series_byte_exact():
    """FILMSCAN2/3 VBR: the FSratelimiter walks from the previous frame's
    achieved compression (`QuantizationSetQuality`, quantize.c:236-310),
    rescaling subbands 8-16 per frame.  Byte-exact vs a reference-encoded
    4-frame series at both qualities (the dense test frames drive the
    limiter from 8->19 / 4->10)."""
    from cineform_tpu import api
    from cineform_tpu.utils.testframes import yuy2_frame

    for q, base in ((5, "fs2_320x240"), (6, "fs3_320x240")):
        gold0 = _golden(base, "cfhd.f0")
        enc = api.Encoder()
        enc.prepare_to_encode(320, 240, api.PixelFormat.YUY2,
                              quality=api.EncodingQuality(q))
        enc.attach_metadata(_metadata_from(gold0))
        for f in range(4):
            enc.encode_sample(yuy2_frame(320, 240, f + 1))
            assert enc.get_sample_data() == _golden(base, f"cfhd.f{f}"), \
                (q, f)
