"""Input pixel-format fan-out: v210 and YU64 10-bit 4:2:2 front ends.

Golden samples produced by the reference encoder via
tools/probe_sample.c encode_v210 / encode_yu64.
"""

import os

import numpy as np

from cineform_tpu import api
from cineform_tpu.utils.testframes import v210_frame, yu64_frame

from tests.test_intra_host import _metadata_from

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden", "samples")


def _golden(name: str) -> bytes:
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return f.read()


def _encode(pixel_format, frame, w, h, meta):
    enc = api.Encoder()
    enc.prepare_to_encode(w, h, pixel_format,
                          quality=api.EncodingQuality.FILMSCAN1)
    enc.attach_metadata(meta)
    enc.encode_sample(frame)
    return enc.get_sample_data()


def test_v210_encode_byte_exact():
    gold = _golden("v210_320x240_q4_p1.cfhd")
    meta = _metadata_from(gold)
    mine = _encode(api.PixelFormat.V210, v210_frame(320, 240, 1), 320, 240, meta)
    assert mine == gold


def test_yu64_encode_byte_exact():
    gold = _golden("yu64_320x240_q4_p1.cfhd")
    meta = _metadata_from(gold)
    mine = _encode(api.PixelFormat.YU64, yu64_frame(320, 240, 1), 320, 240, meta)
    assert mine == gold


def test_deep_formats_decode_matches_reference():
    """Reference decodes of the v210/YU64 samples vs our decoder (dither)."""
    from cineform_tpu.models import intra_host

    for name in ("v210_320x240_q4_p1", "yu64_320x240_q4_p1"):
        out, _ = intra_host.decode_sample(_golden(f"{name}.cfhd"))
        gold = np.frombuffer(_golden(f"{name}.yuy2"), np.uint8).astype(int)
        mine = np.frombuffer(out, np.uint8).astype(int)
        assert np.abs(mine - gold).max() <= 1
