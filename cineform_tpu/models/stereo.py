"""Stereo 3D dual-channel samples: two eyes in ONE CFHD sample.

The reference encodes 3D by looping EncodeSample over the video channels,
appending each eye's complete bitstream 16-byte-aligned into one sample
(`Codec/encoder.c:3407-3438`), with ENCODED_CHANNELS / ENCODED_CHANNEL_NUMBER
tags in each eye's header (`Codec/encoder.c:7548-7556`) and a VCHN metadata
tuple.  The decoder picks eyes via the TAG_CHANNELS_ACTIVE mask
(`Codec/decoder.c:10086-10104`).

Byte-exact vs the reference encoder (tests/test_stereo.py, probe encode_3d).
"""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from cineform_tpu.bitstream import parse_sample
from cineform_tpu.models import intra_host
from cineform_tpu.ref import intra as xf
from cineform_tpu.spec.production import IntraParams


def encode_sample_3d(left_yuy2: bytes, right_yuy2: bytes, width: int,
                     height: int, quality: int, frame_number: int = 1,
                     metadata: intra_host.EncoderMetadata | None = None
                     ) -> bytes:
    """Encode a left/right YUY2 pair into one dual-channel 3D sample."""
    meta = replace(metadata or intra_host.EncoderMetadata(), video_channels=2)
    params = IntraParams(width=width, height=height, quality=quality)
    out = bytearray()
    for idx, frame in enumerate((left_yuy2, right_yuy2)):
        planes = xf.unpack_yuy2(frame, width, height, params.precision)
        channels = [intra_host.transform_channel(p, params, ch)
                    for ch, p in enumerate(planes)]
        sample = intra_host.write_sample(
            channels, params, frame_number, meta,
            video_channels=2, channel_number=idx)
        out += sample
        out += b"\0" * (-len(out) % 16)    # FlushBitstreamAlign(output, 16)
    return bytes(out)


def split_3d(sample: bytes) -> list[bytes]:
    """Split a dual-channel sample into its per-eye bitstreams."""
    s = parse_sample(sample)
    if s.encoded_channels < 2 or not s.sample_end:
        return [sample]
    end = (s.sample_end + 15) & ~15
    return [sample[:end], sample[end:]]


def decode_sample_3d(sample: bytes, eye: int = 0,
                     dither: bool = True) -> bytes:
    """Decode one eye (0 = left, 1 = right) of a 3D sample to YUY2."""
    eyes = split_3d(sample)
    if eye >= len(eyes):
        raise ValueError(f"sample has {len(eyes)} video channels")
    out, _info = intra_host.decode_sample(eyes[eye], dither=dither)
    return out
