"""JAX production pipeline vs the NumPy oracle and golden samples.

The JAX transform must be bit-exact vs ref/intra.py (itself byte-exact vs
the reference SDK), so the full JAX encode path must also reproduce the
golden reference samples byte-for-byte.
"""

import numpy as np
import pytest

from cineform_tpu.models import intra_host
from cineform_tpu.models.intra import IntraCodec
from cineform_tpu.utils.testframes import yuy2_frame

from tests.test_intra_host import CONFIGS, _golden, _metadata_from


@pytest.mark.parametrize("name,w,h,q,p", CONFIGS[:2])
def test_jax_encode_byte_exact_vs_reference(name, w, h, q, p):
    gold = _golden(name, "cfhd")
    meta = _metadata_from(gold)
    codec = IntraCodec(width=w, height=h, quality=q)
    frames = np.frombuffer(yuy2_frame(w, h, p), dtype=np.uint8).reshape(1, h, 2 * w)
    samples = codec.encode_batch(frames, first_frame_number=1, metadata=meta)
    assert samples[0] == gold


def test_jax_batch_encode_matches_host():
    w, h, q = 160, 120, 4
    codec = IntraCodec(width=w, height=h, quality=q)
    frames = np.stack([
        np.frombuffer(yuy2_frame(w, h, p), dtype=np.uint8).reshape(h, 2 * w)
        for p in (0, 1, 2, 3)
    ])
    samples = codec.encode_batch(frames)
    for i, p in enumerate((0, 1, 2, 3)):
        # the batch path advances UFRM/timecode per frame like the
        # reference's per-EncodeSample metadata bump
        host = intra_host.encode_sample(
            yuy2_frame(w, h, p), w, h, q, frame_number=1 + i,
            metadata=intra_host.EncoderMetadata().advanced(i))
        assert samples[i] == host


def test_jax_decode_matches_host():
    w, h, q = 320, 240, 4
    codec = IntraCodec(width=w, height=h, quality=q)
    raws = [yuy2_frame(w, h, p) for p in (1, 2)]
    samples = [intra_host.encode_sample(r, w, h, q) for r in raws]
    decoded = codec.decode_batch(samples)
    for i, sample in enumerate(samples):
        host_out, _ = intra_host.decode_sample(sample)
        assert decoded[i].tobytes() == host_out


def test_jax_roundtrip_psnr():
    w, h, q = 320, 240, 4
    codec = IntraCodec(width=w, height=h, quality=q)
    raw = yuy2_frame(w, h, 1)
    frames = np.frombuffer(raw, dtype=np.uint8).reshape(1, h, 2 * w)
    decoded = codec.decode_batch(codec.encode_batch(frames))
    a = frames.astype(np.float64)
    b = decoded.astype(np.float64)
    psnr = 10 * np.log10(255.0 ** 2 / np.mean((a - b) ** 2))
    assert psnr > 40.0, psnr


@pytest.mark.slow
def test_device_entropy_samples_byte_exact():
    """encode_batch_device (transform + quant + entropy pack all on device)
    produces samples byte-identical to the host oracle and the reference
    SDK golden, including the capacity-overflow host fallback."""
    import numpy as np

    from cineform_tpu.models import intra_host
    from cineform_tpu.models.intra import IntraCodec
    from cineform_tpu.utils.testframes import yuy2_frame
    from tests.test_intra_host import _metadata_from

    w, h = 320, 240
    frames = np.stack([
        np.frombuffer(yuy2_frame(w, h, p), np.uint8).reshape(h, 2 * w)
        for p in (1, 2)])
    codec = IntraCodec(width=w, height=h, quality=4)
    dev = codec.encode_batch_device(frames, first_frame_number=1)
    for i in range(2):
        ref = intra_host.encode_sample(
            frames[i].tobytes(), w, h, 4, frame_number=1 + i,
            metadata=intra_host.EncoderMetadata().advanced(i))
        assert dev[i] == ref

    gold = open("tests/golden/samples/s_320x240_q4_p1.cfhd", "rb").read()
    dev2 = codec.encode_batch_device(frames[:1], 1, _metadata_from(gold))
    assert dev2[0] == gold

    # capacity overflow on noise content falls back byte-exactly
    rng = np.random.default_rng(0)
    noisy = rng.integers(0, 256, size=(1, h, 2 * w), dtype=np.uint8)
    s_small = codec.encode_batch_device(noisy, 7, cap_bits=2)
    s_ref = intra_host.encode_sample(
        noisy[0].tobytes(), w, h, 4, frame_number=7,
        metadata=intra_host.EncoderMetadata().advanced(6))
    assert s_small[0] == s_ref


@pytest.mark.parametrize("fmt,pixfmt", [
    ("UYVY", "UYVY"), ("YU64", "YU64"), ("V210", "V210")])
@pytest.mark.slow
def test_device_unpack_formats_match_sync_encoder(fmt, pixfmt):
    """IntraCodec's device unpack kernels (ops/intra_transform.unpack_*)
    produce samples byte-identical to the synchronous host Encoder for
    every device-batched input format."""
    from cineform_tpu import api

    w, h = 96, 48
    rng = np.random.default_rng(11)
    pf = getattr(api.PixelFormat, pixfmt)
    row_bytes = {"UYVY": 2 * w, "YU64": 4 * w,
                 "V210": ((w + 47) // 48) * 128}[fmt]
    frame = rng.integers(0, 256, size=h * row_bytes, dtype=np.uint8)
    if fmt == "V210":
        # valid v210: 10-bit fields within each 32-bit word, top bits clear
        words = rng.integers(0, 1 << 30, size=h * row_bytes // 4,
                             dtype=np.uint32)
        frame = words.astype("<u4").view(np.uint8)

    enc = api.Encoder()
    enc.prepare_to_encode(w, h, pf)
    enc.encode_sample(frame.tobytes())
    want = enc.get_sample_data()

    codec = IntraCodec(width=w, height=h, quality=4, input_format=fmt)
    got = codec.encode_batch_device(frame.reshape(1, h, row_bytes))[0]
    assert got == want


def test_device_decode_multiframe_dither():
    """decode_batch(frame_index=n) reproduces the host decoder's n-th
    frame byte-for-byte (the rand dither stream advances per frame; round
    1 baked frame 0's dither into the traced program)."""
    from cineform_tpu.models import intra_host

    w, h = 64, 48
    codec = IntraCodec(width=w, height=h, quality=4)
    frames = np.stack([np.frombuffer(yuy2_frame(w, h, p),
                                     np.uint8).reshape(h, 2 * w)
                       for p in (1, 2)])
    samples = codec.encode_batch(frames)
    for idx in (0, 1, 3):
        dev = codec.decode_batch(samples, frame_index=idx)
        for i, s in enumerate(samples):
            host, _ = intra_host.decode_sample(s, frame_index=idx)
            np.testing.assert_array_equal(
                dev[i].reshape(-1), np.frombuffer(host, np.uint8), err_msg=str(idx))


@pytest.mark.parametrize("fmt,golden", [
    ("RG48", "rg48_320x240_q4_p1.cfhd"),
    ("B64A", "b64a_320x240_q4_p1.cfhd"),
    ("BYR4", "byr4_320x240_q4_p1.cfhd"),
    ("RG64", "raw_RG64.cfhd"),
    ("BYR5", "raw_BYR5.cfhd"),
])
@pytest.mark.slow
def test_device_rgb_bayer_encode_byte_exact(fmt, golden):
    """RGB 4:4:4 / RGBA 4:4:4:4 / Bayer encode fully on device
    (unpack kernels in ops/intra_transform + 12-bit transform + device
    entropy coder) is byte-identical to the reference SDK goldens —
    the round-4 device fan-out of `Codec/encoder.c:2109-2135` /
    `Codec/frame.c:4993/5473/5968/6569`."""
    from cineform_tpu.utils import testframes as tfgen
    from tests.test_formats import _golden as fm_golden, _raw_fill
    from tests.test_intra_host import _metadata_from

    w, h = 320, 240
    gold = fm_golden(golden)
    meta = _metadata_from(gold)
    if fmt == "RG48":
        raw = tfgen.rg48_frame(w, h, 1)
    elif fmt == "B64A":
        raw = tfgen.b64a_frame(w, h, 1)
    elif fmt == "BYR4":
        raw = tfgen.byr4_frame(w, h, 1)
    elif fmt == "RG64":
        raw = _raw_fill(w * h * 8, 1)
    else:
        raw = _raw_fill(w * h * 3 // 2, 1)

    codec = IntraCodec(width=w, height=h, quality=4, input_format=fmt)
    frames = np.frombuffer(raw, np.uint8).reshape(1, h, codec.row_bytes)
    got = codec.encode_batch_device(frames, 1, metadata=meta)[0]
    assert got == gold
