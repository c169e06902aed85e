"""TPU entropy decoder (entropy/device_decode) vs the bit-exact host coder.

The device decoder re-expresses DecodeBandFSM16sNoGap
(`Codec/decoder.c:19532`) as data-parallel stages; these tests pin it
band-for-band against entropy/host.decode_band (itself validated against
the reference binary) and whole-sample against models/intra.decode_batch.
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from cineform_tpu.entropy import device_decode as dd
from cineform_tpu.entropy import host as ehost


def _encode(vals, codeset):
    bits, sizes = ehost.encode_band(vals, codeset)
    return ehost.pack_msb_first(bits, sizes, align=32)


def _decode_device(bands, chunk_cap=4096, nout_cap=24576):
    payload = b"".join(p for p, _, _, _ in bands)
    used = len(payload) // 4
    assert used <= chunk_cap
    payload = payload + b"\0" * (4 * (chunk_cap - used))
    reset = np.zeros(chunk_cap, bool)
    rbase = np.zeros(chunk_cap, np.int32)
    rend = np.zeros(chunk_cap, np.int32)
    quant = np.ones(chunk_cap, np.int32)
    linear = np.zeros(chunk_cap, np.int32)
    inband = np.zeros(chunk_cap, np.int32)
    pos = out = 0
    spans = []
    for p, n, q, cs in bands:
        t0, t1 = pos // 4, (pos + len(p)) // 4
        reset[t0] = True
        rbase[t0:t1] = out
        rend[t0:t1] = out + n
        quant[t0:t1] = q
        linear[t0:t1] = 1 if cs == 18 else 0
        inband[t0:t1] = 1
        spans.append((out, out + n))
        out += n
        pos += len(p)
    reset[used:] = True
    assert out <= nout_cap
    coeffs, ovf = dd.decode_payload_jit(
        jnp.asarray(np.frombuffer(payload, np.uint8)),
        jnp.asarray(reset), jnp.asarray(rbase), jnp.asarray(rend),
        jnp.asarray(quant), jnp.asarray(linear), jnp.asarray(inband),
        nout=nout_cap)
    return np.asarray(coeffs), np.asarray(ovf), spans


def _host_ref(p, n, cs, q):
    want, _ = ehost.decode_band(p, n, cs, q)
    return (want.astype(np.int32) << 16) >> 16   # DeQuantFSM int16 wrap


@pytest.mark.slow
def test_multi_band_payload_bit_exact():
    rng = np.random.default_rng(5)
    bands = []
    for density, codeset, quant in [(0.0, 17, 1), (0.05, 17, 12),
                                    (0.3, 18, 4), (0.9, 17, 24),
                                    (0.5, 18, 6), (0.01, 17, 1)]:
        n = int(rng.integers(200, 3000))
        vals = np.zeros(n, np.int64)
        nz = rng.random(n) < density
        vals[nz] = rng.integers(-1023, 1024, nz.sum())
        bands.append((_encode(vals, codeset), n, quant, codeset))
    coeffs, ovf, spans = _decode_device(bands)
    assert not ovf.any()
    for (p, n, q, cs), (lo, hi) in zip(bands, spans):
        assert (coeffs[lo:hi] == _host_ref(p, n, cs, q)).all()


def test_single_value_edge_cases():
    cases = [
        np.array([0] * 500, np.int64),               # all zeros
        np.array([1023] + [0] * 99, np.int64),       # clamp max
        np.array([-1023] * 64, np.int64),            # all max negative
        np.array([0] * 3500 + [5], np.int64),        # run > runbook length
        np.array([1, -1] * 200, np.int64),           # alternating smallest
    ]
    bands = [(_encode(v, 17), len(v), 3, 17) for v in cases]
    coeffs, ovf, spans = _decode_device(bands)
    assert not ovf.any()
    for (p, n, q, cs), (lo, hi) in zip(bands, spans):
        assert (coeffs[lo:hi] == _host_ref(p, n, cs, q)).all()


def test_sample_decode_device_matches_host():
    """decode_batch_device == decode_batch byte-for-byte on real samples."""
    from cineform_tpu.models.intra import IntraCodec

    rng = np.random.default_rng(9)
    codec = IntraCodec(width=128, height=64, quality=4)
    frames = rng.integers(0, 256, (2, 64, 256), dtype=np.uint8)
    samples = codec.encode_batch(frames)
    host = codec.decode_batch(samples)
    dev = codec.decode_batch_device(samples)
    assert (host == dev).all()


def _device_vs_host(input_format, frame_fn, output, w=128, h=64):
    from cineform_tpu.models.intra import IntraCodec

    codec = IntraCodec(width=w, height=h, quality=4,
                       input_format=input_format)
    base = np.frombuffer(frame_fn(w, h, 1), np.uint8).reshape(h, -1)
    frames = np.stack([base, np.roll(base, 3, axis=0)])
    samples = codec.encode_batch(frames)
    dev = codec.decode_batch_device(samples, output=output)
    return codec, samples, dev


def test_rgb_sample_decode_device_matches_host():
    """Device RG48 decode of RGB 4:4:4 sources == host decode_sample_rgb
    byte-for-byte (`Codec/decoder.c:11584` decodes every encoded format
    through the same hot path)."""
    from cineform_tpu.models import intra_host as ih
    from cineform_tpu.utils.testframes import rg48_frame

    codec, samples, dev = _device_vs_host("RG48", rg48_frame, "RG48")
    for i, s in enumerate(samples):
        host = np.frombuffer(ih.decode_sample_rgb(s, "RG48")[0], "<u2")
        assert (host == dev[i].reshape(-1)).all()


def test_rgba_sample_decode_device_matches_host():
    from cineform_tpu.models import intra_host as ih
    from cineform_tpu.utils.testframes import b64a_frame

    codec, samples, dev = _device_vs_host("B64A", b64a_frame, "b64a")
    for i, s in enumerate(samples):
        host = np.frombuffer(ih.decode_sample_rgb(s, "b64a")[0], "<u2")
        assert (host == dev[i].reshape(-1)).all()


def test_bayer_sample_decode_device_matches_host():
    from cineform_tpu.models import intra_host as ih
    from cineform_tpu.utils.testframes import byr4_frame

    codec, samples, dev = _device_vs_host("BYR4", byr4_frame, "BYR4")
    for i, s in enumerate(samples):
        host = np.frombuffer(ih.decode_sample_bayer_to(s, "BYR4"), "<u2")
        assert (host == dev[i].reshape(-1)).all()
