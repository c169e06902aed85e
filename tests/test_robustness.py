"""Decode robustness: corrupt/truncated samples must fail cleanly.

The reference survives corrupt input via ERROR_TOLERANT FSM guards
(`Codec/decoder.c:19650-19674`) and a decode fuzzer (`TestCFHD.cpp:572`);
our decoder must raise CFHDError (never crash or hang).
"""

import numpy as np
import pytest

from cineform_tpu import api
from cineform_tpu.models import intra_host
from cineform_tpu.utils.testframes import yuy2_frame


def _decode(sample):
    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, sample=sample)
    return dec.decode_sample(sample)


def test_truncated_samples():
    """Truncated samples are REJECTED with CFHDError — never another
    exception type, never a wrong-sized frame (the reference errors on
    end-of-stream mid-walk; matched by the truncated-band and
    band-count validations, models/intra_host.collect_wavelet_bands)."""
    w, h = 160, 120
    sample = intra_host.encode_sample(yuy2_frame(w, h, 1), w, h, 4)
    for frac in (0.1, 0.3, 0.6, 0.9, 0.99):
        cut = sample[:int(len(sample) * frac)]
        with pytest.raises(api.CFHDError):
            _decode(cut)


def test_bitflip_fuzz():
    """Every bit-flipped sample either decodes to a correctly-shaped
    frame or raises CFHDError — any other exception type is a
    robustness bug (the differential accept/reject + byte-identity
    contract vs the binary lives in tests/test_diff_fuzz.py)."""
    rng = np.random.default_rng(0)
    w, h = 160, 120
    sample = bytearray(intra_host.encode_sample(yuy2_frame(w, h, 1), w, h, 4))
    survived = rejected = 0
    for trial in range(40):
        mutated = bytearray(sample)
        for _ in range(rng.integers(1, 8)):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = _decode(bytes(mutated))
            assert out.shape == (h, 2 * w)
            survived += 1
        except api.CFHDError:
            rejected += 1
    # many corruptions land in entropy payloads and still decode something
    assert survived >= 1
    assert survived + rejected == 40


def test_garbage_input():
    rng = np.random.default_rng(1)
    dec = api.Decoder()
    with pytest.raises(api.CFHDError):
        dec.prepare_to_decode(0, 0, sample=rng.bytes(4096))
        dec.decode_sample(rng.bytes(4096))


def test_stereo_encoder_roundtrip():
    from cineform_tpu import metadata as md
    from cineform_tpu.models import stereo

    w, h = 160, 120
    st = api.StereoEncoder()
    st.prepare_to_encode(w, h, api.PixelFormat.YUY2)
    sample = st.encode_sample(yuy2_frame(w, h, 1), yuy2_frame(w, h, 2))
    item = md.find_metadata(sample, "VCHN")
    assert item is not None and item.payload[:4] == (2).to_bytes(4, "little")
    eyes = stereo.split_3d(sample)
    assert len(eyes) == 2
    for eye in (0, 1):
        out = np.frombuffer(stereo.decode_sample_3d(sample, eye), np.uint8)
        assert out.size == h * 2 * w
