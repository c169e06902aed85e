"""EncoderPool semantics: submit-N / in-order harvest, deterministic output.

Behavioral spec: `EncoderSDK/EncoderPool.cpp:239-382`.
"""

import numpy as np

from cineform_tpu import api
from cineform_tpu.models import intra_host
from cineform_tpu.utils.testframes import yuy2_frame


def test_pool_in_order_delivery_and_determinism():
    w, h, n = 320, 240, 12
    pool = api.CFHD_CreateEncoderPool(thread_count=4, queue_length=6)
    pool.prepare_to_encode(w, h, api.PixelFormat.YUY2,
                           quality=api.EncodingQuality.FILMSCAN1)
    pool.start()

    frames = [yuy2_frame(w, h, p) for p in range(n)]
    out = []
    submitted = 0
    # interleave submit and harvest to exercise the bounded queue
    for i, f in enumerate(frames):
        pool.encode_async_sample(i + 1, f)
        submitted += 1
        if i % 3 == 2:
            out.append(pool.wait_for_sample())
    while len(out) < n:
        buf = pool.test_for_sample()
        out.append(buf if buf is not None else pool.wait_for_sample())
    pool.stop()

    # strictly in submission order
    assert [b.frame_number for b in out] == list(range(1, n + 1))
    # identical to the synchronous encoder
    for i, buf in enumerate(out):
        ref = intra_host.encode_sample(frames[i], w, h, 4, frame_number=i + 1)
        assert buf.get_encoded_sample() == ref


def test_pool_argument_validation():
    import pytest

    with pytest.raises(api.CFHDError):
        api.CFHD_CreateEncoderPool(0, 4)
    pool = api.CFHD_CreateEncoderPool(2, 2)
    with pytest.raises(api.CFHDError):
        pool.start()  # not prepared
    with pytest.raises(api.CFHDError):
        pool.encode_async_sample(1, b"")  # not started
