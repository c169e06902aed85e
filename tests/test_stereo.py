"""Stereo 3D dual-channel samples vs the reference SDK.

The reference's 3D: one sample holds both eyes' bitstreams, 16-byte
aligned, with ENCODED_CHANNELS/ENCODED_CHANNEL_NUMBER tags and a VCHN
metadata tuple (`Codec/encoder.c:3407-3438`, `7548-7556`); eye selection
on decode via TAG_CHANNELS_ACTIVE (`Codec/decoder.c:10310-10340`).
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_gop import _metadata_from  # noqa: E402

from cineform_tpu import api  # noqa: E402
from cineform_tpu.models import stereo  # noqa: E402
from cineform_tpu.utils.testframes import yuy2_frame  # noqa: E402

REFBIN = "/root/repo/.refbuild/probe_sample"


@pytest.mark.skipif(not os.path.exists(REFBIN), reason="reference not built")
@pytest.mark.parametrize("w,h,q", [(320, 240, 4), (64, 48, 4)])
def test_3d_encode_byte_exact(w, h, q):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "s3d.cfhd")
        r = subprocess.run([REFBIN, "encode_3d", str(w), str(h), str(q),
                            "7", path], capture_output=True)
        assert r.returncode == 0, r.stderr
        golden = open(path, "rb").read()
    mine = stereo.encode_sample_3d(yuy2_frame(w, h, 7), yuy2_frame(w, h, 8),
                                   w, h, q, 1, _metadata_from(golden))
    assert mine == golden


@pytest.mark.skipif(not os.path.exists(REFBIN), reason="reference not built")
def test_3d_decode_both_eyes_byte_exact():
    w, h, q = 320, 240, 4
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "s3d.cfhd")
        subprocess.run([REFBIN, "encode_3d", str(w), str(h), str(q), "7",
                        path], capture_output=True)
        sample = open(path, "rb").read()
        for eye, cact in ((0, 1), (1, 2)):
            out = os.path.join(tmp, f"eye{eye}.yuy2")
            r = subprocess.run([REFBIN, "decode_3d", path, out, str(cact)],
                               capture_output=True)
            assert r.returncode == 0, r.stderr
            ref = np.frombuffer(open(out, "rb").read(), np.uint8)
            mine = np.frombuffer(stereo.decode_sample_3d(sample, eye),
                                 np.uint8)
            np.testing.assert_array_equal(mine, ref)


def test_3d_api_roundtrip_and_eye_selection():
    w, h = 160, 120
    enc = api.StereoEncoder()
    enc.prepare_to_encode(w, h, api.PixelFormat.YUY2)
    sample = enc.encode_sample(yuy2_frame(w, h, 3), yuy2_frame(w, h, 9))

    srcs = [np.frombuffer(yuy2_frame(w, h, p), np.uint8).astype(float)
            for p in (3, 9)]
    dec = api.Decoder()
    dec.prepare_to_decode(w, h, api.PixelFormat.YUY2)
    for mask, src in ((1, srcs[0]), (2, srcs[1])):
        dec.set_channels_active(mask)
        out = dec.decode_sample(sample).astype(float).reshape(-1)
        psnr = 10 * np.log10(255 ** 2 / max(np.mean((out - src) ** 2), 1e-9))
        assert psnr > 38, (mask, psnr)
        other = srcs[1] if mask == 1 else srcs[0]
        worse = 10 * np.log10(255 ** 2 / max(np.mean((out - other) ** 2),
                                             1e-9))
        assert worse < psnr - 5, "eye selection has no effect"


def test_3d_blend_modes():
    """Mask-3 decode composites both eyes per the channel blend mode
    (`Do3DWork`, bayer.c:10761; enum codec.h:1261-1278)."""
    import numpy as np
    from cineform_tpu import api
    from cineform_tpu.models import stereo
    from cineform_tpu.utils.testframes import yuy2_frame

    w, h = 320, 240
    left, right = yuy2_frame(w, h, 1), yuy2_frame(w, h, 60)
    sample = stereo.encode_sample_3d(left, right, w, h, 4)

    dec = api.Decoder()
    dec.prepare_to_decode(w, h, api.PixelFormat.YUY2, sample=sample)
    dec.set_channels_active(3)
    stacked = dec.decode_sample(sample)
    a = np.asarray(stacked).reshape(h, 2 * w)
    # top half ~ left eye content, bottom half ~ right eye content
    l = np.frombuffer(left, np.uint8).reshape(h, 2 * w).astype(int)
    r = np.frombuffer(right, np.uint8).reshape(h, 2 * w).astype(int)
    lsq = (l[0::2] + l[1::2] + 1) >> 1
    rsq = (r[0::2] + r[1::2] + 1) >> 1
    assert np.abs(a[:h // 2].astype(int) - lsq).mean() < 4
    assert np.abs(a[h // 2:].astype(int) - rsq).mean() < 4

    dec.set_channel_blend(stereo.BLEND_DIFFERENCE)
    diff = np.asarray(dec.decode_sample(sample)).reshape(h, 2 * w)
    assert abs(int(diff[:, 0::2].astype(int).mean()) - 128) < 8

    dec2 = api.Decoder()
    dec2.prepare_to_decode(w, h, api.PixelFormat.BGRA, sample=sample)
    dec2.set_channels_active(3)
    dec2.set_channel_blend(stereo.BLEND_ANAGLYPH_RC)
    ana = np.asarray(dec2.decode_sample(sample)).reshape(h, w, 4)
    # red from the left eye, green/blue from the right
    lr, lg, lb = stereo._yuy2_to_rgb(
        intra_host_decode(sample, 0), w, h)
    assert np.abs(ana[..., 2].astype(int) - lr).mean() < 4


def intra_host_decode(sample, eye):
    from cineform_tpu.models import stereo, intra_host
    eyes = stereo.split_3d(sample)
    out, _ = intra_host.decode_sample(eyes[eye], frame_index=eye)
    return out


def test_stereo_device_decode_matches_host():
    """decode_batch_device_3d == decode_sample_3d byte-for-byte, both
    eyes (device stereo decode, `Codec/decoder.c:10086-10104`)."""
    import numpy as np

    from cineform_tpu.models import stereo
    from cineform_tpu.utils.testframes import yuy2_frame

    w, h = 128, 64
    sample = stereo.encode_sample_3d(yuy2_frame(w, h, 1),
                                     yuy2_frame(w, h, 2), w, h, 4)
    for eye in (0, 1):
        host = np.frombuffer(stereo.decode_sample_3d(sample, eye),
                             np.uint8).reshape(h, 2 * w)
        dev = stereo.decode_batch_device_3d([sample, sample], eye=eye)
        assert (dev[0] == host).all() and (dev[1] == host).all()
