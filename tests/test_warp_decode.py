"""End-to-end lens-warp decode parity vs the reference binary.

Encodes YUY2 frames with lens metadata attached in-sample (LSPH/LGPR/
OFFR/ZOOM/OFFX/OFFY — `Common/CFHDMetadataTags.h:256-287`), decodes with
the compiled reference SDK (probe_sample decode -> CFHD_DecodeSample,
whose tail runs WarpFrame, `Codec/decoder.c:11140`), and checks our
api.Decoder output byte-for-byte.  lensFill=0 everywhere: the fill path
draws from the process rand() stream under a thread race in the binary
and is pinned against the single-threaded library oracle instead
(tests/test_warp_geomesh.py).
"""

import os
import subprocess

import numpy as np
import pytest

from cineform_tpu import api, metadata as md
from cineform_tpu.utils.testframes import yuy2_frame

REFBIN = "/root/repo/.refbuild/probe_sample"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFBIN), reason="reference probe not built")


def _encode_with_lens(w, h, tags):
    enc = api.Encoder()
    enc.prepare_to_encode(w, h, api.PixelFormat.YUY2,
                          api.EncodedFormat.YUV_422,
                          api.EncodingFlags.NONE, api.EncodingQuality(4))
    m = md.Metadata()
    for tag, value in tags.items():
        if isinstance(value, int):
            m.add(tag, value, md.TYPE_HIDDEN)
        else:
            m.add(tag, float(value))
    enc.attach_metadata(m)
    enc.encode_sample(yuy2_frame(w, h, 3))
    return enc.get_sample_data()


def _ref_decode(sample, w, h, tmp_path):
    inp = tmp_path / "in.cfhd"
    outp = tmp_path / "out.yuy2"
    inp.write_bytes(sample)
    subprocess.run([REFBIN, "decode", str(inp), str(outp)], check=True,
                   capture_output=True, timeout=120)
    data = outp.read_bytes()
    assert len(data) == h * 2 * w
    return data


def _our_decode(sample):
    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, sample=sample)
    return dec.decode_sample(sample).tobytes()


CASES = {
    # sphere on, default GoPro curve: repoint HERO4->HERO4
    "sphere_identity": {"LSPH": 1},
    # sphere stack: rotate + zoom + repoint
    "sphere_stack": {"LSPH": 1, "ZOOM": 1.2, "OFFX": 0.1, "OFFY": -0.05,
                     "OFFR": 0.1},
    # sphere + defish
    "sphere_defish": {"LSPH": 1, "OFFF": 30.0},
    # planar rotate only (|OFFR| > 0.01 forces doMesh without sphere)
    "planar_rotate": {"OFFR": 0.2},
    # rectilinear conversion (lensGoPro=0 + sphere)
    "rectilinear": {"LSPH": 1, "LGPR": 0},
    # equirect output projection
    "equirect_out": {"LSPH": 1, "LGPR": 2, "OFFX": 0.05},
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_warped_decode_byte_exact(name, tmp_path):
    w, h = 320, 240
    sample = _encode_with_lens(w, h, CASES[name])
    want = _ref_decode(sample, w, h, tmp_path)
    got = _our_decode(sample)
    assert got == want, (
        f"{name}: {np.mean(np.frombuffer(got, np.uint8) != np.frombuffer(want, np.uint8)):.4%} bytes differ")


def test_no_lens_metadata_no_warp(tmp_path):
    """Without lens tags the decode is unchanged (doMesh stays false)."""
    w, h = 320, 240
    sample = _encode_with_lens(w, h, {})
    want = _ref_decode(sample, w, h, tmp_path)
    assert _our_decode(sample) == want
