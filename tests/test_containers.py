"""Container I/O: MOV/AVI round trips carrying real CFHD samples."""

import numpy as np

from cineform_tpu import api
from cineform_tpu.models import intra_host
from cineform_tpu.utils.containers import AviReader, Mp4Reader, write_avi, write_mov
from cineform_tpu.utils.testframes import yuy2_frame


def _samples(n=3, w=160, h=120):
    return [intra_host.encode_sample(yuy2_frame(w, h, p), w, h, 4,
                                     frame_number=p + 1)
            for p in range(n)]


def test_mov_roundtrip_and_decode():
    w, h = 160, 120
    samples = _samples(3, w, h)
    mov = write_mov(samples, w, h)
    rd = Mp4Reader(mov)
    assert rd.video is not None and rd.video.codec == "CFHD"
    assert (rd.video.width, rd.video.height) == (w, h)
    got = list(rd.samples())
    assert got == samples
    # decode a sample pulled from the container
    dec = api.Decoder()
    dec.prepare_to_decode(0, 0, sample=got[1])
    out = dec.decode_sample(got[1])
    assert out.shape == (h, 2 * w)


def test_avi_roundtrip():
    w, h = 160, 120
    samples = _samples(2, w, h)
    avi = write_avi(samples, w, h)
    rd = AviReader(avi)
    assert (rd.width, rd.height) == (w, h)
    assert list(rd.samples()) == samples


def test_reference_decodes_sample_from_our_mov(tmp_path):
    """Extract a sample from our MOV and let the reference SDK decode it."""
    import os
    import subprocess

    refbin = "/root/repo/.refbuild/probe_sample"
    if not os.path.exists(refbin):
        import pytest
        pytest.skip("reference not built")
    w, h = 160, 120
    samples = _samples(1, w, h)
    mov = write_mov(samples, w, h)
    got = list(Mp4Reader(mov).samples())
    sp = tmp_path / "s.cfhd"
    sp.write_bytes(got[0])
    out = tmp_path / "o.yuy2"
    r = subprocess.run([refbin, "decode", str(sp), str(out)],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    dec = np.frombuffer(out.read_bytes(), np.uint8)
    assert dec.size == w * h * 2
