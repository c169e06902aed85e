"""Encoder-side metadata/database overrides vs the reference binary.

The reference encoder re-reads ``override.colr`` from its fixed Linux
override path around every EncodeSample and lets hidden metadata tags
change encode behavior (`Codec/encoder.c:8792` OverrideEncoderSettings,
`encoder.c:9044` UpdateEncoderOverrides).  These tests write the actual
override database, encode with the reference binary, and require our
api.Encoder (pointed at the same file via CINEFORM_OVERRIDE_PATH) to
produce byte-identical samples.
"""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

from cineform_tpu import api
from cineform_tpu.bitstream import parse_sample
from cineform_tpu.models import intra_host
from cineform_tpu.utils import override_db
from cineform_tpu.utils.testframes import yuy2_frame

REFBIN = "/root/repo/.refbuild/probe_sample"
REFDIR = "/var/cineform/public"


def _tuple(tag: bytes, value: int, typ: bytes = b"H") -> bytes:
    return tag + (4).to_bytes(3, "little") + typ + value.to_bytes(4, "little")


def _meta_from(gold: bytes) -> intra_host.EncoderMetadata:
    blob = parse_sample(gold).metadata[0]
    vals = {}
    pos = 0
    while pos + 8 <= len(blob):
        four = blob[pos:pos + 4]
        size = int.from_bytes(blob[pos + 4:pos + 7], "little")
        vals[four.decode()] = blob[pos + 8:pos + 8 + size]
        pos += 8 + size + ((-size) % 4)
    return intra_host.EncoderMetadata(
        guid=vals["GUID"], date=vals["DATE"].rstrip(b"\0").decode(),
        time=vals["TIME"].rstrip(b"\0").decode(),
        timecode=vals["TIMC"].rstrip(b"\0").decode(),
        unique_frame=int.from_bytes(vals["UFRM"], "little"))


def _ref_available() -> bool:
    return os.path.exists(REFBIN) and os.access(REFDIR, os.W_OK) \
        if os.path.isdir(REFDIR) else False


needs_ref = pytest.mark.skipif(not _ref_available(),
                               reason="reference binary / override dir")


@needs_ref
@pytest.mark.parametrize("tags", [
    [(b"LYUV", 1)],
    [(b"LYUV", 1), (b"CV67", 1)],
])
def test_disk_override_byte_exact(tags, tmp_path, monkeypatch):
    w, h, q, p = 256, 128, 4, 1
    colr = b"".join(_tuple(t, v) for t, v in tags)
    path = os.path.join(REFDIR, "override.colr")
    try:
        with open(path, "wb") as f:
            f.write(colr)
        out = tmp_path / "ov.cfhd"
        r = subprocess.run([REFBIN, "encode", str(w), str(h), str(q),
                            str(p), str(out)], capture_output=True)
        assert r.returncode == 0
        gold = out.read_bytes()
        monkeypatch.setenv("CINEFORM_API_DEVICE", "0")
        enc = api.Encoder()
        enc.prepare_to_encode(w, h, api.PixelFormat.YUY2,
                              quality=api.EncodingQuality(q))
        enc.attach_metadata(_meta_from(gold))
        enc.encode_sample(yuy2_frame(w, h, p))
        assert enc.get_sample_data() == gold
    finally:
        if os.path.exists(path):
            os.remove(path)


@needs_ref
def test_attached_hidden_metadata_not_written(tmp_path, monkeypatch):
    """Hidden override tuples drive the encode but are stripped from the
    sample's metadata (`encoder.c:8906` RemoveHiddenMetadata)."""
    w, h, q, p = 256, 128, 4, 1
    path = os.path.join(REFDIR, "override.colr")
    try:
        with open(path, "wb") as f:
            f.write(_tuple(b"LYUV", 1))
        out = tmp_path / "ov.cfhd"
        subprocess.run([REFBIN, "encode", str(w), str(h), str(q), str(p),
                        str(out)], capture_output=True)
        gold = out.read_bytes()
    finally:
        if os.path.exists(path):
            os.remove(path)
    base = tmp_path / "base.cfhd"
    subprocess.run([REFBIN, "encode", str(w), str(h), str(q), str(p),
                    str(base)], capture_output=True)
    assert parse_sample(gold).metadata == \
        parse_sample(base.read_bytes()).metadata


def test_override_block_parsing():
    block = _tuple(b"LYUV", 1) + _tuple(b"CV67", 1) + \
        _tuple(b"CLSY", 2) + _tuple(b"UFRM", 7, b"L")
    ov = override_db.parse_overrides(block)
    assert ov == {"limit_yuv": 1, "conv_601_709": 1, "colorspace_yuv": 2}
    stripped = override_db.remove_hidden(block)
    assert b"LYUV" not in stripped and b"UFRM" in stripped


def test_limit_convert_shapes():
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (8, 64), dtype=np.uint8)
    y, v, u = override_db.limit_convert_yuy2(frame, 1, 1)
    assert y.shape == (8, 32) and v.shape == (8, 16) and u.shape == (8, 16)
    assert y.min() >= 0 and y.max() <= 1023
    # limit-only matches the documented scalar formula exactly
    y2, v2, u2 = override_db.limit_convert_yuy2(frame, 1, 0)
    a = frame.reshape(8, -1, 4).astype(np.int64)
    assert (y2[:, 0::2] == ((a[..., 0] * 55) >> 4) + 64).all()
    assert (v2 == ((a[..., 3] * 56) >> 4) + 64).all()
