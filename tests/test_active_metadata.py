"""Sample metadata drives the develop pipeline (Active Metadata wiring).

Reference: `ApplyActiveMetaData` (`Codec/bayer.c:7427`), gated by the
TAG_PROCESS_PATH flags; parameters parsed by `UpdateCFHDDATA`
(`Codec/DemoasicFrames.cpp:5286`).
"""

import os
import subprocess
import tempfile

import numpy as np
import pytest

from cineform_tpu import metadata as md
from cineform_tpu.models import active_metadata as am

REFBIN = "/root/repo/.refbuild/probe_sample"


def _wbal_sample(r1000, g1000, b1000, tmp):
    path = os.path.join(tmp, f"b_{r1000}_{g1000}_{b1000}.cfhd")
    r = subprocess.run([REFBIN, "encode_byr4_wbal", "128", "96", "4", "3",
                        str(r1000), str(g1000), str(b1000), path],
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    return open(path, "rb").read()


@pytest.mark.skipif(not os.path.exists(REFBIN), reason="reference not built")
def test_wbal_metadata_from_reference_sample_drives_develop():
    """WBAL attached by the REFERENCE encoder is parsed from the sample and
    changes our decoded pixels by the requested linear gains; the PRCS
    flags gate it exactly as in the reference (no flags -> no-op)."""
    with tempfile.TemporaryDirectory() as tmp:
        plain = _wbal_sample(1000, 1000, 1000, tmp)
        wb = _wbal_sample(1200, 1000, 800, tmp)
    p = am.develop_params(wb)
    assert p.enabled and p.flags & am.PROCESSING_WHITEBALANCE
    assert np.allclose(p.wb, (1.2, 1.0, 0.8), atol=1e-4)

    a = am.decode_bayer_developed(plain).astype(float)
    b = am.decode_bayer_developed(wb).astype(float)
    mask = (a.max(axis=2) < 60000) & (a.min(axis=2) > 2000)
    ratios = [np.median(b[..., c][mask] / np.maximum(a[..., c][mask], 1))
              for c in range(3)]
    assert np.allclose(ratios, (1.2, 1.0, 0.8), atol=0.02), ratios


def test_prcs_gates_every_stage():
    """Without PROCESSING_ACTIVE nothing applies; each stage needs its
    enable bit (`Common/CFHDMetadataTags.h:26-44`)."""
    def items(flags):
        out = [
            md.MetadataItem("WBAL", b"f",
                            np.asarray([2.0, 1.0, 1.0, 0.5],
                                       "<f4").tobytes()),
            md.MetadataItem("PRCS", b"H", int(flags).to_bytes(4, "little")),
        ]
        return out

    p0 = am.develop_params(b"", items(0))
    assert not p0.enabled
    p1 = am.develop_params(b"", items(am.PROCESSING_ACTIVE))
    assert p1.enabled and p1.wb == (1.0, 1.0, 1.0)   # WB bit not set
    p2 = am.develop_params(
        b"", items(am.PROCESSING_ACTIVE | am.PROCESSING_WHITEBALANCE))
    # payload is (r, g1, g2, b): the second green is skipped
    assert p2.wb == (2.0, 1.0, 0.5)


def test_colm_matrix_applies():
    swap_rb = np.zeros((3, 4), "<f4")
    swap_rb[0, 2] = swap_rb[1, 1] = swap_rb[2, 0] = 1.0
    items = [
        md.MetadataItem("COLM", b"f", swap_rb.tobytes()),
        md.MetadataItem(
            "PRCS", b"H",
            (am.PROCESSING_ACTIVE
             | am.PROCESSING_COLORMATRIX).to_bytes(4, "little")),
    ]
    p = am.develop_params(b"", items)
    assert p.matrix is not None
    assert p.matrix[0, 2] == 1.0 and p.matrix[0, 0] == 0.0


def test_keyframed_control_points():
    """CP3D/CPPR keyframed Active Metadata (`NewControlPoint`,
    keyframes.c:167): control points carry a trigger (UFRM/TIMC) plus
    inner metadata tuples; values interpolate between bracketing points
    at decode time."""
    import numpy as np
    from cineform_tpu import metadata as md
    from cineform_tpu.models import active_metadata as am
    from cineform_tpu.models.intra_host import encode_sample
    from cineform_tpu.utils.testframes import yuy2_frame

    def cp(frame, wb):
        inner = md.Metadata()
        inner.add("WBAL", np.asarray(wb, "<f4").tobytes(), typ=b"f")
        return (b"CP3D" + (0).to_bytes(4, "little") + b"UFRM"
                + (4).to_bytes(3, "little") + b"L"
                + frame.to_bytes(4, "little") + inner.block())

    meta = md.Metadata()
    meta.add("PRCS", (am.PROCESSING_ACTIVE
                      | am.PROCESSING_WHITEBALANCE).to_bytes(4, "little"),
             typ=b"L")
    meta.add("CP3D", cp(0, (1.0, 1.0, 1.0)), typ=b"c")
    meta.add("CP3D", cp(10, (2.0, 1.0, 0.5)), typ=b"c")
    items = md.Metadata.parse_block(meta.block())

    sample = encode_sample(yuy2_frame(64, 48, 1), 64, 48, 4)
    p0 = am.develop_params_at(sample, 0, database=items)
    p5 = am.develop_params_at(sample, 5, database=items)
    p10 = am.develop_params_at(sample, 10, database=items)
    assert p0.wb == (1.0, 1.0, 1.0)
    assert abs(p5.wb[0] - 1.5) < 1e-6 and abs(p5.wb[2] - 0.75) < 1e-6
    assert p10.wb == (2.0, 1.0, 0.5)
    # TIMC triggers parse too
    inner = md.Metadata()
    inner.add("WBAL", np.asarray((3.0, 1.0, 1.0), "<f4").tobytes(), typ=b"f")
    tc = b"00:00:01:00\0"
    cp_t = (b"CPPR" + (0).to_bytes(4, "little") + b"TIMC"
            + len(tc).to_bytes(3, "little") + b"c" + tc
            + inner.block())
    pts = am.parse_control_points(
        md.Metadata.parse_block(md.Metadata().add("CPPR", cp_t, typ=b"c").block()))
    assert pts and pts[0][0] == 24
