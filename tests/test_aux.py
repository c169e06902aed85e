"""Aux subsystems: DPX file I/O, .cflook LUT database, keyframed metadata,
burn-in overlays (the draw.c / lutpath.cpp / keyframe analogs)."""

import os

import numpy as np

from cineform_tpu.ops.overlay import (burn_text, burn_timecode,
                                      render_histogram_overlay,
                                      render_waveform_overlay, text_mask)
from cineform_tpu.utils.dpx import read_dpx, write_dpx, pack_dpx0, unpack_dpx0
from cineform_tpu.utils.keyframes import Timeline, Track
from cineform_tpu.utils.lutpath import Look, LookDatabase, look_crc


def test_dpx_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 1024, (48, 64, 3)).astype(np.uint16)
    p = str(tmp_path / "t.dpx")
    write_dpx(p, rgb)
    back = read_dpx(p)
    assert np.array_equal(back, rgb)


def test_dpx0_packing_matches_thumbnail_convention():
    rgb = np.array([[[1023, 0, 512]]], np.uint16)
    w = pack_dpx0(rgb)
    assert int(w.astype(np.uint32)[0, 0]) == (1023 << 22) | (512 << 2)
    assert np.array_equal(unpack_dpx0(w.astype(np.uint32)), rgb)


def test_cflook_database_roundtrip(tmp_path):
    n = 16
    ax = np.linspace(0, 1, n, dtype=np.float32)
    lut = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)
    lut = lut[..., ::-1] ** 1.2          # a non-identity look
    db = LookDatabase(str(tmp_path))
    look = Look(lut=lut.astype(np.float32), name="test look")
    crc = db.store(look)
    assert os.path.exists(db.path_for(crc))
    back = db.load(crc)
    assert back is not None and back.name == "test look"
    assert np.allclose(back.lut, look.lut)
    assert db.load(0xDEADBEEF) is None
    assert crc == look_crc(look)


def test_cflook_apply(tmp_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    n = 17
    ax = np.linspace(0, 1, n, dtype=np.float32)
    lut = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)
    db = LookDatabase(str(tmp_path))
    crc = db.store(Look(lut=lut))        # identity LUT
    rgb = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
    out = np.asarray(db.apply(crc, rgb))
    assert np.allclose(out, rgb, atol=1e-5)


def test_keyframe_tracks():
    t = Track([0, 10], [0.0, 1.0])
    assert t.sample(-5) == 0.0 and t.sample(15) == 1.0
    assert abs(t.sample(5) - 0.5) < 1e-12
    ts = Track([0, 10, 20], [0.0, 1.0, 0.0], interpolation="spline")
    assert abs(ts.sample(10) - 1.0) < 1e-12
    assert ts.sample(5) > 0.4            # smooth rise
    tl = Timeline()
    tl.set_keyframes("exposure", [0, 100], [1.0, 2.0])
    tl.set_keyframes("matrix", [0, 100], [np.eye(3), 2 * np.eye(3)])
    at50 = tl.at(50)
    assert abs(at50["exposure"] - 1.5) < 1e-12
    assert np.allclose(at50["matrix"], 1.5 * np.eye(3))


def test_burn_text_and_scopes():
    frame = np.full((240, 320), 100, np.uint8)
    out = burn_text(frame, "TC 00:01:02:03", 10, 10)
    assert (out == 235).sum() > 100          # glyph pixels lit
    assert (out == 16).sum() > 20            # drop shadow present
    assert np.array_equal(frame, np.full((240, 320), 100, np.uint8))
    out2 = burn_timecode(frame, "00:00:01:00")
    assert (out2 == 235).sum() > 100
    h = render_histogram_overlay(frame)
    assert (h != frame).sum() > 100
    w = render_waveform_overlay(frame)
    assert (w != frame).sum() > 100
    assert text_mask("A", scale=1).shape == (7, 6)


def test_band_stats():
    from cineform_tpu.utils.stats import BandStats
    rng = np.random.default_rng(0)
    band = rng.integers(-4, 5, (64, 64)) * (rng.random((64, 64)) < 0.2)
    st = BandStats()
    st.add(band.astype(np.int32))
    assert st.count == 64 * 64
    assert 0.5 < st.zero_fraction() < 1.0
    assert "entropy" in st.report()


def test_bandfile_roundtrip(tmp_path):
    from cineform_tpu.utils.bandfile import write_bandfile, read_bandfile
    rng = np.random.default_rng(1)
    bands = [(0, 2, 1, rng.integers(-100, 100, (30, 40)).astype(np.int16)),
             (1, 0, 3, rng.integers(-5, 5, (12, 16)).astype(np.int16))]
    p = str(tmp_path / "x.band")
    write_bandfile(p, bands)
    back = read_bandfile(p)
    for (a, b) in zip(bands, back):
        assert a[:3] == b[:3] and np.array_equal(a[3], b[3])


def test_nv12_and_r210_outputs():
    import os
    from cineform_tpu.models.intra_host import decode_sample_to
    G = os.path.join(os.path.dirname(__file__), "golden", "samples")
    sample = open(os.path.join(G, "s_320x240_q4_p1.cfhd"), "rb").read()
    nv = decode_sample_to(sample, "NV12")
    assert len(nv) == 320 * 240 * 3 // 2
    for f in ("r210", "DPX0", "RG30"):
        assert len(decode_sample_to(sample, f)) == 320 * 240 * 4


def test_cfhd_tool_cli(tmp_path):
    """The TestCFHD-analog CLI drives encode/decode/info end to end."""
    import subprocess, sys
    from cineform_tpu.utils.testframes import yuy2_frame

    raw = tmp_path / "f.yuy2"
    raw.write_bytes(yuy2_frame(320, 240, 1))
    cf = tmp_path / "f.cfhd"
    out = tmp_path / "o.yuy2"
    env = {"PATH": os.environ.get("PATH", ""), "JAX_PLATFORMS": "cpu",
           "HOME": os.environ.get("HOME", "/root")}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tool = os.path.join(root, "tools", "cfhd_tool.py")
    for args in ([ "encode", str(raw), str(cf), "--width", "320", "--height", "240"],
                 ["decode", str(cf), str(out)],
                 ["info", str(cf)],
                 ["fuzz", "--trials", "5"]):
        r = subprocess.run([sys.executable, tool] + args, capture_output=True,
                           text=True, env=env, cwd=root)
        assert r.returncode == 0, (args, r.stdout, r.stderr)
    assert len(out.read_bytes()) == 320 * 240 * 2


def test_overlay_grid_subtitle_logo():
    """Remaining draw.c burn-in objects: grids (draw.c:3988), subtitles,
    and PNG logo/watermark compositing (draw.c:109-494)."""
    import struct
    import zlib

    import numpy as np

    from cineform_tpu.ops.overlay import (burn_subtitle, composite_image,
                                          render_grid_overlay)
    from cineform_tpu.utils.png import read_png

    g = render_grid_overlay(np.zeros((48, 64), np.uint8), 3, 3)
    assert (g == 235).sum() >= 48 * 2 + 64 * 2

    f = np.zeros((48, 128), np.uint8)
    s = burn_subtitle(f, "SUB", scale=1)
    assert (s == 235).any()
    assert (s[:20] == 0).all()      # top untouched

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (8, 12, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(8))

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 12, 8, 8, 6, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (read_png(png) == img).all()
    frame = np.full((48, 64, 3), 100, np.uint8)
    out = composite_image(frame, img, 4, 4, 1.0)
    opaque = img[..., 3] == 255
    if opaque.any():
        ys, xs = np.nonzero(opaque)
        assert (out[4 + ys[0], 4 + xs[0]] == img[ys[0], xs[0], :3]).all()


def test_tools_scopes_wp13_integer_exact():
    """tools_scopes_wp13 matches HistogramLine's WP13 integer math
    (`Codec/decoder.c:6314-6400`) against a direct scalar
    re-computation.  NOTE ON PARITY SCOPE: the reference release ships
    with _GRAPHICS 0 (`Codec/config.h:29`), compiling out PaintFrame /
    DoHistogramWork / draw.c entirely, so the binary can neither render
    burn-ins nor collect scopes — pixel goldens are impossible against
    it and this whole subsystem is a functional superset here.  The
    collection math is pinned to the source spec instead."""
    import numpy as np

    from cineform_tpu.ops.develop import tools_scopes_wp13

    rng = np.random.default_rng(7)
    h, w = 16, 720          # forces step=2, waveformWidth=360
    rgb13 = rng.integers(-200, 8400, size=(h, w, 3), dtype=np.int32)
    hist, wave, scope, wfw = tools_scopes_wp13(rgb13)
    assert wfw == 360
    ehist = np.zeros((3, 256), np.int64)
    ewave = np.zeros((360, 3, 256), np.int64)
    escope = np.zeros((256, 256), np.int64)
    for y in range(h):
        for pos in range(360):
            x = pos * 2
            c8 = [min(max(int(rgb13[y, x, c]) >> 5, 0), 255)
                  for c in range(3)]
            for c in range(3):
                ehist[c][c8[c]] += 1
                ewave[pos][c][c8[c]] += 1
            R, G, B = c8
            U = ((-827 * R - 2769 * G + 3596 * B) >> 13) + 128
            V = ((3596 * R - 3269 * G - 328 * B) >> 13) + 128
            U = min(max(U, 0), 255)
            V = min(max(V, 0), 255)
            escope[U][V] += 1
    assert (np.asarray(hist) == ehist).all()
    assert (np.asarray(wave) == ewave).all()
    assert (np.asarray(scope) == escope).all()
