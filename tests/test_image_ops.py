"""Decoder back-end image ops: develop pipeline, GeoMesh warp, scalers."""

import numpy as np
import pytest

import jax.numpy as jnp

from cineform_tpu.models import intra_host
from cineform_tpu.ops import develop, scaler, warp
from cineform_tpu.utils.testframes import byr4_frame


def _decoded_bayer_channels():
    sample = intra_host.encode_sample_bayer(byr4_frame(320, 240, 1), 320, 240, 4)
    from cineform_tpu.bitstream import parse_sample
    from cineform_tpu.entropy import native as en
    from cineform_tpu.ref import intra as xf
    from cineform_tpu.spec.production import intra_prescale

    s = parse_sample(sample)
    planes = []
    for c in s.channels:
        bands = [dict() for _ in range(3)]
        for b in c.bands:
            widx = 2 - (b.subband - 1) // 3
            pitchw = intra_host.align16_pixels(b.width)
            vals, _ = en.decode_band(b.data, pitchw * b.height, 17,
                                     b.quantization)
            bands[widx][b.band] = vals.reshape(b.height, pitchw)[:, :b.width]
        ll = c.lowpass
        ps = intra_prescale(s.precision)
        for k in (2, 1):
            ll = xf.dwt2d_inverse(ll, bands[k][1], bands[k][2], bands[k][3],
                                  2 if ps[k] == 2 else 1)
        planes.append(xf.dwt2d_inverse(ll, bands[0][1], bands[0][2],
                                       bands[0][3], 1))
    return planes


def test_demosaic_and_develop():
    g, rg, bg, dg = [jnp.asarray(p) for p in _decoded_bayer_channels()]
    rgb = develop.develop(g, rg, bg, dg, wb=(1.2, 1.0, 0.9),
                          gamma=1 / 2.2, sharpen_amount=0.3)
    assert rgb.shape == (240, 320, 3)
    assert float(rgb.min()) >= 0.0 and float(rgb.max()) <= 1.0
    # the image has real content
    assert float(jnp.std(rgb)) > 0.01


def test_color_matrix_and_lut():
    rgb = jnp.asarray(np.random.default_rng(0).random((16, 16, 3)), jnp.float32)
    ident = np.eye(3, dtype=np.float32)
    out = develop.color_matrix(rgb, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-6)
    # identity 3D LUT
    n = 9
    ax = np.linspace(0, 1, n, dtype=np.float32)
    lut = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)
    out = develop.apply_lut3d(rgb, jnp.asarray(lut))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-5)


def test_scopes():
    rgb = jnp.asarray(np.random.default_rng(1).random((32, 48, 3)), jnp.float32)
    h = develop.histogram(rgb)
    assert h.shape == (3, 256) and int(h.sum()) == 3 * 32 * 48
    wf = develop.waveform(rgb)
    assert wf.shape == (48, 256) and int(wf.sum()) == 32 * 48
    vs = develop.vectorscope(rgb)
    assert int(vs.sum()) == 32 * 48


def test_warp_identity_and_rotate():
    img = jnp.asarray(np.random.default_rng(2).random((64, 64, 3)), jnp.float32)
    mesh = jnp.asarray(warp.mesh_identity(64, 64))
    out = warp.warp_bilinear(img, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    # rotating by 360 degrees is identity (up to interpolation)
    mesh = jnp.asarray(warp.mesh_rotate(64, 64, 360.0))
    out = warp.warp_bilinear(img, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_warp_defish_center_fixed():
    img = jnp.asarray(np.random.default_rng(3).random((65, 65, 1)), jnp.float32)
    mesh = jnp.asarray(warp.mesh_defish(65, 65, fov_degrees=100))
    out = warp.warp_bilinear(img, mesh)
    # center pixel maps to itself
    assert abs(float(out[32, 32, 0]) - float(img[32, 32, 0])) < 1e-3


def test_repoint_yaw_shifts_equirect():
    img = jnp.asarray(np.random.default_rng(4).random((32, 64, 1)), jnp.float32)
    # column spacing is 360/(w-1) degrees in this mesh's lon mapping
    mesh = jnp.asarray(warp.mesh_repoint_equirect(32, 64, yaw=360.0 / 63 * 8))
    out = warp.warp_bilinear(img, mesh, wrap_x=True)
    # a pure yaw is a horizontal roll of the equirect image
    rolled = jnp.roll(img, -8, axis=1)
    err = float(jnp.abs(out[8:-8] - rolled[8:-8]).mean())
    assert err < 0.05, err


def test_lanczos_scaler():
    # smooth content survives an up/down roundtrip nearly unchanged
    yy, xx = np.meshgrid(np.linspace(0, 1, 64), np.linspace(0, 1, 96),
                         indexing="ij")
    smooth = np.stack([np.sin(3 * xx + yy), np.cos(2 * yy), xx * yy],
                      axis=-1).astype(np.float32) * 0.4 + 0.5
    img = jnp.asarray(smooth)
    up = scaler.scale_image(img, 128, 192)
    assert up.shape == (128, 192, 3)
    down = scaler.scale_image(up, 64, 96)
    err = float(jnp.abs(down - img).mean())
    assert err < 0.005, err
    # constant image stays constant (kernel rows normalized)
    const = jnp.full((32, 32), 0.5, jnp.float32)
    out = scaler.scale_image(const, 48, 40)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_bilinear_scaler():
    img = jnp.asarray(np.random.default_rng(6).random((40, 40)), jnp.float32)
    out = scaler.scale_bilinear(img, 80, 80)
    assert out.shape == (80, 80)
    assert abs(float(out.mean()) - float(img.mean())) < 0.01


def test_warp_radial_transforms():
    """New geomesh transforms: identity at center, monotone radii, flips."""
    from cineform_tpu.ops import warp as wp
    h, w = 64, 96
    for build in (lambda: wp.mesh_fisheye(h, w, 90),
                  lambda: wp.mesh_orthographic(h, w, 90),
                  lambda: wp.mesh_stereographic(h, w, 90),
                  lambda: wp.mesh_gopro_to_rectilinear(h, w, 1.0),
                  lambda: wp.mesh_gopro_preset(h, w, "hero4", "superview")):
        m = build()
        assert m.shape == (h, w, 2)
        # center maps to (approximately) the center
        cy, cx = h / 2, w / 2
        assert abs(m[h // 2, w // 2, 0] - cy) < 2
        assert abs(m[h // 2, w // 2, 1] - cx) < 2
        assert np.isfinite(m).all()
    m = wp.mesh_identity(h, w)
    f = wp.mesh_flip(m, horizontal=True)
    assert np.allclose(f[..., 1], (w - 1) - m[..., 1])
    s = wp.mesh_scale(m, 2.0, 0.5)
    assert s[..., 1].max() <= w  # x compressed
    p = wp.mesh_pan(m, 3.0, -2.0)
    assert np.allclose(p[..., 1] - m[..., 1], 3.0)
    st = wp.mesh_horizontal_stretch_poly(m, 0.21, 0.0, 0.0)
    # center row unchanged, top/bottom rows stretched toward center
    assert np.allclose(st[h // 2, :, 1], m[h // 2, :, 1], atol=0.1)
    assert (st[0, -1, 1] < m[0, -1, 1])
