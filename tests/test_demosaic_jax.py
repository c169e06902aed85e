"""Device (JAX) RAW demosaic/develop: bit-identical to the pinned host
model (which is byte-exact vs the reference binary)."""

import os

import numpy as np
import pytest

HERE = os.path.dirname(__file__)


def _golden(name):
    with open(os.path.join(HERE, "golden", "samples", name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name,matrix", [
    ("byr4_320x240_q4_p1", None),
    ("byr4_colm_320x240_q4",
     [[0.9, 0.08, 0.02, 0.0], [0.05, 0.9, 0.05, 0.01],
      [0.02, 0.08, 0.9, 0.0]]),
])
def test_device_demosaic_matches_host(name, matrix):
    """The jitted demosaic_develop program (un-difference, 5x5 debayer
    with exact borders, H+V sharpening, 1D-LUT develop) reproduces the
    host model bit-for-bit — and therefore the reference binary."""
    import jax.numpy as jnp

    from cineform_tpu.models import intra_host
    from cineform_tpu.ops import demosaic_jax as dj
    from cineform_tpu.ref import demosaic as dm

    sample = _golden(name + ".cfhd")
    G, RG, BG, GD = intra_host.decode_sample_bayer_row16u(sample)
    c2l, l2c, lcm = dj.develop_tables(matrix)
    out = np.asarray(dj.demosaic_develop(
        jnp.asarray(G), jnp.asarray(RG), jnp.asarray(BG), jnp.asarray(GD),
        c2l, l2c, lcm))

    rgb = dm.demosaic_raw_rg48(G, RG, BG, GD)
    m = np.eye(3, 4) if matrix is None else np.asarray(matrix)
    want = np.clip(dm.apply_active_metadata_matrix(rgb, m) << 3,
                   0, 65535).astype(np.uint16)
    assert (out == want).all()


def test_device_demosaic_batched():
    """vmap over frames: the program batches like the YUV device codec."""
    import jax
    import jax.numpy as jnp

    from cineform_tpu.models import intra_host
    from cineform_tpu.ops import demosaic_jax as dj

    sample = _golden("byr4_320x240_q4_p1.cfhd")
    G, RG, BG, GD = intra_host.decode_sample_bayer_row16u(sample)
    c2l, l2c, lcm = dj.develop_tables(None)
    single = np.asarray(dj.demosaic_develop(
        jnp.asarray(G), jnp.asarray(RG), jnp.asarray(BG), jnp.asarray(GD),
        c2l, l2c, lcm))
    batch = jax.vmap(
        lambda g, rg, bg, gd: dj.demosaic_develop(g, rg, bg, gd,
                                                  c2l, l2c, lcm))(
        jnp.stack([jnp.asarray(G)] * 2), jnp.stack([jnp.asarray(RG)] * 2),
        jnp.stack([jnp.asarray(BG)] * 2), jnp.stack([jnp.asarray(GD)] * 2))
    assert (np.asarray(batch)[0] == single).all()
    assert (np.asarray(batch)[1] == single).all()
