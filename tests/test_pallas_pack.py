"""The Pallas VMEM bit-pack kernel matches the XLA tree exactly.

(Interpreter mode on CPU; the real-chip equivalence and the perf
comparison vs the XLA tree are documented in ops/pallas_pack.py and
entropy/device.py.)
"""

import numpy as np
import pytest


@pytest.mark.parametrize("seed,density", [(0, 0.2), (1, 0.9), (2, 0.0)])
def test_pallas_chunk_pack_matches_xla_tree(seed, density):
    import jax
    import jax.numpy as jnp

    from cineform_tpu.entropy import device as edev
    from cineform_tpu.ops.pallas_pack import chunk_pack

    rng = np.random.default_rng(seed)
    t = edev.encode_tables(17)
    vals = rng.integers(-200, 200, size=(2, 4 * 256), dtype=np.int32)
    vals[rng.random(vals.shape) >= density] = 0
    bits, sizes = jax.jit(lambda v: edev.band_codes(v, t, 256))(
        jnp.asarray(vals))
    b4 = jnp.asarray(np.asarray(bits).reshape(2, 4, 256))
    s4 = jnp.asarray(np.asarray(sizes).reshape(2, 4, 256))
    wt, lt, ot = jax.jit(
        lambda b, s: edev.tree_pack(b, s, cap_bits_per_elem=12))(b4, s4)
    wp, lp, op = chunk_pack(b4, s4, interpret=True)
    np.testing.assert_array_equal(np.asarray(wt), np.asarray(wp))
    np.testing.assert_array_equal(np.asarray(lt), np.asarray(lp))
    np.testing.assert_array_equal(np.asarray(ot), np.asarray(op))
