"""Pallas VMEM merge-network kernel vs the XLA settle network.

The kernel (`ops/pallas_merge`) evaluates the encoder concat's
monotone-displacement compaction network blockwise in VMEM; these tests
pin bit-exact equivalence with the pure-XLA network (the production
path) in interpret mode, including the halo/blocking edge cases.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cineform_tpu.ops.pallas_merge import merge_network, local_merge


def _xla_reference(val, rem):
    n = val.shape[-1]

    def shift(x, s):
        if s >= n:
            return jnp.zeros_like(x)
        pad = [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x[..., s:], pad + [(0, s)])

    k = 0
    while (1 << k) <= n:
        s = 1 << k
        bit = (rem >> k) & 1
        mv, mr = shift(val, s), shift(rem, s)
        mbit = (mr >> k) & 1
        val = jnp.where(bit == 0, val, 0) | jnp.where(mbit == 1, mv, 0)
        rem = jnp.maximum(jnp.where(bit == 0, rem, 0),
                          jnp.where(mbit == 1, mr - s, 0))
        k += 1
    return val, rem


def _monotone_case(rng, shape):
    """Displacements nondecreasing with {0,1} steps (the concat
    invariant: colliding slots share a target word, bits disjoint)."""
    steps = rng.integers(0, 2, shape)
    rem = jnp.asarray(np.cumsum(steps, axis=-1), jnp.int32)
    val = jnp.asarray(rng.integers(0, 2**32, shape, dtype=np.uint32))
    return val, rem


@pytest.mark.parametrize("n", [4096, 65536 + 17, 198548])
def test_merge_network_matches_xla(n):
    rng = np.random.default_rng(n)
    val, rem = _monotone_case(rng, (2, n))
    rv, rr = _xla_reference(val, rem)
    pv, pr = merge_network(val, rem, lowfirst=True, interpret=True)
    assert (np.asarray(rv) == np.asarray(pv)).all()
    assert (np.asarray(rr) == np.asarray(pr)).all()


def test_merge_network_small_blocks():
    # block smaller than the array → multiple grid steps + halo block
    rng = np.random.default_rng(7)
    val, rem = _monotone_case(rng, (3, 40000))
    rv, rr = _xla_reference(val, rem)
    pv, pr = merge_network(val, rem, lowfirst=True, block_rows=64,
                           interpret=True)
    assert (np.asarray(rv) == np.asarray(pv)).all()
    assert (np.asarray(rr) == np.asarray(pr)).all()


def test_local_merge_partial_levels_compose():
    # kernel levels 0..L-1 then XLA for the rest == full XLA network
    rng = np.random.default_rng(11)
    val, rem = _monotone_case(rng, (1, 30000))
    rv, rr = _xla_reference(val, rem)
    pv, pr = local_merge(val, rem, 10, lowfirst=True, block_rows=64,
                         interpret=True)
    n = val.shape[-1]
    k = 10
    while (1 << k) <= n:
        s = 1 << k
        pad = [(0, 0)] * (pv.ndim - 1)

        def shift(x, s=s):
            return jnp.pad(x[..., s:], pad + [(0, s)]) if s < n \
                else jnp.zeros_like(x)

        bit = (pr >> k) & 1
        mv, mr = shift(pv), shift(pr)
        mbit = (mr >> k) & 1
        pv = jnp.where(bit == 0, pv, 0) | jnp.where(mbit == 1, mv, 0)
        pr = jnp.maximum(jnp.where(bit == 0, pr, 0),
                         jnp.where(mbit == 1, mr - s, 0))
        k += 1
    assert (np.asarray(rv) == np.asarray(pv)).all()
    assert (np.asarray(rr) == np.asarray(pr)).all()
