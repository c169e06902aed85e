"""Probe: which vectorized 256-way classification form is fastest on TPU.

Chained methodology.  Forms: linear telescope (dependent adds), balanced
select tree (like entropy/device band_codes), pairwise-summed telescope
(breaks the dependence chain), f32 telescope.
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 1 << 20
    K = 8
    rng = np.random.default_rng(0)
    cs = sorted(int(x) for x in rng.integers(1, 1 << 26, 255))
    leaves = [int(x) for x in rng.integers(0, 1 << 24, 256)]
    dl = [leaves[0]] + [leaves[j] - leaves[j - 1] for j in range(1, 256)]

    def telescope(x):
        acc = jnp.full(x.shape, dl[0], jnp.int32)
        for j in range(1, 256):
            acc = acc + jnp.where(x >= cs[j - 1], jnp.int32(dl[j]), 0)
        return acc

    def telescope_tree_sum(x):
        terms = [jnp.full(x.shape, dl[0], jnp.int32)]
        terms += [jnp.where(x >= cs[j - 1], jnp.int32(dl[j]), 0)
                  for j in range(1, 256)]
        while len(terms) > 1:
            nxt = [a + b for a, b in zip(terms[0::2], terms[1::2])]
            if len(terms) % 2:
                nxt.append(terms[-1])
            terms = nxt
        return terms[0]

    def seltree(x):
        def t(lo, hi):
            if hi - lo == 1:
                return jnp.int32(leaves[lo])
            mid = (lo + hi) // 2
            return jnp.where(x < cs[mid - 1] if mid - 1 < len(cs)
                             else x < (1 << 26), t(lo, mid), t(mid, hi))
        return t(0, 256)

    def telescope_f32(x):
        xf = x.astype(jnp.float32)
        acc = jnp.full(x.shape, float(dl[0]), jnp.float32)
        for j in range(1, 256):
            acc = acc + jnp.where(xf >= float(cs[j - 1]),
                                  jnp.float32(dl[j]), 0.0)
        return acc.astype(jnp.int32)

    x0 = jnp.asarray(rng.integers(0, 1 << 26, N, dtype=np.int32))
    for name, f in (("telescope", telescope),
                    ("telescope-treesum", telescope_tree_sum),
                    ("seltree", seltree),
                    ("telescope-f32", telescope_f32)):
        @jax.jit
        def chained(x, f=f):
            def body(_, carry):
                acc, cur = carry
                y = f(cur)
                return acc + y[0], cur ^ (y & 1)
            acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), x))
            return acc
        t0 = time.perf_counter()
        float(chained(x0))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            float(chained(x0))
        ms = (time.perf_counter() - t0) / (3 * K) * 1000
        print(f"{name}: {ms:.3f} ms/iter (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
