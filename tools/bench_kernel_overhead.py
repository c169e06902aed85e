"""Probe: is the device decode bound by per-kernel overhead or real work?

Chained-in-program methodology (data dependence between iterations, one
scalar fetched).  Compares one big fused elementwise kernel against the
same FLOPs split across many small kernels via optimization barriers.
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N = 1 << 20
    K = 8
    cs = sorted(np.random.default_rng(0).integers(0, 1 << 26, 256).tolist())

    def telescope(x):
        acc = jnp.zeros_like(x)
        for j, c in enumerate(cs):
            acc = acc + jnp.where(x >= c, jnp.int32(j), 0)
        return acc

    @jax.jit
    def fused(x0):
        def body(_, carry):
            acc, x = carry
            y = telescope(x)
            return acc + y[0], x ^ (y & 1)
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), x0))
        return acc

    @jax.jit
    def split(x0):
        def body(_, carry):
            acc, x = carry
            acc2 = jnp.zeros_like(x)
            for j, c in enumerate(cs):
                acc2 = acc2 + jnp.where(x >= c, jnp.int32(j), 0)
                if j % 4 == 3:
                    # barrier every 4 terms -> ~64 kernels
                    acc2 = jax.lax.optimization_barrier(acc2)
            return acc + acc2[0], x ^ (acc2 & 1)
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), x0))
        return acc

    x = jnp.asarray(np.random.default_rng(1).integers(
        0, 1 << 26, N, dtype=np.int32))
    for name, fn in (("fused-1kernel", fused), ("split-64kernel", split)):
        t0 = time.perf_counter()
        float(fn(x))
        print(f"{name} compile: {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            float(fn(x))
        ms = (time.perf_counter() - t0) / (iters * K) * 1000
        print(f"{name}: {ms:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
