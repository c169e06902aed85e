"""Honest per-stage encode timing (chained in-program, outputs consumed).

Stages: forward DWT only; + band codes (bits+sizes consumed);
+ tree_pack (chunk buffers consumed); + concat (full payload consumed).
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cineform_tpu.entropy import device as edev
    from cineform_tpu.models import intra_host
    from cineform_tpu.models.intra import IntraCodec
    from cineform_tpu.utils.testframes import yuy2_frame

    w, h, batch, K = 1920, 1080, 8, 8
    base = np.frombuffer(yuy2_frame(w, h, 1), np.uint8).reshape(h, 2 * w)
    frames = np.stack([np.roll(base, i, axis=0) for i in range(batch)])
    codec = IntraCodec(width=w, height=h, quality=4)
    t17 = edev.encode_tables(17)

    def stage_fn(stage):
        def run(cur):
            coeffs = codec.forward(cur)
            s = jnp.int32(0)
            for lowpass, bands in coeffs:
                s = s + lowpass[:, 0, 0].astype(jnp.int32).sum()
                for bs in bands:
                    hh, ww = bs[0].shape[-2:]
                    pitch = intra_host.align16_pixels(ww)
                    trio = jnp.stack(bs, axis=1)
                    trio = jnp.pad(trio, ((0, 0), (0, 0), (0, 0),
                                          (0, pitch - ww)))
                    flat = trio.reshape(trio.shape[0], 3, hh * pitch)
                    if stage == "forward":
                        s = s + flat[..., ::1001].sum()
                        continue
                    npad = -(-flat.shape[-1] // 256) * 256
                    if npad != flat.shape[-1]:
                        flat = jnp.pad(flat, ((0, 0), (0, 0),
                                              (0, npad - flat.shape[-1])),
                                       constant_values=1)
                    bits, sizes = edev.band_codes(flat, t17)
                    if stage == "codes":
                        s = s + (bits[..., ::501].astype(jnp.int32).sum()
                                 + sizes.sum())
                        continue
                    nt = npad // 256
                    bufs, lens, ovf = edev.tree_pack(
                        bits.reshape(*bits.shape[:-1], nt, 256),
                        sizes.reshape(*sizes.shape[:-1], nt, 256),
                        cap_bits_per_elem=12)
                    if stage == "treepack":
                        s = s + (bufs[..., ::97].astype(jnp.int32).sum()
                                 + lens.sum())
                        continue
                    out_words = max(8 * flat.shape[-1], 64) // 32
                    words, total = edev._concat_chunks(bufs, lens, out_words)
                    s = s + (words[..., ::257].astype(jnp.int32).sum()
                             + total.sum())
            return s

        @jax.jit
        def chained(fr):
            def body(_, carry):
                acc, cur = carry
                s = run(cur)
                return acc + s, jnp.bitwise_xor(
                    cur, (s & 1).astype(jnp.uint8))
            acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), fr))
            return acc
        return chained

    dev = jax.device_put(jnp.asarray(frames))
    for stage in ("forward", "codes", "treepack", "concat"):
        f = stage_fn(stage)
        t0 = time.perf_counter()
        float(f(dev))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2):
            float(f(dev))
        ms = (time.perf_counter() - t0) / (2 * K * batch) * 1000
        print(f"{stage}: {ms:.3f} ms/frame (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
