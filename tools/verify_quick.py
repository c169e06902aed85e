#!/usr/bin/env python3
"""Quick end-to-end verification drive (the /verify skill's flows 1, 2, 4).

Runs on the CPU backend with a virtual 8-device mesh; finishes in a few
minutes warm-cache.  Exits nonzero on any failure.

  1. WaveletDemo golden flow: PSNR == 54.386 dB vs the reference gate.
  2. Codec roundtrip: device encode -> CFHD sample -> device decode,
     byte-identical to the host decode path, PSNR sanity.
  3. __graft_entry__: entry() compiles + runs; dryrun_multichip(8).
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jaxcache-cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np  # noqa: E402


def flow1_wavelet_demo():
    from cineform_tpu.ref import scalar
    from cineform_tpu.utils.glibc_random import glibc_rand_sequence
    from cineform_tpu.utils.metrics import psnr
    from cineform_tpu.utils.pgm import read_pgm

    img = read_pgm("/root/reference/data/testpatt.pgm")
    h, w = img.shape
    depth = 12
    noise = glibc_rand_sequence(w * h) & ((1 << (depth - 8)) - 1)
    deep = ((img.astype(np.int64) << (depth - 8))
            + noise.reshape(h, w)).astype(np.int32)
    co = scalar.forward_pyramid(deep, levels=3, bitdepth=depth)
    rec = scalar.inverse_pyramid(co, levels=3, bitdepth=depth)
    got = psnr(rec, deep, depth)
    assert abs(got - 54.386) < 0.2, f"PSNR {got:.3f} != 54.386"
    print(f"flow1 WaveletDemo golden: PSNR {got:.3f} dB  OK")


def flow2_codec_roundtrip():
    from cineform_tpu.models.intra import IntraCodec
    from cineform_tpu.utils.testframes import yuy2_frame

    w, h = 256, 128
    codec = IntraCodec(width=w, height=h, quality=4)
    base = np.frombuffer(yuy2_frame(w, h, 1), np.uint8).reshape(h, 2 * w)
    frames = np.stack([np.roll(base, i, axis=0) for i in range(2)])
    samples = codec.encode_batch_device(frames)
    dev = codec.decode_batch_device(samples)
    host = codec.decode_batch(samples)
    assert np.array_equal(dev, host), "device decode != host decode"
    mse = np.mean((dev.astype(np.float64) - frames) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 40, f"roundtrip PSNR {psnr:.1f} too low"
    print(f"flow2 codec roundtrip: device==host, PSNR {psnr:.1f} dB  OK")


def flow4_graft_entry():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.block_until_ready(fn(*args))
    del out
    g.dryrun_multichip(8)
    print("flow4 __graft_entry__: entry() + dryrun_multichip(8)  OK")


if __name__ == "__main__":
    flow1_wavelet_demo()
    flow2_codec_roundtrip()
    flow4_graft_entry()
    print("verify_quick: ALL OK")
