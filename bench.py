#!/usr/bin/env python3
"""Benchmark: 1080p YUY2 CFHD encode+decode throughput per TPU chip.

Primary metric: the FULL on-device encode + decode round trip —
encode: YUY2 frames in HBM -> unpack -> 3-level production 2-6 DWT with
fused quantization -> zero-run + Huffman entropy coding -> packed CFHD
band payloads in HBM (`IntraCodec.forward_packed`);
decode: band payload rows in HBM -> TPU band entropy decode
(`entropy/device_decode`) -> dequant + inverse DWT + dither + YUY2 pack
(`IntraCodec._decode_device_program`).  Both directions are every bit of
the reference's hot path (`Codec/encoder.c:1897-5702`,
`Codec/decoder.c:11584/19532`) executing on the chip, and both are
byte-exact vs the reference SDK (tests/test_intra_jax.py,
tests/test_entropy_device_decode.py).  The per-frame combined time adds
the measured host tails (sample assembly on encode, header walk + row
build on decode), which a production host pipelines across cores.

Details also report the encode-only rate, the transform-only roundtrip,
host C++ entropy stage times (1 core), compression ratio + PSNR on the
dense noise content AND on the smooth gradient content (the QBist-like
patterns the reference README benches quote ratios for), and the device
encoder's capacity-overflow fallback rate on both.

Note on environment: this bench host reaches the chip through a tunnel
with ~30ms+ RTT and ~0.2 MB/s download, so every timed loop chains K
iterations with a data dependence inside one jitted program and fetches
a single scalar; sample bytes stay in HBM (in production a local PCIe
host drains them at GB/s).  Independent per-call dispatch measurements
are invalid on this tunnel (after any device->host pull, per-dispatch
latency degrades ~100x for a while).

Prints one JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Progressively-filled detail dict: on any failure we emit whatever stages
# completed as a partial JSON result instead of a traceback (the round-3
# driver run lost its number to a single backend-init exception).
DETAIL: dict = {}


def _init_backend(max_wait_s: float = 600.0):
    """Initialize the JAX backend, retrying with backoff for up to
    ``max_wait_s`` (the TPU tunnel can be transiently UNAVAILABLE)."""
    import jax

    deadline = time.monotonic() + max_wait_s
    delay = 10.0
    attempt = 0
    while True:
        attempt += 1
        try:
            devs = jax.devices()
            DETAIL["backend_init_attempts"] = attempt
            return devs
        except RuntimeError as e:
            if time.monotonic() + delay > deadline:
                raise RuntimeError(
                    f"backend unavailable after {attempt} attempts over "
                    f"{max_wait_s:.0f}s: {e}") from e
            time.sleep(delay)
            delay = min(delay * 2, 120.0)


def main() -> None:
    _init_backend()
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: a retried/rerun bench must not pay
    # (or re-risk) the remote AOT compiles again.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cineform_tpu.models.intra import IntraCodec
    from cineform_tpu.utils.testframes import yuy2_frame

    w, h, quality = 1920, 1080, 4  # FILMSCAN1, the reference benchmark config
    batch = 8

    base = np.frombuffer(yuy2_frame(w, h, 1), dtype=np.uint8).reshape(h, 2 * w)
    frames = np.stack([np.roll(base, i, axis=0) for i in range(batch)])

    codec = IntraCodec(width=w, height=h, quality=quality)

    @jax.jit
    def roundtrip_mse(frames):
        out = codec.inverse(codec.dequantize(codec.forward(frames)))
        err = (out.astype(jnp.float32) - frames.astype(jnp.float32)) ** 2
        return jnp.mean(err)

    # Timing scheme: K async dispatches of one jitted step, chained by a
    # scalar salt (a data dependence so executions can't be elided or
    # reordered), with ONE value fetch as the barrier.  The former
    # fori_loop-chained programs deterministically SIGKILLed the
    # tunnel's remote AOT compiler (13 MB MLIR; BENCH_r03/r04 logs),
    # while the underlying step programs compile fine standalone.
    K = 16

    # full encode: transform + quant + entropy coding + bit packing in HBM.
    # Staged (forward + six entropy programs + tiny salt/reduce programs)
    # because the fused forward_packed program's optimized MLIR (~13 MB)
    # SIGKILLs this environment's remote AOT compiler; the stages dispatch
    # asynchronously and run back-to-back on the chip.
    @jax.jit
    def _salt_frames(fr, salt):
        return fr.at[0, 0, 0].set(salt.astype(jnp.uint8))

    @jax.jit
    def _encode_reduce(lows, nbits_list):
        s = jnp.int32(0)
        for lowpass in lows:
            s = s + lowpass[:, 0, 0].astype(jnp.int32).sum()
        for nbits in nbits_list:
            s = s + nbits[:, 0].astype(jnp.int32).sum()
        return s

    def encode_step(fr, salt):
        fr = _salt_frames(fr, salt)
        out = codec.forward_packed_staged(fr)
        lows = tuple(lowpass for lowpass, _ in out)
        nbs = tuple(nbits for _, packed in out for _, nbits, _ in packed)
        return _encode_reduce(lows, nbs)

    # transform-only roundtrip (round-1 metric, for comparison)
    @jax.jit
    def roundtrip_step(fr, salt):
        fr = fr.at[0, 0, 0].set(salt.astype(jnp.uint8))
        out = codec.inverse(codec.dequantize(codec.forward(fr)))
        return out[0, 0, 0].astype(jnp.int32)

    def timed_chain(step, *args, iters=2):
        """Dispatch K chained steps per iter; fetch one scalar at the end."""
        t0 = time.perf_counter()
        for _ in range(iters):
            s = jnp.int32(0)
            for _k in range(K):
                s = step(*args, s)
            float(s)
        return (time.perf_counter() - t0) / (iters * K * batch) * 1000

    # full decode: band payload rows -> entropy decode -> inverse -> YUY2
    # (class tensors from real encoded samples of this content)
    t0 = time.perf_counter()
    samples = codec.encode_batch_device(frames)
    encode_path_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    pays, nchs, qns, lins, lp, fb = codec._decode_rows_args(samples)
    parse_ms = (time.perf_counter() - t0) / batch * 1000
    assert not fb, f"bench samples fell back: {fb}"

    # Staged like the encode step: the 6 per-class entropy decode
    # programs + the fused inverse dispatch back-to-back; fusing them
    # into one traced program compiles 4x slower (and risks the remote
    # compiler's memory ceiling).
    @jax.jit
    def _salt_lp(lp0, salt):
        return lp0 + (salt & 1)

    @jax.jit
    def _decode_reduce(out):
        return out[:, 0, 0].astype(jnp.int32).sum()

    def decode_step(pays, nchs, qns, lins, lp, salt):
        # chain via the lowpass plane (payload bytes must stay intact)
        lp = (_salt_lp(lp[0], salt),) + tuple(lp[1:])
        out, ovf = codec._decode_device_program(
            pays, nchs, qns, lins, lp, batch, 0)
        return _decode_reduce(out)

    dev_frames = jax.device_put(jnp.asarray(frames))
    mse = float(roundtrip_mse(dev_frames))    # quality stat + warm
    float(encode_step(dev_frames, jnp.int32(0)))       # compile + warm
    float(roundtrip_step(dev_frames, jnp.int32(0)))
    float(decode_step(pays, nchs, qns, lins, lp, jnp.int32(0)))

    enc_ms = timed_chain(encode_step, dev_frames)
    DETAIL["full_encode_ms_per_frame"] = round(enc_ms, 3)
    DETAIL["full_encode_fps"] = round(1000.0 / enc_ms, 1)
    rt_ms = timed_chain(roundtrip_step, dev_frames)
    DETAIL["transform_roundtrip_ms_per_frame"] = round(rt_ms, 3)
    dec_ms = timed_chain(decode_step, pays, nchs, qns, lins, lp)
    DETAIL["full_decode_ms_per_frame"] = round(dec_ms, 3)

    encode_fps = 1000.0 / enc_ms
    psnr = 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else 99.0

    # compression ratio + device-encode overflow rate from the device bit
    # counts (scalar-sized fetches), for the dense noise content and the
    # smooth gradient content (QBist-like; comparable to the reference
    # README's 8.7-21.8:1 ratios on algorithmic patterns)
    @jax.jit
    def _stats_reduce(nbs, ovfs):
        bits = jnp.stack([b.sum() for b in nbs])
        novf = sum(o.astype(jnp.int32).sum() for o in ovfs)
        return bits, novf

    def stats_fn(f):
        out = codec.forward_packed_staged(f)
        nbs = tuple(p[1] for _, packed in out for p in packed)
        ovfs = tuple(p[2] for _, packed in out for p in packed)
        return _stats_reduce(nbs, ovfs)
    lowpass_bytes = sum(2 * (h >> 3) * ((w if c == 0 else w // 2) >> 3)
                        for c in range(3))

    def content_stats(f):
        bits, novf = stats_fn(f)
        total_bits = int(np.asarray(jax.device_get(bits)).sum()) / batch
        sample_bytes = total_bits / 8 + lowpass_bytes + 1024  # + headers
        return (2 * w * h) / sample_bytes, int(novf)

    ratio, novf_noise = content_stats(dev_frames)
    smooth_base = np.frombuffer(yuy2_frame(w, h, 0),
                                dtype=np.uint8).reshape(h, 2 * w)
    smooth = jax.device_put(jnp.asarray(np.stack(
        [np.roll(smooth_base, i, axis=0) for i in range(batch)])))
    ratio_smooth, novf_smooth = content_stats(smooth)
    mse_smooth = float(roundtrip_mse(smooth))
    psnr_smooth = (10 * np.log10(255.0 ** 2 / mse_smooth)
                   if mse_smooth > 0 else 99.0)

    # host-side stages, measured on host data (the tunnel would otherwise
    # dominate): C++ entropy encode/decode per frame, and sample assembly
    from cineform_tpu.models import intra_host
    from cineform_tpu.ref import intra as xf
    from cineform_tpu.spec.production import IntraParams
    from cineform_tpu.entropy.native import decode_band, encode_band_bytes

    params = IntraParams(width=w, height=h, quality=quality)
    planes = xf.unpack_yuy2(yuy2_frame(w, h, 0), w, h, params.precision)
    chans = [intra_host.transform_channel(p, params, ch)
             for ch, p in enumerate(planes)]
    bands = []
    for c in chans:
        for bs in c.bands:
            for b in bs:
                bh, bw = b.shape
                pw = intra_host.align16_pixels(bw)
                pb = np.zeros((bh, pw), np.int32)
                pb[:, :bw] = b
                bands.append(np.ascontiguousarray(pb))
    payloads = [encode_band_bytes(b, codeset=17) for b in bands]
    t0 = time.perf_counter()
    for _ in range(5):
        for b in bands:
            encode_band_bytes(b, codeset=17)
    entropy_enc_ms = (time.perf_counter() - t0) / 5 * 1000
    t0 = time.perf_counter()
    for _ in range(5):
        for b, p in zip(bands, payloads):
            decode_band(p, b.size, codeset=17, quant=1)
    entropy_dec_ms = (time.perf_counter() - t0) / 5 * 1000

    # assembly tail: band-payload finishing + tag/value sample writing
    from cineform_tpu.entropy.device import finish_band_bytes
    fake_words = [np.frombuffer(p + b"\0" * (-len(p) % 4),
                                dtype=">u4").astype(np.uint32)
                  for p in payloads]
    fake_bits = [len(p) * 8 - 40 for p in payloads]
    t0 = time.perf_counter()
    for _ in range(5):
        for fw, fb in zip(fake_words, fake_bits):
            finish_band_bytes(fw, fb, 17)
        ch_objs = []
        i = 0
        for ch, c in enumerate(chans):
            pl = []
            for bs in c.bands:
                pl.append(tuple(payloads[i + j] for j in range(3)))
                i += 3
            ch_objs.append(intra_host.EncodedChannel(
                lowpass=c.lowpass, bands=c.bands,
                quants=params.band_quant(ch), payloads=pl))
        intra_host.write_sample(ch_objs, params, 1, None)
    assembly_ms = (time.perf_counter() - t0) / 5 * 1000

    combined_ms = enc_ms + assembly_ms + parse_ms + dec_ms
    combined_fps = 1000.0 / combined_ms
    # reference combined: async pools amortize the sync per-frame times
    # (README.md:62-92) over 8 cores: (9.3 + 5.4)/8 = 1.84 ms/frame
    ref_combined_fps = 1000.0 / ((9.3 + 5.4) / 8)

    DETAIL.update({
        "full_encode_ms_per_frame": round(enc_ms, 3),
        "full_encode_fps": round(encode_fps, 1),
        "encode_vs_reference_923.6fps": round(encode_fps / 923.6, 4),
        "full_decode_ms_per_frame": round(dec_ms, 3),
        "full_decode_fps": round(1000.0 / dec_ms, 1),
        "host_assembly_ms_per_frame": round(assembly_ms, 2),
        "host_parse_rows_ms_per_frame": round(parse_ms, 2),
        "combined_ms_per_frame": round(combined_ms, 3),
        "transform_roundtrip_ms_per_frame": round(rt_ms, 3),
        "transform_roundtrip_fps": round(1000.0 / rt_ms, 1),
        "noise_content": {
            "roundtrip_psnr_db": round(float(psnr), 2),
            "compression_ratio": round(ratio, 2),
            "device_encode_band_overflows": novf_noise,
        },
        "smooth_content": {
            "roundtrip_psnr_db": round(float(psnr_smooth), 2),
            "compression_ratio": round(ratio_smooth, 2),
            "device_encode_band_overflows": novf_smooth,
        },
        "host_entropy_encode_ms_per_frame_1core": round(entropy_enc_ms, 2),
        "host_entropy_decode_ms_per_frame_1core": round(entropy_dec_ms, 2),
        "batch": batch,
        "device": str(jax.devices()[0]),
        "note": ("encode AND decode are the complete bit-exact CFHD "
                 "hot paths on device (payloads/frames in HBM), both "
                 "byte-exact vs the reference SDK in tests; combined "
                 "adds the measured single-core host tails (sample "
                 "assembly, header walk).  Reference combined "
                 "baseline: (9.3+5.4)ms sync over 8 cores = 543.6 "
                 "fps (README.md:62-92)"),
    })
    print(json.dumps({
        "metric": "1080p_yuy2_device_encode_decode_fps_per_chip",
        "value": round(combined_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(combined_fps / ref_combined_fps, 4),
        "detail": DETAIL,
    }))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - emit partial JSON, not a traceback
        import traceback
        tb = traceback.format_exc(limit=3)
        print(json.dumps({
            "metric": "1080p_yuy2_device_encode_decode_fps_per_chip",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
            "traceback_tail": tb[-1500:],
            "partial_detail": DETAIL,
        }))
        raise SystemExit(0)
