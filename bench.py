#!/usr/bin/env python3
"""Benchmark: 1080p YUY2 CFHD encode+decode throughput per TPU chip.

Primary metric: the FULL on-device encode + decode round trip —
encode: YUY2 frames in HBM -> unpack -> 3-level production 2-6 DWT with
fused quantization -> zero-run + Huffman entropy coding -> packed CFHD
band payloads in HBM (`IntraCodec.forward_packed_staged`);
decode: band payload rows in HBM -> TPU band entropy decode
(`entropy/device_decode`) -> dequant + inverse DWT + dither + YUY2 pack
(`IntraCodec._decode_device_program`).  Both directions are every bit of
the reference's hot path (`Codec/encoder.c:1897-5702`,
`Codec/decoder.c:11584/19532`) executing on the chip, and both are
byte-exact vs the reference SDK (tests/test_intra_jax.py,
tests/test_entropy_device_decode.py).  The per-frame combined time adds
the measured host tails (sample assembly on encode, header walk + row
build on decode), which a production host pipelines across cores.

Robustness contract (this file must NEVER emit nothing):
- a watchdog thread enforces a global self-deadline (BENCH_DEADLINE_S,
  default 1500s) and prints the best-available JSON line + os._exit(0)
  if the main thread is stuck (e.g. blocked in a remote AOT compile,
  where Python signal handlers cannot run);
- SIGTERM/SIGINT handlers print the same partial JSON when the main
  thread is interruptible;
- every stage runs under its own soft budget and updates DETAIL as soon
  as it completes; stage completion is logged to stderr;
- stages are ordered so the metrics that are known to compile (encode,
  transform, quality/ratio, host tails) land before the decode-side
  device programs.

If the full decode path is unavailable the metric falls back to the
encode-only fps (flagged with "partial": true and scored against the
reference's 923.6 fps async-encode baseline instead of the combined
543.6 fps).

Note on environment: this bench host reaches the chip through a tunnel
with ~30ms+ RTT and ~0.2 MB/s download, so every timed loop chains K
iterations with a data dependence inside one jitted program and fetches
a single scalar; sample bytes stay in HBM (in production a local PCIe
host drains them at GB/s).

Prints one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

# Progressively-filled detail dict: whatever stages completed are always
# emitted, even on deadline/SIGTERM (round-3 and round-4 driver runs both
# lost their numbers to a single late failure).
DETAIL: dict = {}
_EMITTED = threading.Lock()
_START = time.monotonic()

REF_ENCODE_FPS = 923.6          # README.md:83-92 async pool, 8 threads
# reference combined: async pools amortize the sync per-frame times
# (README.md:62-92) over 8 cores: (9.3 + 5.4)/8 = 1.84 ms/frame
REF_COMBINED_FPS = 1000.0 / ((9.3 + 5.4) / 8)


def _status(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _START:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def emit_and_exit(reason: str | None = None) -> None:
    """Assemble the best-available metric from DETAIL and print the one
    JSON line.  Safe to call from any thread; runs at most once."""
    if not _EMITTED.acquire(blocking=False):
        return
    d = dict(DETAIL)
    enc_ms = d.get("full_encode_ms_per_frame")
    dec_ms = d.get("full_decode_ms_per_frame")
    asm_ms = d.get("host_assembly_ms_per_frame", 0.0)
    parse_ms = d.get("host_parse_rows_ms_per_frame", 0.0)
    partial = reason is not None
    if enc_ms and dec_ms:
        combined_ms = enc_ms + asm_ms + parse_ms + dec_ms
        value = 1000.0 / combined_ms
        vs = value / REF_COMBINED_FPS
        d["combined_ms_per_frame"] = round(combined_ms, 3)
        d["baseline_combined_fps"] = round(REF_COMBINED_FPS, 1)
    elif enc_ms:
        # encode-only fallback, scored against the encode baseline
        value = 1000.0 / enc_ms
        vs = value / REF_ENCODE_FPS
        d["baseline_encode_fps"] = REF_ENCODE_FPS
        d["fallback"] = "encode-only (decode stage unavailable)"
        partial = True
    else:
        value, vs = 0.0, 0.0
        partial = True
    out = {
        "metric": "1080p_yuy2_device_encode_decode_fps_per_chip",
        "value": round(value, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 4),
        "detail": d,
    }
    if partial:
        out["partial"] = True
        if reason:
            out["partial_reason"] = reason
    print(json.dumps(out), flush=True)
    # hard exit: a blocked remote-compile RPC cannot be cancelled and
    # would otherwise keep the process (and the driver's clock) alive
    os._exit(0)


def _install_guards() -> None:
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1500"))

    def watchdog() -> None:
        time.sleep(deadline)
        _status(f"watchdog: global deadline {deadline:.0f}s reached")
        emit_and_exit(f"global deadline {deadline:.0f}s reached")

    t = threading.Thread(target=watchdog, daemon=True, name="bench-watchdog")
    t.start()

    def on_signal(signum, frame):  # noqa: ANN001
        _status(f"signal {signum} received")
        emit_and_exit(f"signal {signum}")

    for s in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(s, on_signal)
        except (ValueError, OSError):
            pass


class StageSkipped(Exception):
    pass


def stage(name: str, budget_s: float):
    """Decorator-ish context: run `fn` with a soft per-stage budget.

    The budget is enforced by a timer thread that, on expiry, logs the
    overrun; if `hard` the timer emits partial results and exits (used
    for stages after which nothing more valuable would run anyway)."""
    class _Ctx:
        def __enter__(self):
            self.t0 = time.monotonic()
            _status(f"stage {name} (budget {budget_s:.0f}s) ...")
            return self

        def __exit__(self, et, ev, tb):
            dt = time.monotonic() - self.t0
            if et is None:
                _status(f"stage {name} done in {dt:.1f}s")
                DETAIL.setdefault("stage_seconds", {})[name] = round(dt, 1)
                return False
            if et is StageSkipped:
                _status(f"stage {name} SKIPPED after {dt:.1f}s: {ev}")
                DETAIL.setdefault("stages_skipped", {})[name] = str(ev)
                return True
            import traceback
            _status(f"stage {name} FAILED after {dt:.1f}s: "
                    f"{''.join(traceback.format_exception(et, ev, tb))[-2000:]}")
            DETAIL.setdefault("stages_failed", {})[name] = f"{et.__name__}: {ev}"
            return True  # swallow; later stages may still succeed
    return _Ctx()


def run_with_timeout(fn, budget_s: float, desc: str):
    """Run fn() on a worker thread; raise StageSkipped on timeout.

    The worker is leaked if it never returns (it may be blocked in a
    remote compile RPC); stages are ordered so nothing after depends on
    the leaked worker's resources."""
    box: dict = {}

    def work():
        try:
            box["result"] = fn()
        except BaseException as e:  # noqa: BLE001
            box["error"] = e

    t = threading.Thread(target=work, daemon=True, name=f"stage-{desc}")
    t.start()
    t.join(budget_s)
    if t.is_alive():
        raise StageSkipped(f"{desc} exceeded {budget_s:.0f}s budget")
    if "error" in box:
        raise box["error"]
    return box.get("result")


def main() -> None:
    _install_guards()

    quick = "--quick" in sys.argv
    w, h, quality = (256, 128, 4) if quick else (1920, 1080, 4)
    batch = 8

    # --- stage: backend init -------------------------------------------------
    with stage("backend_init", 600):
        import jax
        deadline = time.monotonic() + 570
        delay, attempt = 10.0, 0
        while True:
            attempt += 1
            try:
                jax.devices()
                break
            except RuntimeError as e:
                if time.monotonic() + delay > deadline:
                    raise RuntimeError(
                        f"backend unavailable after {attempt} attempts: {e}"
                    ) from e
                time.sleep(delay)
                delay = min(delay * 2, 120.0)
        DETAIL["backend_init_attempts"] = attempt
        DETAIL["device"] = str(jax.devices()[0])

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

    base = np.frombuffer(yuy2_frame(w, h, 1), dtype=np.uint8).reshape(h, 2 * w)
    frames = np.stack([np.roll(base, i, axis=0) for i in range(batch)])
    codec = IntraCodec(width=w, height=h, quality=quality)
    DETAIL["config"] = {"width": w, "height": h, "quality": quality,
                        "batch": batch}

    # Timing scheme: K async dispatches of one jitted step, chained by a
    # scalar salt (a data dependence so executions can't be elided or
    # reordered), with ONE value fetch as the barrier.  (fori_loop-chained
    # single programs SIGKILL the tunnel's remote AOT compiler.)
    K = 16

    @jax.jit
    def _salt_frames(fr, salt):
        return fr.at[0, 0, 0].set(salt.astype(jnp.uint8))

    @jax.jit
    def _encode_reduce_slim(lows, nbits_list):
        s = jnp.int32(0)
        for lowpass in lows:
            s = s + lowpass[:, 0, 0].astype(jnp.int32).sum()
        for nbits in nbits_list:
            s = s + nbits.reshape(nbits.shape[0],
                                  -1)[:, 0].astype(jnp.int32).sum()
        return s

    def encode_step(fr, salt):
        # Same device programs as forward_packed_staged (transform + one
        # entropy program per level x group), but consuming the UNSLICED
        # (B, G, ...) group outputs: the per-channel eager slices
        # (`words[:, gi]` etc.) each cost a tunnel dispatch RPC — ~45
        # dispatches/step vs 9 here; measured 18.3 -> 4.6 ms/frame.
        fr = _salt_frames(fr, salt)
        coeffs = codec.forward(fr)
        groups = codec._band_groups(coeffs)
        nbs = []
        for k in range(len(coeffs[0][1])):
            for grp in groups:
                trios = tuple(coeffs[ch][1][k][b]
                              for ch in grp for b in range(3))
                _words, nbits, _ovf = codec._encode_group_program(trios, 8)
                nbs.append(nbits)
        lows = tuple(c[0] for c in coeffs)
        return _encode_reduce_slim(lows, tuple(nbs))

    @jax.jit
    def roundtrip_step(fr, salt):
        fr = fr.at[0, 0, 0].set(salt.astype(jnp.uint8))
        out = codec.inverse(codec.dequantize(codec.forward(fr)))
        return out[0, 0, 0].astype(jnp.int32)

    @jax.jit
    def roundtrip_mse(fr):
        out = codec.inverse(codec.dequantize(codec.forward(fr)))
        err = (out.astype(jnp.float32) - fr.astype(jnp.float32)) ** 2
        return jnp.mean(err)

    def timed_chain(step, *args, iters=2):
        """Dispatch K chained steps per iter; fetch one scalar at the end."""
        t0 = time.perf_counter()
        for _ in range(iters):
            s = jnp.int32(0)
            for _k in range(K):
                s = step(*args, s)
            float(s)
        return (time.perf_counter() - t0) / (iters * K * batch) * 1000

    dev_frames = jax.device_put(jnp.asarray(frames))

    # --- stage: device encode (compile + measure) ---------------------------
    with stage("device_encode", 900):
        run_with_timeout(lambda: float(encode_step(dev_frames, jnp.int32(0))),
                         870, "encode compile+warm")
        enc_ms = timed_chain(encode_step, dev_frames)
        DETAIL["full_encode_ms_per_frame"] = round(enc_ms, 3)
        DETAIL["full_encode_fps"] = round(1000.0 / enc_ms, 1)
        DETAIL["encode_vs_reference_923.6fps"] = round(
            (1000.0 / enc_ms) / REF_ENCODE_FPS, 4)

    # --- stage: transform roundtrip + quality -------------------------------
    with stage("transform_quality", 600):
        mse = run_with_timeout(
            lambda: float(roundtrip_mse(dev_frames)), 580, "mse compile+run")
        psnr = 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else 99.0
        float(roundtrip_step(dev_frames, jnp.int32(0)))
        rt_ms = timed_chain(roundtrip_step, dev_frames)
        DETAIL["transform_roundtrip_ms_per_frame"] = round(rt_ms, 3)
        DETAIL["transform_roundtrip_fps"] = round(1000.0 / rt_ms, 1)
        DETAIL.setdefault("noise_content", {})["roundtrip_psnr_db"] = \
            round(float(psnr), 2)

    # --- stage: compression ratios (device bit counts, scalar fetches) ------
    with stage("ratios", 300):
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
        DETAIL["noise_content"].update({
            "compression_ratio": round(ratio, 2),
            "device_encode_band_overflows": novf_noise})
        smooth_base = np.frombuffer(yuy2_frame(w, h, 0),
                                    dtype=np.uint8).reshape(h, 2 * w)
        smooth = jax.device_put(jnp.asarray(np.stack(
            [np.roll(smooth_base, i, axis=0) for i in range(batch)])))
        ratio_smooth, novf_smooth = content_stats(smooth)
        mse_smooth = float(roundtrip_mse(smooth))
        psnr_smooth = (10 * np.log10(255.0 ** 2 / mse_smooth)
                       if mse_smooth > 0 else 99.0)
        DETAIL["smooth_content"] = {
            "roundtrip_psnr_db": round(float(psnr_smooth), 2),
            "compression_ratio": round(ratio_smooth, 2),
            "device_encode_band_overflows": novf_smooth}

    # --- stage: host tails (pure host, no device) ----------------------------
    with stage("host_tails", 300):
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
        DETAIL["host_entropy_encode_ms_per_frame_1core"] = round(
            (time.perf_counter() - t0) / 5 * 1000, 2)
        t0 = time.perf_counter()
        for _ in range(5):
            for b, p in zip(bands, payloads):
                decode_band(p, b.size, codeset=17, quant=1)
        DETAIL["host_entropy_decode_ms_per_frame_1core"] = round(
            (time.perf_counter() - t0) / 5 * 1000, 2)

        # assembly tail: band-payload finishing + tag/value sample writing
        from cineform_tpu.entropy.device import finish_band_bytes
        fake_words = [np.frombuffer(p + b"\0" * (-len(p) % 4),
                                    dtype=">u4").astype(np.uint32)
                      for p in payloads]
        fake_bits = [len(p) * 8 - 40 for p in payloads]
        t0 = time.perf_counter()
        for _ in range(5):
            for fw, fb_ in zip(fake_words, fake_bits):
                finish_band_bytes(fw, fb_, 17)
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
        DETAIL["host_assembly_ms_per_frame"] = round(assembly_ms, 2)

    # --- stage: decode prep (samples + row tensors; tunnel-light) -----------
    dec_args = None
    with stage("decode_prep", 600):
        # Encode 2 unique frames on HOST and tile the samples: the host
        # encoder is byte-identical to the device path (test contract,
        # tests/test_intra_jax.py) and costs no tunnel transfer — pulling
        # the device path's capacity-padded words took ~500s at the
        # tunnel's ~0.2 MB/s and blew this stage's budget in round 4.
        #
        # Decode content: the SMOOTH pattern (ratio ~11:1, inside the
        # reference benchmark's own QBist 8.7-21.8:1 range,
        # README.md:62-66).  Noise-pattern payloads push the per-class
        # row capacity to S=65536 chunks, where the decode programs
        # cannot be AOT-compiled on this environment's remote compiler
        # (the compile helper is OOM-killed); smooth content's buckets
        # (<=16384) compile.  Device encode time is shape-bound, not
        # content-bound, so the encode number is unaffected by content.
        from cineform_tpu.models.intra_host import encode_sample as _henc
        dec_base = np.frombuffer(yuy2_frame(w, h, 0),
                                 dtype=np.uint8).reshape(h, 2 * w)
        dec_frames = np.stack([np.roll(dec_base, i, axis=0)
                               for i in range(batch)])
        uniq = max(1, batch // 4)
        samples = run_with_timeout(
            lambda: [_henc(np.ascontiguousarray(dec_frames[i]).tobytes(),
                           w, h, quality) for i in range(uniq)],
            570, "host_encode_samples")
        samples = (samples * ((batch + uniq - 1) // uniq))[:batch]
        DETAIL["decode_content"] = "smooth pattern (ratio ~11:1)"
        t0 = time.perf_counter()
        pays, nchs, qns, lins, lp, fb = codec._decode_rows_args(samples)
        DETAIL["host_parse_rows_ms_per_frame"] = round(
            (time.perf_counter() - t0) / batch * 1000, 2)
        if fb:
            DETAIL["decode_prep_fallback_frames"] = sorted(fb)
        else:
            dec_args = (pays, nchs, qns, lins, lp)

    # --- stage: device decode (compile + measure) — LAST, riskiest ----------
    if dec_args is not None:
        with stage("device_decode", 900):
            pays, nchs, qns, lins, lp = dec_args

            @jax.jit
            def _salt_lp(lp0, salt):
                return lp0 + (salt & 1)

            @jax.jit
            def _decode_reduce(out):
                return out[:, 0, 0].astype(jnp.int32).sum()

            def decode_step(pays, nchs, qns, lins, lp, salt):
                # chain via the lowpass plane (payload bytes stay intact)
                lp = (_salt_lp(lp[0], salt),) + tuple(lp[1:])
                out, ovf = codec._decode_device_program(
                    pays, nchs, qns, lins, lp, batch, 0)
                return _decode_reduce(out)

            run_with_timeout(
                lambda: float(decode_step(pays, nchs, qns, lins, lp,
                                          jnp.int32(0))),
                870, "decode compile+warm")
            dec_ms = timed_chain(decode_step, pays, nchs, qns, lins, lp)
            DETAIL["full_decode_ms_per_frame"] = round(dec_ms, 3)
            DETAIL["full_decode_fps"] = round(1000.0 / dec_ms, 1)

    DETAIL["note"] = (
        "encode AND decode are the complete bit-exact CFHD hot paths on "
        "device (payloads/frames in HBM), both byte-exact vs the "
        "reference SDK in tests; combined adds the measured single-core "
        "host tails (sample assembly, header walk).  Reference combined "
        "baseline: (9.3+5.4)ms sync over 8 cores = 543.6 fps "
        "(README.md:62-92)")
    emit_and_exit(None)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 - emit partial JSON, not a traceback
        import traceback
        DETAIL["fatal"] = f"{type(e).__name__}: {e}"
        DETAIL["fatal_traceback_tail"] = traceback.format_exc(limit=5)[-1500:]
        emit_and_exit(f"fatal: {type(e).__name__}")
