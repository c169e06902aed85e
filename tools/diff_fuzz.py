#!/usr/bin/env python3
"""Differential decode fuzzer: our decoder vs the compiled reference SDK.

Mirrors the reference's own fuzz strategy (`Example/TestCFHD.cpp:572`:
random bit flips into an encoded sample, decode, expect no crash) but
*differentially*: every mutated sample is decoded by BOTH the compiled
reference (`tools/probe_sample.c` -> CFHD_DecodeSample, built with
ERROR_TOLERANT=1, `Codec/decoder.c:128`) and our decoder, and the
outcomes must agree:

  - both reject (reference returns a CFHD error / our api raises
    CFHDError), or
  - both produce a frame, byte-identical.

Usage:
  python tools/diff_fuzz.py [--cases 1000] [--seed 0] [--size 160x120]
                            [--probe .refbuild/probe_sample]

Exit code 0 iff zero strict-class divergences and the header-class
accept/reject mismatch rate stays under 5% (see classify_mutation for
the class contracts).  tests/test_diff_fuzz.py runs a smaller corpus of
this same harness in CI.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def mutate(rng: np.random.Generator, sample: bytes) -> bytes:
    """One mutation drawn from the corpus distribution: bit flips
    (common), byte splices, truncation, or growth with trailing noise."""
    buf = bytearray(sample)
    kind = rng.integers(0, 10)
    if kind < 6:  # 1-16 random bit flips (the reference fuzzer's move)
        for _ in range(int(rng.integers(1, 17))):
            pos = int(rng.integers(0, len(buf)))
            buf[pos] ^= 1 << int(rng.integers(0, 8))
    elif kind < 8:  # splice a random run of random bytes
        n = int(rng.integers(1, 64))
        pos = int(rng.integers(0, max(1, len(buf) - n)))
        buf[pos:pos + n] = rng.bytes(n)
    elif kind == 8:  # truncate
        buf = buf[:int(rng.integers(16, len(buf)))]
    else:  # append trailing garbage (decoders must ignore it)
        buf += rng.bytes(int(rng.integers(1, 256)))
    return bytes(buf)


def reference_decode(probe: str, sample: bytes,
                     timeout: float = 20.0):
    """Decode via the compiled SDK.  Returns output bytes, or None on
    rejection (nonzero exit), or the string 'hang'/'crash' sentinels."""
    with tempfile.TemporaryDirectory() as tmp:
        inp = os.path.join(tmp, "in.cfhd")
        outp = os.path.join(tmp, "out.yuy2")
        with open(inp, "wb") as f:
            f.write(sample)
        try:
            r = subprocess.run([probe, "decode", inp, outp],
                               capture_output=True, timeout=timeout)
        except subprocess.TimeoutExpired:
            return "hang"
        if r.returncode < 0:
            return "crash"
        if r.returncode != 0:
            return None
        with open(outp, "rb") as f:
            return f.read()


def our_decode(sample: bytes):
    """Decode via cineform_tpu.api exactly like the probe does
    (prepare from the sample, full-res YUY2).  Returns bytes or None.

    Pins the HOST decode path (the byte-exactness oracle): the device
    path recompiles per payload-size bucket, which on a remote-compiler
    backend turns each novel mutation into minutes of AOT compile."""
    os.environ.setdefault("CINEFORM_API_DEVICE", "0")
    from cineform_tpu import api

    dec = api.Decoder()
    try:
        dec.prepare_to_decode(0, 0, sample=sample)
        out = dec.decode_sample(sample)
    except api.CFHDError:
        return None
    except Exception as e:  # anything else is a robustness bug, not a reject
        return f"error:{type(e).__name__}"
    if out is None:
        return None
    return np.ascontiguousarray(out).tobytes()


def payload_ranges(sample: bytes):
    """Byte ranges of the band entropy payloads in a pristine sample."""
    from cineform_tpu.bitstream import parse_sample

    s = parse_sample(sample)
    out = []
    for c in s.channels:
        for b in c.bands:
            out.append((b.data_offset, b.data_offset + len(b.data)))
    return out


def classify_mutation(sample: bytes, mutated: bytes, ranges) -> str:
    """'payload'   -- every changed byte is inside a band entropy payload
                      (and the length is unchanged): the reference's
                      ERROR_TOLERANT FSM semantics apply and outputs must
                      be byte-identical or both reject;
       'structure' -- only the length changed (truncation / appended
                      bytes): same strict contract;
       'header'    -- a tag VALUE was altered: the reference's tolerant
                      path reallocates wavelets and may emit pixels from
                      uninitialized allocations (verified: its corrupt
                      output differs from its pristine output by up to
                      255 across half the frame and depends on allocator
                      history), so only a bounded accept/reject
                      divergence rate can be enforced."""
    n = min(len(sample), len(mutated))
    a = np.frombuffer(sample[:n], np.uint8)
    b = np.frombuffer(mutated[:n], np.uint8)
    diff = np.nonzero(a != b)[0]
    if diff.size == 0:
        return "structure" if len(mutated) != len(sample) else "payload"
    if all(any(lo <= int(p) < hi for lo, hi in ranges) for p in diff):
        return "payload" if len(mutated) == len(sample) else "header"
    return "header"


def run(cases: int, seed: int, width: int, height: int, probe: str,
        verbose: bool = False, max_header_divergence: float = 0.05):
    """Returns (strict_divergences, header_divergences, header_cases)."""
    from cineform_tpu.models import intra_host
    from cineform_tpu.utils.testframes import yuy2_frame

    sample = intra_host.encode_sample(yuy2_frame(width, height, 1),
                                      width, height, 4)
    ranges = payload_ranges(sample)
    # sanity: unmutated sample must match byte for byte
    ref0 = reference_decode(probe, sample)
    ours0 = our_decode(sample)
    assert isinstance(ref0, bytes) and ref0 == ours0, \
        "baseline decode mismatch -- fix before fuzzing"

    rng = np.random.default_rng(seed)
    divergences = []          # strict-class failures
    header_divergences = []   # header-class accept/reject mismatches
    counts = {"payload": 0, "structure": 0, "header": 0}
    agree_output = agree_reject = 0
    for case in range(cases):
        m = mutate(rng, sample)
        cls = classify_mutation(sample, m, ranges)
        counts[cls] += 1
        ref = reference_decode(probe, m)
        ours = our_decode(m)
        if ref in ("hang", "crash"):
            # the binary itself fell over; nothing to compare (recorded,
            # not a divergence of OURS)
            if verbose:
                print(f"case {case}: reference {ref} (skipped)")
            continue
        if isinstance(ours, str):
            # an unexpected exception type is a robustness bug in ANY class
            divergences.append((case, cls, f"our decoder raised {ours}"))
            continue
        sink = divergences if cls != "header" else header_divergences
        if (ref is None) != (ours is None):
            sink.append(
                (case, cls,
                 f"reject mismatch: ref={'reject' if ref is None else 'output'}"
                 f" ours={'reject' if ours is None else 'output'}"))
            continue
        if ref is None:
            agree_reject += 1
            continue
        if ref != ours:
            ndiff = int(np.count_nonzero(
                np.frombuffer(ref, np.uint8) !=
                np.frombuffer(ours[:len(ref)].ljust(len(ref), b"\0"),
                              np.uint8)))
            if cls == "header":
                # both produced output; bytes may legitimately differ
                # (uninitialized-allocation pixels in the reference)
                agree_output += 1
            else:
                sink.append((case, cls, f"output mismatch ({ndiff} bytes)"))
            continue
        agree_output += 1
    print(f"{cases} cases ({counts}): {agree_output} agree-output, "
          f"{agree_reject} agree-reject, {len(divergences)} strict "
          f"divergences, {len(header_divergences)}/{counts['header']} "
          f"header-class accept/reject mismatches")
    for case, cls, why in (divergences + header_divergences)[:20]:
        print(f"  case {case} [{cls}]: {why}")
    return len(divergences), len(header_divergences), counts["header"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", default="160x120")
    ap.add_argument("--probe",
                    default=os.path.join(REPO, ".refbuild", "probe_sample"))
    ap.add_argument("-v", "--verbose", action="store_true")
    a = ap.parse_args()
    w, h = (int(x) for x in a.size.split("x"))
    strict, hdr, hdr_cases = run(a.cases, a.seed, w, h, a.probe, a.verbose)
    return 1 if strict or (hdr_cases and hdr / hdr_cases > 0.05) else 0


if __name__ == "__main__":
    raise SystemExit(main())
