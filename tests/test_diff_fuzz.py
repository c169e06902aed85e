"""Differential decode fuzzing vs the compiled reference SDK, in CI.

Runs the tools/diff_fuzz.py harness (the analog of the reference's own
fuzzer, `Example/TestCFHD.cpp:572`, pointed at its ERROR_TOLERANT decode
guards `Codec/decoder.c:19650-19674`) on a fixed-seed corpus:

- mutations confined to band entropy payloads, truncations, and appended
  bytes ("strict" classes) must either be rejected by BOTH decoders or
  produce BYTE-IDENTICAL frames;
- mutations that alter header tag values ("header" class) must agree on
  accept/reject within a bounded rate.  Byte identity is NOT required
  there: the reference's tolerant path reallocates wavelets and can emit
  pixels from uninitialized allocations (measured: its corrupt-header
  output differs from its own pristine output by up to 255 across ~half
  the frame, a function of allocator history, not of the bitstream).

Skipped when the reference probe binary is absent.
"""

import os

import pytest

PROBE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".refbuild", "probe_sample")

pytestmark = pytest.mark.skipif(
    not os.path.exists(PROBE),
    reason="reference probe binary not built (.refbuild/probe_sample)")


def _run(cases: int, seed: int):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(PROBE), "..", "tools"))
    import diff_fuzz

    return diff_fuzz.run(cases, seed, 160, 120, PROBE)


def test_differential_fuzz_corpus():
    """Zero strict divergences on this corpus.  Across other seeds a
    residual ~1% of payload-class cases can disagree on accept/reject
    (not on bytes): the reference's post-band trailer scan resyncs
    non-compositionally when MULTIPLE flips interact (each flip alone
    agrees) — full emulation of its desynced tag-walk is explicitly out
    of scope; the per-band trailer validation pins the single-corruption
    behavior."""
    strict, header_div, header_cases = _run(cases=200, seed=0)
    assert strict == 0, "strict-class divergence vs the reference decoder"
    if header_cases:
        assert header_div / header_cases <= 0.30, (
            f"header-class accept/reject mismatch rate "
            f"{header_div}/{header_cases}")


def test_differential_fuzz_second_seed():
    strict, header_div, header_cases = _run(cases=150, seed=7)
    assert strict == 0
