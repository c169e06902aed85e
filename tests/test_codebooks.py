"""Validate codebook spec (static + derived tables) against the oracle dump.

tests/golden/codebooks_dump.txt was produced by tools/probe_codebooks.c
linked against the compiled reference library: it records the exact runtime
encode tables (VLE valuebook with fused companding+sign, composite zero-run
book) the reference encoder uses.  Our independent implementations must
match entry-for-entry.
"""

import os

import numpy as np
import pytest

from cineform_tpu.spec import codebooks as cb

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "codebooks_dump.txt")


def _parse_dump():
    sets = {}
    cur = None
    section = None
    with open(GOLDEN) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "CODESET":
                cur = {"name": parts[1], "flags": int(parts[2].split("=")[1], 16)}
                sets[parts[1]] = cur
            elif parts[0] in ("MAGSBOOK", "ZEROBOOK", "RUNSBOOK", "RUNBOOK"):
                section = parts[0]
                cur[section] = []
            elif parts[0] == "VALUEBOOK":
                section = "VALUEBOOK"
                cur[section] = []
                cur["vb_size"] = int(parts[1])
            elif parts[0] == "BANDEND":
                cur["bandend"] = (
                    int(parts[1].split("=")[1]),
                    int(parts[2].split("=")[1], 16),
                )
            elif parts[0] == "M":
                cur["MAGSBOOK"].append((int(parts[2]), int(parts[3], 16)))
            elif parts[0] == "Z":
                cur["ZEROBOOK"].append(
                    (int(parts[2]), int(parts[3], 16), int(parts[4]))
                )
            elif parts[0] == "R":
                cur["RUNSBOOK"].append(
                    (int(parts[2]), int(parts[3], 16), int(parts[4]), int(parts[5]))
                )
            elif parts[0] == "V":
                cur["VALUEBOOK"].append((int(parts[2]), int(parts[3], 16)))
            elif parts[0] == "C":
                cur["RUNBOOK"].append(
                    (int(parts[2]), int(parts[3]), int(parts[4], 16))
                )
            elif parts[0] == "PUTVLC":
                cur = None
                section = None
    return sets


DUMP = _parse_dump()


@pytest.mark.parametrize("num", [9, 17, 18])
def test_static_tables_match_oracle(num):
    d = DUMP[f"cs{num}"]
    cs = cb.get_codeset(num)
    mags = np.array(d["MAGSBOOK"])
    np.testing.assert_array_equal(cs.mag_size, mags[:, 0])
    np.testing.assert_array_equal(cs.mag_bits, mags[:, 1].astype(np.uint32))
    zeros = np.array(d["ZEROBOOK"])
    np.testing.assert_array_equal(cs.zero_size, zeros[:, 0])
    np.testing.assert_array_equal(cs.zero_bits, zeros[:, 1].astype(np.uint32))
    np.testing.assert_array_equal(cs.zero_count, zeros[:, 2])
    rlv = np.array(d["RUNSBOOK"])
    np.testing.assert_array_equal(cs.rlv[:, 0], rlv[:, 0])
    np.testing.assert_array_equal(
        cs.rlv[:, 1].astype(np.uint32), rlv[:, 1].astype(np.uint32)
    )
    np.testing.assert_array_equal(cs.rlv[:, 2], rlv[:, 2])
    np.testing.assert_array_equal(cs.rlv[:, 3], rlv[:, 3])
    assert (cs.bandend_size, cs.bandend_bits) == d["bandend"]
    assert cs.flags == d["flags"]


@pytest.mark.parametrize("num", [9, 17, 18])
def test_valuebook_matches_oracle(num):
    d = DUMP[f"cs{num}"]
    sizes, bits = cb.build_valuebook(num)
    golden = np.array(d["VALUEBOOK"])
    assert len(golden) == cb.VALUE_TABLE_LENGTH
    np.testing.assert_array_equal(sizes, golden[:, 0])
    np.testing.assert_array_equal(bits, golden[:, 1].astype(np.uint32))


@pytest.mark.parametrize("num", [9, 17, 18])
def test_runbook_matches_oracle(num):
    d = DUMP[f"cs{num}"]
    sizes, counts, bits = cb.build_runbook(num)
    golden = np.array(d["RUNBOOK"])
    assert len(golden) == cb.RUNBOOK_LENGTH
    np.testing.assert_array_equal(sizes, golden[:, 0])
    np.testing.assert_array_equal(counts, golden[:, 1])
    np.testing.assert_array_equal(bits, golden[:, 2].astype(np.uint32))


def test_cubic_compand_expand_consistency():
    table = cb.cubic_compand_table()
    # expansion of a code lands in the bin that compands back to the code
    for code in [0, 1, 40, 54, 100, 200, 255]:
        mag = cb.cubic_expand(code)
        assert table[min(mag, 1024)] == code
    assert cb.cubic_expand(-100) == -cb.cubic_expand(100)


def test_old_compand_expand_consistency():
    for mag in [0, 1, 39, 40, 41, 53, 54, 55, 100, 255, 1023]:
        code = cb.old_compand(mag)
        exp = cb.old_expand(code)
        assert cb.old_compand(exp) == code
