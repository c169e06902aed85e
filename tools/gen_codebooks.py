#!/usr/bin/env python3
"""Extract the CFHD Huffman codebook *data* from the reference tables.

The codebooks are format constants (the published CFHD bitstream's Huffman
tables, `Common/table{9,17,18}.inc`).  This script parses them into a compact
.npz consumed by `cineform_tpu.spec.codebooks`; the derived encode tables
(VLE valuebook, composite run table) are NOT stored — they are recomputed by
our own implementation and validated against a behavioral dump of the
reference oracle (tests/golden/codebooks_dump.txt, tools/probe_codebooks.c).

Usage: python tools/gen_codebooks.py [reference_root] [out.npz]
"""

import re
import sys

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = sys.argv[2] if len(sys.argv) > 2 else "cineform_tpu/spec/codebooks_data.npz"

ENTRY = re.compile(r"\{\s*(\d+)\s*,\s*(0x[0-9A-Fa-f]+)\s*(?:,\s*(-?\d+)\s*)?(?:,\s*(-?\d+)\s*)?\}")


def parse_tables(path: str) -> dict:
    """Parse all named table initializers in a .inc file."""
    text = open(path).read()
    tables = {}
    # Find each "TYPE nameXX = { {len}, { entries } };" blob
    for m in re.finditer(r"(RLVTABLE|VLCTABLE|RLCTABLE)\s+(\w+)\s*=\s*\{", text):
        kind, name = m.group(1), m.group(2)
        # take text until the closing "};" at top level
        start = m.end()
        end = text.index("};", start)
        blob = text[start:end]
        rows = ENTRY.findall(blob)
        # first braced group is the length header {N}
        header = re.search(r"\{\s*(\d+)\s*\}", blob)
        length = int(header.group(1))
        entries = []
        for r in rows:
            vals = [int(r[0]), int(r[1], 16)]
            if r[2] != "":
                vals.append(int(r[2]))
            if r[3] != "":
                vals.append(int(r[3]))
            entries.append(vals)
        # drop the header row if it got matched (it won't: needs >=2 fields)
        tables[name] = (kind, length, entries)
    # special codebooks are plain arrays: "VLCTABLE table17s" handled above
    return tables


def main() -> None:
    out = {}
    for cs, fname in (("9", "table9.inc"), ("17", "table17.inc"), ("18", "table18.inc")):
        tabs = parse_tables(f"{REF}/Common/{fname}")
        m_kind, m_len, m_rows = tabs[f"table{cs}m"]
        assert m_kind == "VLCTABLE" and len(m_rows) == m_len, (cs, m_len, len(m_rows))
        out[f"cs{cs}_mag"] = np.array(m_rows, dtype=np.int64)  # (size, bits)

        z_kind, z_len, z_rows = tabs[f"table{cs}z"]
        assert z_kind == "RLCTABLE" and len(z_rows) == z_len
        out[f"cs{cs}_zero"] = np.array(z_rows, dtype=np.int64)  # (size, bits, count)

        r_kind, r_len, r_rows = tabs[f"table{cs}r"]
        assert r_kind == "RLVTABLE" and len(r_rows) == r_len
        out[f"cs{cs}_rlv"] = np.array(r_rows, dtype=np.int64)  # (size,bits,count,value)

        s_kind, s_len, s_rows = tabs[f"table{cs}s"]
        assert s_len >= 1
        out[f"cs{cs}_bandend"] = np.array(s_rows[-1], dtype=np.int64)  # (size, bits)

    np.savez_compressed(OUT, **out)
    for k, v in out.items():
        print(k, v.shape)


if __name__ == "__main__":
    main()
