#!/usr/bin/env python3
"""Dev-only determinism referee: two independent graft.Verify runs must
produce value-identical results for every query (catches hidden ordering
ties and nondeterministic aggregates that a single-run oracle hash can't).

Usage: python3 tools/determinism.py <outDirA> <outDirB>
"""
import os
import sys

import pyarrow.parquet as pq


def main(a_dir, b_dir):
    names = sorted(
        d for d in os.listdir(a_dir)
        if os.path.isdir(os.path.join(a_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        try:
            ta = pq.read_table(os.path.join(a_dir, name))
            tb = pq.read_table(os.path.join(b_dir, name))
        except Exception as e:
            print(f"FAIL {name}: unreadable ({e})")
            n_fail += 1
            continue
        # column order is part of the contract; row order too (every
        # registered query ends in a total ORDER BY)
        if ta.schema != tb.schema:
            print(f"FAIL {name}: schemas differ")
            n_fail += 1
        elif not ta.equals(tb):
            print(f"FAIL {name}: values differ between runs")
            n_fail += 1
        else:
            n_pass += 1
    print(f"== determinism: {n_pass} identical / {n_fail} differ "
          f"/ {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
