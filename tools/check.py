#!/usr/bin/env python3
"""Dev-only pre-check of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's correctness gate: reads each verify-output parquet,
runs the matching oracle SQL in DuckDB over the same fixture tables,
sorts columns by name, and compares row-by-row (tools/comparelib.py —
shared with scalecheck.py so the two gates cannot drift). Not part of
the shipped library (driver-side python is allowed for dev tooling only).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pyarrow.parquet as pq

from comparelib import compare_tables, setup_views


def main(sf_dir, out_dir):
    con = duckdb.connect()
    setup_views(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if compare_tables(name, got, exp):
            n_fail += 1
        else:
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
