#!/usr/bin/env python3
"""Dev-only pre-check of SparkEntry.queries vs the DuckDB oracle.

Mimics the driver's correctness gate: reads each verify-output parquet,
runs the matching oracle SQL in DuckDB over the same fixture tables,
sorts columns by name, and compares row-by-row. Not part of the shipped
library (driver-side python is allowed for dev tooling only).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver fixtures are single files; ScaleGen output is a Spark
        # directory of part files — glob in that case
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
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
        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            print(f"FAIL {name}: columns differ\n  spark={g_cols}\n  duck ={e_cols}")
            n_fail += 1
            continue
        if got.num_rows != exp.num_rows:
            print(f"FAIL {name}: rows {got.num_rows} vs {exp.num_rows}")
            n_fail += 1
            continue
        gp = got.select(g_cols).to_pylist()
        ep = exp.select(e_cols).to_pylist()
        bad = None
        for i, (gr, er) in enumerate(zip(gp, ep)):
            for c in g_cols:
                a, b = norm(gr[c]), norm(er[c])
                if a != b:
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} duck={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({got.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail / {len(oracle)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
