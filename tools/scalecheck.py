#!/usr/bin/env python3
"""Dev-only WIDE-scale correctness gate: check.py with a per-oracle timeout.

At 10x data (graft.ScaleGen output) a handful of DuckDB oracles are
intentionally quadratic (e.g. d3b's exact all-pairs Jaccard referee) and
would hold the whole gate hostage for hours. This wrapper runs the same
row-by-row compare as tools/check.py but each oracle in its own
subprocess under a wall-clock timeout: a slow oracle is recorded as
SKIP(timeout) — explicitly, never silently — while every tractable
oracle still gets the full hash-equivalent value compare.

Spark outputs must already exist (runMain graft.Verify <sfDir> <outDir>),
so a timeout can only ever hide ORACLE cost, never a Spark-side failure.

Usage: python3 tools/scalecheck.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import json
import math
import os
import subprocess
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def check_one(sf_dir, out_dir, name):
    """Compare one query's Spark parquet vs its DuckDB oracle; exit 0/1."""
    import duckdb
    import pyarrow.parquet as pq
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    got = pq.read_table(f"{out_dir}/{name}")
    exp = con.execute(sql).arrow()
    g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
    if g_cols != e_cols:
        print(f"FAIL {name}: columns differ\n  spark={g_cols}\n  duck ={e_cols}")
        return 1
    if got.num_rows != exp.num_rows:
        print(f"FAIL {name}: rows {got.num_rows} vs {exp.num_rows}")
        return 1
    gp = got.select(g_cols).to_pylist()
    ep = exp.select(e_cols).to_pylist()
    for i, (gr, er) in enumerate(zip(gp, ep)):
        for c in g_cols:
            a, b = norm(gr[c]), norm(er[c])
            if a != b:
                print(f"FAIL {name}: row {i} col {c}: spark={a!r} duck={b!r}")
                return 1
    print(f"PASS {name} ({got.num_rows} rows)")
    return 0


def main(argv):
    if argv[0] == "--one":
        return check_one(argv[1], argv[2], argv[3])
    sf_dir, out_dir = argv[0], argv[1]
    timeout = float(argv[2]) if len(argv) > 2 else 180.0
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    skipped = []
    for name in sorted(oracle):
        if not os.path.exists(f"{out_dir}/{name}"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 sf_dir, out_dir, name],
                timeout=timeout, capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            if r.returncode != 0:
                if not r.stdout.strip():  # crash, not a compare FAIL
                    print(f"FAIL {name}: checker died: "
                          f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else 'no output'}")
                n_fail += 1
            else:
                n_pass += 1
        except subprocess.TimeoutExpired:
            print(f"SKIP {name}: oracle exceeded {timeout:.0f}s at this scale")
            skipped.append(name)
            n_skip += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} skip(timeout) "
          f"/ {len(oracle)} total")
    if skipped:
        print(f"== skipped: {', '.join(skipped)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
