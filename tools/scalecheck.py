#!/usr/bin/env python3
"""Dev-only WIDE-scale correctness gate: check.py with a per-oracle timeout
and per-query SCALE REFEREES for the intentionally-quadratic oracles.

At 10x+ data (graft.ScaleGen output) a handful of DuckDB oracles are
intentionally quadratic (e.g. d3b's exact all-pairs Jaccard referee) and
would hold the whole gate hostage for hours. Two mechanisms keep the wide
gate at full coverage:

1. SCALE REFEREES (scale_referee.json, dumped by graft.Verify from
   SparkEntry.scaleOracleSql/scaleSparkSql): a tractable reformulation of
   the same check — an inverted-index equivalent of an all-pairs join, an
   equi-join rewrite of a banded self-join, or a deterministic pair-local
   slice. When a referee exists it replaces the primary oracle AT WIDE
   SCALE ONLY (the sf<=0.1 gates in check.py keep the independent
   quadratic formulation) and the result is reported as "PASS (referee)".
   A referee may also carry a spark-side SQL (view `spark_result` over the
   query's own verify output) selecting the comparable slice.

2. TIMEOUT SKIPS: any remaining oracle runs in its own subprocess under a
   wall-clock timeout; a slow oracle is recorded as SKIP(timeout) —
   explicitly, never silently.

Spark outputs must already exist (runMain graft.Verify <sfDir> <outDir>),
so a timeout can only ever hide ORACLE cost, never a Spark-side failure.
The row-by-row compare is tools/comparelib.py, shared with check.py.

Usage: python3 tools/scalecheck.py <sfDir> <verifyOutDir> [timeoutSec]
"""
import json
import os
import subprocess
import sys

from comparelib import compare_tables, setup_views


def _connect(sf_dir):
    import duckdb
    con = duckdb.connect()
    setup_views(con, sf_dir)
    return con


def check_one(sf_dir, out_dir, name):
    """Compare one query's Spark parquet vs its primary DuckDB oracle."""
    import pyarrow.parquet as pq
    con = _connect(sf_dir)
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    got = pq.read_table(f"{out_dir}/{name}")
    exp = con.execute(sql).arrow()
    return compare_tables(name, got, exp)


def check_referee(sf_dir, out_dir, name):
    """Compare one query via its scale referee: tractable oracle SQL vs
    the (optionally slice-filtered) Spark verify output."""
    import pyarrow.parquet as pq
    con = _connect(sf_dir)
    ref = json.load(open(f"{out_dir}/scale_referee.json"))[name]
    spark_path = f"{out_dir}/{name}"
    if os.path.isdir(spark_path):
        spark_path = f"{spark_path}/*.parquet"
    if ref.get("spark"):
        con.execute("CREATE VIEW spark_result AS "
                    f"SELECT * FROM read_parquet('{spark_path}')")
        got = con.execute(ref["spark"]).arrow()
    else:
        got = pq.read_table(f"{out_dir}/{name}")
    exp = con.execute(ref["oracle"]).arrow()
    return compare_tables(name, got, exp, tag="referee")


def main(argv):
    if argv[0] == "--one":
        return check_one(argv[1], argv[2], argv[3])
    if argv[0] == "--one-referee":
        return check_referee(argv[1], argv[2], argv[3])
    sf_dir, out_dir = argv[0], argv[1]
    timeout = float(argv[2]) if len(argv) > 2 else 300.0
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    referee = {}
    ref_path = f"{out_dir}/scale_referee.json"
    if os.path.exists(ref_path):
        referee = json.load(open(ref_path))
    n_pass = n_ref = n_fail = n_skip = 0
    skipped = []
    for name in sorted(oracle):
        if not os.path.exists(f"{out_dir}/{name}"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        mode = "--one-referee" if name in referee else "--one"
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), mode,
                 sf_dir, out_dir, name],
                timeout=timeout, capture_output=True, text=True)
            sys.stdout.write(r.stdout)
            if r.returncode != 0:
                if not r.stdout.strip():  # crash, not a compare FAIL
                    print(f"FAIL {name}: checker died: "
                          f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else 'no output'}")
                n_fail += 1
            elif mode == "--one-referee":
                n_ref += 1
            else:
                n_pass += 1
        except subprocess.TimeoutExpired:
            print(f"SKIP {name}: oracle exceeded {timeout:.0f}s at this scale")
            skipped.append(name)
            n_skip += 1
    print(f"== {n_pass + n_ref} pass ({n_ref} via scale referee) "
          f"/ {n_fail} fail / {n_skip} skip(timeout) / {len(oracle)} total")
    if skipped:
        print(f"== skipped: {', '.join(skipped)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
