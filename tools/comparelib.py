"""Shared compare logic for tools/check.py and tools/scalecheck.py.

One implementation of the driver-shaped correctness compare — fixture view
setup, float normalization, and the sorted-column row-by-row value check —
so the narrow (check.py) and wide (scalecheck.py) gates cannot drift
(ADVICE r9: the two previously duplicated this verbatim and reported
oracle errors differently).
"""
import math
import os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def setup_views(con, sf_dir):
    """CREATE VIEW per fixture table; ScaleGen output dirs get a glob."""
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare_tables(name, got, exp, tag=""):
    """Row-by-row value compare of two pyarrow tables (columns sorted by
    name, driver-style). Prints one PASS/FAIL line; returns 0 on match."""
    suffix = f" ({tag})" if tag else ""
    g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
    if g_cols != e_cols:
        print(f"FAIL {name}{suffix}: columns differ\n"
              f"  spark={g_cols}\n  duck ={e_cols}")
        return 1
    if got.num_rows != exp.num_rows:
        print(f"FAIL {name}{suffix}: rows {got.num_rows} vs {exp.num_rows}")
        return 1
    gp = got.select(g_cols).to_pylist()
    ep = exp.select(e_cols).to_pylist()
    for i, (gr, er) in enumerate(zip(gp, ep)):
        for c in g_cols:
            a, b = norm(gr[c]), norm(er[c])
            if a != b:
                print(f"FAIL {name}{suffix}: row {i} col {c}: "
                      f"spark={a!r} duck={b!r}")
                return 1
    print(f"PASS {name}{suffix} ({got.num_rows} rows)")
    return 0
