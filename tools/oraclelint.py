#!/usr/bin/env python3
"""Oracle type lint — the guard round 8 lacked.

Round 8's only correctness failures were oracle strings whose DuckDB
result carried HUGEINT (SUM over BIGINT) where Spark emits int64:
values identical, hash red at the driver gate, and tools/check.py
(value-based) blind to it. This lint makes the class unreintroducible:

1. Binds every oracle SQL in DuckDB (``DESCRIBE (<sql>)`` — no
   execution) over the fixture views and FAILS on any result column
   whose type Spark never emits: HUGEINT/UHUGEINT (uncast SUM),
   DECIMAL (uncast integer division or AVG), FLOAT (32-bit float where
   Spark writes float64 from a DOUBLE expression is fine — parquet
   float32 only appears from real float columns, so FLOAT is flagged
   unless the Spark side declares float).
2. If a spark_schema.json is present (``runMain graft.VerifyOne
   <sfDir> <outDir>`` with no names dumps the whole registry's
   ANALYZED schemas in seconds), diffs column names AND mapped types
   per query, so any Spark-vs-oracle schema drift screams here before
   the driver's hash gate does.

Dev tooling only (driver-side python) — not part of the shipped library.

Usage: python3 tools/oraclelint.py <sfDir> <oracleSqlJson> [sparkSchemaJson]
       python3 tools/oraclelint.py <sfDir> <verifyOutDir>
"""
import json
import os
import re
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB types Spark's parquet writer never produces for our queries.
BANNED = re.compile(r"^(HUGEINT|UHUGEINT|DECIMAL)", re.IGNORECASE)

# DuckDB result type -> the Spark simpleString(s) it hash-matches with.
# Integer widths are interchangeable (both sides hash as exact ints);
# float32 vs float64 and decimal vs int are NOT (value representation
# diverges — exactly the r8 failure class).
INTS = {"tinyint", "smallint", "int", "bigint"}
DUCK_TO_SPARK = {
    "BIGINT": INTS,
    "UBIGINT": INTS,
    "INTEGER": INTS,
    "SMALLINT": INTS,
    "TINYINT": INTS,
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
    "BLOB": {"binary"},
}


def spark_equiv(duck_type):
    """Map a DuckDB type to acceptable Spark simpleStrings (None = opaque)."""
    dt = duck_type.strip().upper()
    if dt in DUCK_TO_SPARK:
        return DUCK_TO_SPARK[dt]
    m = re.match(r"^(\w+(?: WITH TIME ZONE)?)\[\]$", dt)
    if m:  # LIST type: element-wise map
        inner = spark_equiv(m.group(1))
        if inner is None:
            return None
        return {f"array<{t}>" for t in inner}
    return None  # structs/maps/etc. — name check only


def main(argv):
    sf_dir = argv[0]
    if len(argv) == 2 and os.path.isdir(argv[1]):
        oracle_path = os.path.join(argv[1], "oracle_sql.json")
        schema_path = os.path.join(argv[1], "spark_schema.json")
        schema_path = schema_path if os.path.exists(schema_path) else None
    else:
        oracle_path = argv[1]
        schema_path = argv[2] if len(argv) > 2 else None

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    spark_schemas = json.load(open(schema_path)) if schema_path else None

    violations = []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:
            violations.append(
                f"{name}: oracle fails to bind: {str(e).splitlines()[0]}")
            continue
        duck_types = {row[0]: row[1] for row in desc}
        for col, dt in duck_types.items():
            if BANNED.match(dt.strip()):
                violations.append(
                    f"{name}.{col}: oracle yields {dt} — wrap in "
                    f"CAST(... AS BIGINT/DOUBLE); Spark never emits it")
        if spark_schemas is None:
            continue
        ss = spark_schemas.get(name)
        if ss is None:
            violations.append(f"{name}: oracle has no registered query")
            continue
        if sorted(ss) != sorted(duck_types):
            violations.append(
                f"{name}: column sets differ\n"
                f"    spark={sorted(ss)}\n    duck ={sorted(duck_types)}")
            continue
        for col, dt in duck_types.items():
            ok = spark_equiv(dt)
            if ok is not None and ss[col] not in ok:
                violations.append(
                    f"{name}.{col}: duck {dt} vs spark {ss[col]}")

    checked = len(oracle)
    sdiff = " + spark-schema diff" if spark_schemas is not None else ""
    if violations:
        print(f"ORACLELINT FAIL: {len(violations)} violation(s) over "
              f"{checked} oracles{sdiff}")
        for v in violations:
            print(f"  {v}")
        return 1
    print(f"ORACLELINT PASS: {checked} oracles type-clean{sdiff}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
