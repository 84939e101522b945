#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir, reads the Spark parquet result and
(if present in oracle_sql.json) runs the oracle SQL in DuckDB against views
over the sfDir parquet tables, sorts columns by name, and compares cell
values exactly (floats: exact bit equality; report max delta otherwise).
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok, bad, rows_only = [], [], []
    for qdir in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, qdir)
        if not os.path.isdir(path):
            continue
        files = glob.glob(os.path.join(path, "*.parquet"))
        if not files:
            bad.append((qdir, "no parquet written"))
            continue
        # read ALL part files (coalesce(1) normally yields one, but never
        # silently compare a single partition of a multi-part result)
        spark_rel = con.sql(
            f"SELECT * FROM read_parquet('{os.path.join(path, '*.parquet')}')")
        scols = sorted(spark_rel.columns)
        srows = con.sql(
            f"SELECT {', '.join(scols)} FROM spark_rel").fetchall()
        if qdir not in oracle:
            rows_only.append((qdir, len(srows)))
            continue
        try:
            orel = con.sql(oracle[qdir])
        except Exception as e:
            bad.append((qdir, f"oracle SQL error: {e}"))
            continue
        ocols = sorted(orel.columns)
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            bad.append((qdir, f"schema mismatch: spark={scols} oracle={ocols}"))
            continue
        orows = con.sql(
            f"SELECT {', '.join(ocols)} FROM orel").fetchall()
        if len(srows) != len(orows):
            bad.append((qdir, f"row count: spark={len(srows)} oracle={len(orows)}"))
            continue
        mismatch = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if tuple(map(norm, a)) != tuple(map(norm, b)):
                mismatch = (i, a, b)
                break
        if mismatch:
            bad.append((qdir, f"value mismatch at row {mismatch[0]}: "
                              f"spark={mismatch[1]} oracle={mismatch[2]}"))
        else:
            ok.append((qdir, len(srows)))
    print(f"== OK ({len(ok)}):")
    for q, n in ok:
        print(f"  {q}: {n} rows")
    print(f"== ROWS-ONLY ({len(rows_only)}):")
    for q, n in rows_only:
        print(f"  {q}: {n} rows")
    print(f"== MISMATCH ({len(bad)}):")
    for q, msg in bad:
        print(f"  {q}: {msg}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
