#!/usr/bin/env python3
"""Local pre-validation of the driver's correctness gate.

Runs each SparkEntry.oracleSql query in DuckDB over the sf parquet tables and
compares against the engine's Verify output (outDir/<name>.parquet), the same
way the driver does: sort columns by name, sort rows, compare values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        raw = json.load(f)
    # the file publishes every entry under BOTH `name` and `name.parquet`
    # (driver-compat shotgun); normalize to bare names here
    oracle = {}
    for k, v in raw.items():
        oracle[k[:-8] if k.endswith(".parquet") else k] = v
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            e = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}.parquet/*.parquet')")
            ecols = [d[0] for d in e.description]
            erows = e.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: engine output unreadable: {ex}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(ecols):
            print(f"FAIL {name}: schema mismatch oracle={sorted(ocols)} engine={sorted(ecols)}")
            n_fail += 1
            continue
        co, ce = canon(orows, ocols), canon(erows, ecols)
        if co == ce:
            print(f"PASS {name} ({len(erows)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows oracle={len(orows)} engine={len(erows)}")
            for i, (a, b) in enumerate(zip(co, ce)):
                if a != b:
                    print(f"  first diff at sorted row {i}: oracle={a} engine={b}")
                    break
            n_fail += 1
    # rows-only entries (no oracle): just check non-empty readability
    import glob
    import os
    for p in sorted(glob.glob(f"{out_dir}/*.parquet")):
        name = os.path.basename(p)[:-8]
        if name in oracle:
            continue
        try:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
        except Exception as ex:
            print(f"FAIL {name}: rows-only output unreadable: {ex}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
