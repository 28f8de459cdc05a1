#!/usr/bin/env python3
"""Dev-only local mimic of the driver's correctness gate (NOT engine code).

Reads Verify.scala output (outDir/<name>/ parquet + oracle_sql.json), runs
each oracle SQL in DuckDB against the same sf tables, and compares:
rows / schema(column names) / values (sorted rows, sorted columns).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v!r}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(x)}" for k, x in sorted(v.items())) + "}"
    return repr(v)


def frame_key(df):
    cols = sorted(df.columns)
    rows = sorted(tuple(canon(r[c]) for c in cols) for _, r in df.iterrows())
    return cols, rows


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            mine = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            ref = con.sql(sql).df()
            mc, mr = frame_key(mine)
            rc, rr = frame_key(ref)
            if mc != rc:
                print(f"FAIL {name}: columns {mc} vs {rc}")
                n_fail += 1
            elif len(mr) != len(rr):
                print(f"FAIL {name}: rows {len(mr)} vs {len(rr)}")
                n_fail += 1
            elif mr != rr:
                diffs = [i for i, (a, b) in enumerate(zip(mr, rr)) if a != b]
                print(f"FAIL {name}: {len(diffs)} value diffs; first at sorted-row "
                      f"{diffs[0]}:\n  mine={mr[diffs[0]]}\n  ref ={rr[diffs[0]]}")
                n_fail += 1
            else:
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracle)} total")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
