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


def frame_key(rel):
    """Canonical (cols, rows) for a DuckDB relation.

    Values are read per COLUMN from rel.df() so each keeps its own dtype —
    the old `iterrows()` path homogenized mixed-dtype rows to a common
    dtype, which masked the exact divergence the driver's canonicalization
    sees. Round-7 forensics: d5/d6/x41 failed ONLY the driver hash, and
    they were exactly the 3 of 326 queries whose oracle emitted a HUGEINT
    column (uncast integer sum) — rel.df() maps HUGEINT to float64, so the
    driver hashed '60175.0' against Spark's int64 '60175'. DECIMAL(3,2)
    columns (t26/x65) pass, confirming the float64-coercion model. Rule:
    oracle SQL must CAST integer sums to BIGINT so no final column is
    HUGEINT — flagged loudly below even when values happen to compare.
    """
    hug = [c for c, t in zip(rel.columns, rel.types) if str(t) == "HUGEINT"]
    df = rel.df()
    cols = sorted(df.columns)
    rows = sorted(tuple(canon(df[c].iloc[i]) for c in cols)
                  for i in range(len(df)))
    return cols, rows, hug


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            mc, mr, _ = frame_key(con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'"))
            rc, rr, hug = frame_key(con.sql(sql))
            if hug:
                print(f"FAIL {name}: oracle emits HUGEINT column(s) {hug} — "
                      f"CAST the sum to BIGINT (driver hash will diverge)")
                n_fail += 1
            elif mc != rc:
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
