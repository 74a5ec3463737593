#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Registers each test parquet as a DuckDB view, replays every oracle_sql.json
query, and compares against the Spark result parquet written by graft.Verify:
columns sorted by name, values compared cell-by-cell (floats to 1e-9 rel).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def eq(a, b):
    # STRICT equality — the driver hashes values, so near-equal floats fail
    # there; this comparer must be at least as strict.
    if a is None and b is None:
        return True
    try:  # pandas NaT (null timestamp) != itself; both-missing is equal
        import pandas as pd
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            ours = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            theirs = con.sql(sql).fetchdf()
            ours = ours[sorted(ours.columns)]
            theirs = theirs[sorted(theirs.columns)]
            if list(ours.columns) != list(theirs.columns):
                print(f"FAIL {name}: columns {list(ours.columns)} != {list(theirs.columns)}")
                n_fail += 1
                continue
            if len(ours) != len(theirs):
                print(f"FAIL {name}: rows {len(ours)} != {len(theirs)}")
                n_fail += 1
                continue
            bad = None
            ov = ours.values.tolist(); tv = theirs.values.tolist()
            for i, (r1, r2) in enumerate(zip(ov, tv)):
                for c, (a, b) in enumerate(zip(r1, r2)):
                    if not eq(norm(a), norm(b)):
                        bad = (i, ours.columns[c], a, b)
                        break
                if bad:
                    break
            if bad:
                print(f"FAIL {name}: row {bad[0]} col {bad[1]}: ours={bad[2]!r} oracle={bad[3]!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(ours)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
