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
    n_pass = n_fail = n_skip = 0
    import os
    for name, sql in sorted(oracles.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1  # subset run (SPARK_GRAFT_ONLY): no dump, not a failure
            continue
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
            # DTYPE-STRICT: the driver hashes typed values, so int64 vs
            # HUGEINT-as-float64 (or any int-vs-float drift) is a hash
            # mismatch even when every cell compares == in Python (the
            # entire r15 154/160 gap). Integer WIDTHS are one family:
            # int32 5 and int64 5 are the same Python int, and the driver
            # demonstrably passes them (s1 has int32 event_id vs the
            # oracle's int64 and was green r1-r15). Everything else —
            # int vs float, float32 vs float64, object — must match.
            def fam(dt):
                s = str(dt)
                return "int" if s.startswith(("int", "uint", "Int", "UInt")) else s
            dbad = [(c, str(ours[c].dtype), str(theirs[c].dtype))
                    for c in ours.columns
                    if fam(ours[c].dtype) != fam(theirs[c].dtype)]
            if dbad:
                c, da, db = dbad[0]
                print(f"FAIL {name}: dtype col {c}: ours={da} oracle={db}"
                      f" (cast the oracle SQL so result types match)")
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
    print(f"\n{n_pass} pass, {n_fail} fail"
          + (f", {n_skip} skipped (no dump)" if n_skip else ""))
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
