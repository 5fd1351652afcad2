#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify via
sbt first, then compare each query's parquet output against its DuckDB
oracle over the same testdata tables.

Usage: python3 tools/verify_local.py [outDir] [sfDir]

Dev tool only (driver-side python libs) — the engine itself is pure
Scala/Spark.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    res_path = f"{out_dir}/{name}"
    if not glob.glob(f"{res_path}/*.parquet"):
        print(f"FAIL {name}: no spark output at {res_path}")
        n_fail += 1
        continue
    try:
        mine = con.execute(
            f"SELECT * FROM read_parquet('{res_path}/*.parquet')").df()
        ref = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    mine_c, ref_c = canon(mine), canon(ref)
    if list(mine_c.columns) != list(ref_c.columns):
        print(f"FAIL {name}: columns {list(mine_c.columns)} != {list(ref_c.columns)}")
        n_fail += 1
        continue
    if len(mine_c) != len(ref_c):
        print(f"FAIL {name}: rows {len(mine_c)} != {len(ref_c)}")
        n_fail += 1
        continue
    # exact value compare (what a hash-match needs)
    try:
        diff_cols = []
        for c in mine_c.columns:
            a, b = mine_c[c], ref_c[c]
            try:
                eq = (a.astype(str) == b.astype(str)).all()
            except Exception:
                eq = a.equals(b)
            if not eq:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                neq = mine_c[c].astype(str) != ref_c[c].astype(str)
                print("  mine:", mine_c[neq].head(3).to_dict("records"))
                print("  ref :", ref_c[neq].head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(mine_c)} rows)")
            n_pass += 1
    except Exception as e:
        print(f"FAIL {name}: compare error {e}")
        n_fail += 1

# rows-only queries (no oracle)
for d in sorted(glob.glob(f"{out_dir}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            status = "PASS" if n > 0 else "WARN(empty)"
            print(f"{status} {name} (rows-only, {n} rows)")
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")

print(f"\n{n_pass} passed, {n_fail} failed (of {len(oracle)} oracle-checked)")
sys.exit(1 if n_fail else 0)
