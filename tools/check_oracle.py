#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run Verify's
parquet dumps against the DuckDB oracle SQL and diff. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # sort columns by name (driver behavior), stringify for compare
    df = df[sorted(df.columns)]
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        res_dir = f"{out_dir}/{name}"
        files = sorted(glob.glob(f"{res_dir}/*.parquet"))
        if not files:
            print(f"MISSING  {name}: no result parquet"); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        got, want = norm(got), norm(want)
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: got {list(got.columns)} want {list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"ROWS     {name}: got {len(got)} want {len(want)}")
            n_bad += 1; continue
        # dtypes
        dt_got = [str(t) for t in got.dtypes]
        dt_want = [str(t) for t in want.dtypes]
        if dt_got != dt_want:
            print(f"DTYPE?   {name}: got {dt_got} want {dt_want} (may still hash-match)")
        mism = (got.astype(str).values != want.astype(str).values)
        if mism.any():
            import numpy as np
            r, c = np.argwhere(mism)[0]
            print(f"VALUES   {name}: first diff row {r} col {got.columns[c]}: "
                  f"got={got.iloc[r, c]!r} want={want.iloc[r, c]!r}")
            n_bad += 1; continue
        print(f"OK       {name} ({len(got)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
