#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's
parquet dumps against the DuckDB oracle SQL, column-name-sorted, row-
multiset equality. Usage:
    python3 scripts/local_gate.py <verify_out_dir> <sf_dir> [name ...]
Runs every query found in oracle_sql.json unless names are given.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISS  {name}: no spark dump")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ERR   {name}: {type(e).__name__}: {str(e)[:160]}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"SCHEMA {name}: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
        elif len(spark_df) != len(duck_df):
            print(f"ROWS  {name}: spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
        else:
            try:
                eq = spark_df.astype(str).equals(duck_df.astype(str))
            except Exception:
                eq = False
            if eq:
                n_pass += 1
                print(f"PASS  {name} ({len(spark_df)} rows)")
            else:
                n_fail += 1
                diff = (spark_df.astype(str) != duck_df.astype(str)).any(axis=1)
                print(f"HASH  {name}: first diffs:\n{spark_df[diff].head(3)}\nvs\n{duck_df[diff].head(3)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
