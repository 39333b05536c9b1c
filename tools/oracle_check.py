#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB (with the sf
tables registered by bare name), then compares: row count, sorted column
names, and the multiset of rows (columns sorted by name, rows sorted by all
columns, floats compared exactly after both engines' rounding).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_rows(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted([tuple(r) for r in rows], key=key)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not glob.glob(os.path.join(spark_path, "*.parquet")):
            results[name] = "MISSING spark output"
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").fetchdf()
        except Exception as e:
            results[name] = f"SPARK READ ERR {e}"
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL ERR {str(e)[:200]}"
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            results[name] = f"SCHEMA cols spark={scols} oracle={ocols}"
            continue
        sdf, odf = sdf[scols], odf[scols]
        dt_mismatch = [(c, str(sdf[c].dtype), str(odf[c].dtype))
                       for c in scols if str(sdf[c].dtype) != str(odf[c].dtype)]
        if dt_mismatch:
            # warn (values may still hash-match after normalization)
            print(f"  [dtype] {name}: {dt_mismatch}")
        if len(sdf) != len(odf):
            results[name] = f"ROWS spark={len(sdf)} oracle={len(odf)}"
            continue
        srows = norm_rows(sdf.itertuples(index=False, name=None))
        orows = norm_rows(odf.itertuples(index=False, name=None))
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                ok = all(
                    (x == y) or (x is None and y is None) or
                    (isinstance(x, float) and isinstance(y, float) and
                     (x == y or abs(x - y) < 1e-12 or (x != x and y != y)))
                    for x, y in zip(a, b))
                if not ok:
                    bad = (i, a, b)
                    break
        if bad:
            results[name] = f"VALUES row {bad[0]}: spark={bad[1]} oracle={bad[2]}"
        else:
            results[name] = f"OK ({len(sdf)} rows)"
    width = max(len(k) for k in results) if results else 0
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{k:{width}s}  {v}")
    print(f"== {n_ok}/{len(results)} OK ==")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
