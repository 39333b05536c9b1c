#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB (with the sf
tables registered by bare name), then compares: row count, sorted column
names, and the multiset of rows (columns sorted by name, rows sorted by all
columns, floats compared exactly after both engines' rounding).
"""
import sys, os, json, glob, math
import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_rows(rows):
    def key(r):
        return tuple((x is None, str(x)) for x in r)
    return sorted([tuple(r) for r in rows], key=key)


# ---- iterative connected-components oracle (opt-in: ORACLE_CC_ITER=1) ----
#
# The three cluster twins' registered SQL uses a recursive-CTE transitive
# closure — exact, but quadratic in component size on the ORACLE side, so
# it grinds at the sf0.1 sweep scale. This path computes the SAME labels
# (min doc_id per connected component of the LSH pair graph) by iterative
# min-label propagation over temp tables: O(E) per round, diameter rounds
# — exactness preserved, cost linearized. The driver's gate keeps running
# the registered single-statement SQL; this path exists so the 10x sweep
# re-verifies these twins instead of skipping them.

CC_QUERIES = {"dedup_clusters", "dedup_cluster_sizes", "dedup_survivors",
              "dedup_semantic_survivors"}


def cc_labels(con, oracle, pairs_name, pair_cols, node_sql):
    """Build temp table cc_lbl(node, lab): lab = min doc id reachable."""
    pairs_sql = oracle[pairs_name]
    a, b = pair_cols
    con.execute(f"""CREATE OR REPLACE TEMP TABLE cc_edges AS
        WITH p AS ({pairs_sql})
        SELECT {a} AS a, {b} AS b FROM p
        UNION SELECT {b}, {a} FROM p""")
    con.execute(f"CREATE OR REPLACE TEMP TABLE cc_lbl AS "
                f"SELECT node, node AS lab FROM ({node_sql})")
    while True:
        con.execute("""CREATE OR REPLACE TEMP TABLE cc_nxt AS
            SELECT l.node, least(min(l.lab), coalesce(min(nl.lab), min(l.lab))) AS lab
            FROM cc_lbl l
            LEFT JOIN cc_edges e ON e.a = l.node
            LEFT JOIN cc_lbl nl ON nl.node = e.b
            GROUP BY l.node""")
        changed = con.execute(
            "SELECT count(*) FROM cc_nxt n JOIN cc_lbl l "
            "ON l.node = n.node AND l.lab <> n.lab").fetchone()[0]
        con.execute("CREATE OR REPLACE TEMP TABLE cc_lbl AS SELECT * FROM cc_nxt")
        if changed == 0:
            break


def cc_oracle(con, oracle, name):
    """Iterative-CC equivalent of the recursive-CTE twins."""
    if name == "dedup_semantic_survivors":
        cc_labels(con, oracle, "dedup_embedding_neardup", ("vec_a", "vec_b"),
                  "SELECT vec_id AS node FROM embeddings")
        return con.execute("""
            SELECT e.vec_id, e.label FROM embeddings e
            JOIN cc_lbl l ON l.node = e.vec_id AND l.node = l.lab""").fetchdf()
    cc_labels(con, oracle, "dedup_minhash_lsh_pairs", ("doc_a", "doc_b"),
              "SELECT doc_id AS node FROM documents")
    if name == "dedup_clusters":
        return con.execute(
            "SELECT node AS doc_id, lab AS cluster_id FROM cc_lbl").fetchdf()
    if name == "dedup_cluster_sizes":
        return con.execute("""
            SELECT sz AS cluster_size, count(*) AS n_clusters,
              CAST(sum(sz) AS BIGINT) AS n_docs
            FROM (SELECT lab, count(*) AS sz FROM cc_lbl GROUP BY lab)
            GROUP BY sz""").fetchdf()
    if name == "dedup_survivors":
        return con.execute("""
            SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
            JOIN cc_lbl l ON l.node = d.doc_id AND l.node = l.lab""").fetchdf()
    raise ValueError(name)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    # spill OUTSIDE the repo: a heavy twin otherwise drops multi-GB
    # duckdb_temp_storage files into cwd (and `git add -A` eats them)
    con.execute("SET temp_directory = '/tmp/duckdb_spill'")
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
            if os.environ.get("ORACLE_CC_ITER") == "1" and name in CC_QUERIES:
                odf = cc_oracle(con, oracle, name)
            else:
                odf = con.execute(sql).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL ERR {str(e)[:200]}"
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            results[name] = f"SCHEMA cols spark={scols} oracle={ocols}"
            continue
        sdf, odf = sdf[scols], odf[scols]
        # IEEE -0.0 net (graph_modularity r13 regression): Python's
        # -0.0 == 0.0 hid a sign-of-zero divergence the driver's
        # repr-hash gate caught. Registered outputs must never contain
        # -0.0 in any float column — normalize with `+ 0.0` at the
        # operator's final select.
        # (checked on BOTH frames: Python's tuple equality hides the
        # divergence — (-0.0,) == (0.0,) — so the row compare below can
        # never see it; a -0.0 on either side must fail here.)
        def negz_cols(df):
            return [c for c in scols if df[c].dtype.kind == "f" and bool(
                np.any((df[c].values == 0.0) & np.signbit(df[c].values)))]
        negz_s, negz_o = negz_cols(sdf), negz_cols(odf)
        if negz_s or negz_o:
            results[name] = (f"NEGZERO -0.0 present: spark cols {negz_s}, "
                             f"oracle cols {negz_o}")
            continue
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
                def cell_ok(x, y):
                    if x is None and y is None:
                        return True
                    if isinstance(x, float) and isinstance(y, float):
                        if x != x and y != y:  # NaN == NaN for the gate
                            return True
                        # the driver hashes reprs, where -0.0 != 0.0
                        if x == 0.0 and y == 0.0:
                            return math.copysign(1.0, x) == math.copysign(1.0, y)
                        return x == y or abs(x - y) < 1e-12
                    return x == y
                ok = all(cell_ok(x, y) for x, y in zip(a, b))
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
