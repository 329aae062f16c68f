#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev loop only; the
engine itself is pure Scala/Spark — this script exists so oracle SQL can be
validated before the driver runs it).

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Loads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf parquet tables,
sorts columns by name and rows by value, and compares.
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

# The driver hashes a canonical text rendering of each value, so an int64 5
# and a float64 5.0 hash DIFFERENTLY even though == compares equal. DuckDB
# returns integer sum() as HUGEINT -> pandas float64, which is exactly how
# round 1 passed 64/64 locally while the driver failed 8 queries. Gate on
# dtype *kind* (int vs float vs datetime vs other) to reproduce that
# strictness; oracle SQL must CAST integer sums to BIGINT.
def kind(dt) -> str:
    k = dt.kind
    if k in ("i", "u"):
        return "int"
    if k in ("S", "U"):
        return "O"
    return k

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_noora = 0
    for path in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(path)
        if not os.path.isdir(path):
            continue
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(path, "*.parquet"))
        got = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows")
            n_noora += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        kinds = [(c, kind(g[c].dtype), kind(w[c].dtype)) for c in g.columns]
        bad = [(c, a, b) for c, a, b in kinds if a != b]
        if bad:
            print(f"FAIL {name}: dtype kind mismatch (driver hashes these differently): {bad}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            # show first few diffs
            neq = (g != w) & ~(g.isna() & w.isna())
            rows = neq.any(axis=1)
            print("  got :", g[rows].head(3).to_dict("records"))
            print("  want:", w[rows].head(3).to_dict("records"))
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
