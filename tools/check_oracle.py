#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff. Usage:
    python3 tools/check_oracle.py /tmp/vout /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
ok = fail = 0
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(os.path.join(d, "*.parquet"))
    if not files:
        print(f"MISS  {name}: no parquet written")
        fail += 1
        continue
    got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    if name not in oracle:
        print(f"ROWS  {name}: rows={len(got)} (no oracle)")
        continue
    try:
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"SQLER {name}: {e}")
        fail += 1
        continue
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"COLS  {name}: got {list(got.columns)} want {list(want.columns)}")
        fail += 1
        continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    if len(g) != len(w):
        print(f"NROW  {name}: got {len(g)} want {len(w)}")
        fail += 1
        continue
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        ok += 1
    except AssertionError as e:
        print(f"DIFF  {name}: {str(e).splitlines()[-1] if str(e) else 'mismatch'}")
        # show first differing rows
        neq = (g != w) & ~(g.isna() & w.isna())
        bad = neq.any(axis=1)
        print(g[bad].head(3))
        print(w[bad].head(3))
        fail += 1
print(f"\n{ok} ok, {fail} failed, {len(oracle)} oracles")
