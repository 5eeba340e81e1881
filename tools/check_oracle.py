#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, load the Spark parquet dump, sort
columns by name + rows, and compare values. Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} duck={list(want.columns)}"); fail += 1; continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} duck={len(want)}"); fail += 1; continue
        # value compare, tolerant of dtype width differences
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if a.dtype.kind in "fc" or b.dtype.kind in "fc":
                    same = ((a.isna() & b.isna()) | (a == b)).all()
                else:
                    same = (a.astype(str) == b.astype(str)).all()
            except Exception as e:
                mismatch = f"{c}: compare error {e}"; break
            if not same:
                idx = (a.astype(str) != b.astype(str)).idxmax()
                mismatch = f"{c}: first diff row {idx}: spark={a[idx]!r} duck={b[idx]!r}"
                break
        if mismatch:
            print(f"[DIFF] {name}: {mismatch}"); fail += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows"); ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main()
