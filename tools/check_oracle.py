#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each <name>/ parquet dir in verifyOutDir, runs oracle_sql.json[name]
in DuckDB over the same tables, canonicalizes both results (columns sorted
by name, rows sorted by all columns, floats rounded), and reports match.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to ns datetimes, floats stay float64
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype('datetime64[us]')
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind='mergesort', na_position='last')
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noora = 0
    # a query whose dump FAILED leaves no dir at all — without this check a
    # plan-time error reads as "141 pass, 0 fail" (it bit: the 2 session-
    # window queries broke on a fixture type change and the tally hid it)
    for name in sorted(set(oracle) - set(names)):
        print(f"MISSING-DUMP   {name} (query failed before writing output — see [verify] stderr)")
        n_fail += 1
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISSING-OUTPUT {name}"); n_fail += 1; continue
        got = pq.read_table(files[0]).to_pandas()
        if name not in oracle:
            print(f"NO-ORACLE      {name:28s} rows={len(got)}"); n_noora += 1; continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERROR   {name}: {e}"); n_fail += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"SCHEMA-DIFF    {name}: spark={list(g.columns)} duck={list(w.columns)}"); n_fail += 1; continue
        if len(g) != len(w):
            print(f"ROWCOUNT-DIFF  {name}: spark={len(g)} duck={len(w)}"); n_fail += 1; continue
        # The driver hashes raw values, so an int64 column on one side vs a
        # float64 on the other (e.g. DuckDB HUGEINT -> pandas float) fails its
        # compare even when values are numerically equal. Flag that here.
        fam = [c for c in g.columns if {g[c].dtype.kind, w[c].dtype.kind} == {'i', 'f'}]
        if fam:
            print(f"DTYPE-FAMILY   {name}: int-vs-float cols {fam} (driver hash would fail)"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
            print(f"PASS           {name:28s} rows={len(g)}"); n_pass += 1
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=False, rtol=1e-9, atol=1e-9)
                print(f"PASS(approx)   {name:28s} rows={len(g)}"); n_pass += 1
            except AssertionError as e2:
                msg = str(e2).replace("\n", " | ")[:300]
                print(f"VALUE-DIFF     {name}: {msg}"); n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noora} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
