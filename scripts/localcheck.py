#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/localcheck.py <verify_out_dir> <sf_dir>

For each <name>/ parquet under verify_out_dir, runs oracle_sql.json[name]
in DuckDB over the sf_dir tables and compares row count, column names
(sorted), and a hash of the value matrix with columns sorted by name.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize list/array cells to tuples so sorting/hashing works
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                else (tuple(v) if isinstance(v, list) else v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        d = os.path.join(out_dir, name)
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            oracle_df = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok_rows = len(spark_df) == len(oracle_df)
        ok_cols = list(spark_df.columns) == list(oracle_df.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    spark_df, oracle_df, check_dtype=False, check_exact=False,
                    rtol=0, atol=1e-9)
                ok_vals = True
            except AssertionError as e:
                detail = str(e).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            why = ("rows %d vs %d" % (len(spark_df), len(oracle_df)) if not ok_rows
                   else "cols %s vs %s" % (list(spark_df.columns), list(oracle_df.columns)) if not ok_cols
                   else "values: " + detail)
            print(f"FAIL {name}: {why}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
