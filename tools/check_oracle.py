#!/usr/bin/env python3
"""Local replica of the driver's correctness harness: for each query dumped by
graft.Verify, run the oracle SQL in DuckDB over the same parquet tables and
compare rows/schema/hash the same way (sort columns by name, sort rows, hash
values). Usage: check_oracle.py <verify_out_dir> <sf_dir> [query ...]"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

with open(os.path.join(outdir, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fails.append(name)
        continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in files])
        odf = con.sql(sql).df()
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        sc, oc = canon(sdf), canon(odf)
        if rows and schema:
            # value compare with float tolerance-free string hash like driver
            eq = True
            for c in sc.columns:
                a, b = sc[c].to_numpy(), oc[c].to_numpy()
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    af = a.astype(float); bf = b.astype(float)
                    same = (af == bf) | (np.isnan(af) & np.isnan(bf))
                else:
                    same = a.astype(str) == b.astype(str)
                if not same.all():
                    eq = False
                    idx = np.where(~same)[0][:3]
                    print(f"  {name}.{c} mismatch at {idx}: spark={a[idx]} oracle={b[idx]}")
            status = "PASS" if eq else "HASH-FAIL"
        else:
            status = f"FAIL rows={len(sdf)}/{len(odf)} schema={schema}"
        if status != "PASS":
            fails.append(name)
        print(f"{name}: {status}")
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}")
        fails.append(name)

print("\nFAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
