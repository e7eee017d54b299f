#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate (dev tooling only —
the shipped library has no Python dependency).

Usage: python3 scripts/oracle_check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB against the sf parquet
tables, and compares row counts, column names/order-insensitive values.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def frame_rows(cols, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    n = len(cols[0]) if cols else 0
    return [tuple(canon(cols[i][r]) for i in order) for r in range(n)]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f'CREATE VIEW {t} AS SELECT * FROM "{sf_dir}/{t}.parquet"')
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            got_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
            got_names = got_tbl.column_names
            got = frame_rows([c.to_pylist() for c in got_tbl.columns], got_names)
            exp_rel = con.execute(sql)
            exp_names = [d[0] for d in exp_rel.description]
            exp_cols = exp_rel.fetchall()
            exp_cols_t = list(map(list, zip(*exp_cols))) if exp_cols else [[] for _ in exp_names]
            exp = frame_rows(exp_cols_t, exp_names)
            if sorted(got_names) != sorted(exp_names):
                failed.append((name, f"schema {sorted(got_names)} != {sorted(exp_names)}"))
                continue
            if len(got) != len(exp):
                failed.append((name, f"rows {len(got)} != {len(exp)}"))
                continue
            if got != exp:
                bad = next(i for i, (g, e) in enumerate(zip(got, exp)) if g != e)
                failed.append((name, f"row {bad}: {got[bad]} != {exp[bad]}"))
                continue
            print(f"PASS {name} ({len(got)} rows)")
        except Exception as e:  # noqa: BLE001
            failed.append((name, f"error: {e}"))
    for name, why in failed:
        print(f"FAIL {name}: {why}")
    print(f"{len(oracles) - len(failed)}/{len(oracles)} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
