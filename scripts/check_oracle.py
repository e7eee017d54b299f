#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate.

Runs each oracle SQL from a Verify dump's oracle_sql.json in DuckDB against
the fixture parquet tables, and compares against the Spark parquet dump:
row count, column-name set, and an order-insensitive value hash with columns
sorted by name (the driver's rule — which is why Spark and SQL column
aliases must match exactly).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir> [name ...]

This is a builder-side harness (python/duckdb/pyarrow are driver-side
tools); the shipped library itself is pure Scala/Spark.
"""
import sys, json, os, hashlib, decimal
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    # type-sensitive on purpose: a bare numeric VALUES literal types as
    # DECIMAL in DuckDB and the DRIVER's compare fails it against Spark's
    # double — tagging it here makes the local mirror fail the same way
    # instead of laxly str()-matching (oracles must CAST numeric literals)
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v in (float("inf"), float("-inf")):
            return "inf" if v > 0 else "-inf"
        return repr(round(v, 6))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:]) or None
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if only:
        # a typo'd name would otherwise filter everything out and exit 0 —
        # an empty "verification" that reads as a pass (same guard as
        # Verify.main / Bench.main)
        unknown = only - set(oracles)
        if unknown:
            sys.exit(f"unknown query name(s): {', '.join(sorted(unknown))}")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"{name}: NO SPARK DUMP")
            fails += 1
            continue
        st = pq.read_table(spark_path)
        s_cols = st.column_names
        s_rows = [tuple(r[c] for c in s_cols) for r in st.to_pylist()]
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            fails += 1
            continue
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = sorted(s_cols) == sorted(o_cols)
        hash_ok = schema_ok and table_hash(s_cols, s_rows) == table_hash(o_cols, o_rows)
        ok = rows_ok and schema_ok and hash_ok
        fails += 0 if ok else 1
        print(f"{name}: {'PASS' if ok else 'FAIL'} rows={len(s_rows)}/{len(o_rows)}"
              f" schema={schema_ok} hash={hash_ok}")
        if not schema_ok:
            print(f"  spark cols: {sorted(s_cols)}\n  oracle cols: {sorted(o_cols)}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
