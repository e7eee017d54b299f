#!/usr/bin/env python3
"""Dev-only lint: every oracle's RESULT COLUMN TYPES must survive the
driver's DuckDB -> pandas `.df()` round-trip (SURVEY §2.10 contract).

The driver hashes stringified pandas values against the Spark parquet dump.
Three result types break that surface even when the values are right:
  - HUGEINT (DuckDB's type for integer `sum(...) OVER` / `list_sum`):
    pandas converts it to float64, so "1" hashes as "1.0";
  - DECIMAL (bare numeric literals): same float drift;
  - LIST/STRUCT/MAP: pandas `sort_values` crashes on them.

Uses `DESCRIBE <sql>` so DuckDB itself reports the types — no execution,
no heuristics (the Scala-side OracleLint is the textual pre-commit guard;
this is the exact check, runnable wherever duckdb exists).

Usage: python3 scripts/oracle_type_lint.py <sfDir> [oracle_sql.json]
  With no json path, runs sbt-free by reading a previously dumped
  Verify out dir's oracle_sql.json.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BAD_PREFIXES = ("HUGEINT", "UHUGEINT", "DECIMAL", "STRUCT", "MAP")


def bad_type(t: str) -> bool:
    u = t.upper()
    return u.endswith("[]") or any(u.startswith(p) for p in BAD_PREFIXES)


def main():
    sf_dir = sys.argv[1]
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "oracle_sql.json"
    oracles = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_bad = 0
    for name in sorted(oracles):
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0]}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if bad_type(t)]
        if bad:
            print(f"FAIL {name}: " + ", ".join(f"{c}:{t}" for c, t in bad))
            n_bad += 1
    print(f"{len(oracles) - n_bad} clean / {n_bad} flagged of {len(oracles)}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
