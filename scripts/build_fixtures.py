#!/usr/bin/env python3
"""Rebuild the /tmp-only 10x/100x bench fixtures (dev-side tooling; never
used for correctness oracles). Recipe pinned since round 12/13 (PLANS.md):

- documents: per-copy `copytag<i> ` prefix (copy 0 untouched) -- copy-internal
  dup structure preserved, no cross-copy EXACT dups; doc ids offset per copy;
  n_chars recomputed from the prefixed text.
- embeddings: vec ids offset per copy; dim-wise +0.0017*copy perturbation,
  float32-quantized (the parquet column stays FLOAT, so the engine's
  double-cast sees exactly what a real float corpus would give).
- all other tables symlinked untouched from sf0.1.

Usage: python3 scripts/build_fixtures.py [sfDir] [outRoot]
Defaults: /root/testdata/sf0.1 -> /tmp/fixture10x + /tmp/fixture100x
"""
import duckdb, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
root = sys.argv[2] if len(sys.argv) > 2 else '/tmp'
con = duckdb.connect()

for mult, name in [(10, 'fixture10x'), (100, 'fixture100x')]:
    out = f'{root}/{name}'
    os.makedirs(out, exist_ok=True)
    con.execute(f"""
      COPY (
        SELECT (t.copy * (SELECT max(doc_id)+1 FROM read_parquet('{sf}/documents.parquet'))) + d.doc_id AS doc_id,
               CASE WHEN t.copy = 0 THEN d.text ELSE 'copytag' || t.copy || ' ' || d.text END AS text,
               d.lang, d.source,
               CAST(length(CASE WHEN t.copy = 0 THEN d.text ELSE 'copytag' || t.copy || ' ' || d.text END) AS BIGINT) AS n_chars
        FROM read_parquet('{sf}/documents.parquet') d, range({mult}) t(copy)
        ORDER BY doc_id
      ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
      COPY (
        SELECT (t.copy * (SELECT max(vec_id)+1 FROM read_parquet('{sf}/embeddings.parquet'))) + e.vec_id AS vec_id,
               list_transform(e.embedding, x -> CAST(x + 0.0017 * t.copy AS FLOAT)) AS embedding,
               e.label
        FROM read_parquet('{sf}/embeddings.parquet') e, range({mult}) t(copy)
        ORDER BY vec_id
      ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events']:
        dst = f'{out}/{t}.parquet'
        if not os.path.exists(dst):
            os.symlink(f'{sf}/{t}.parquet', dst)
    ndocs = con.execute(f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()[0]
    nvecs = con.execute(f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')").fetchone()[0]
    print(f'{name}: {ndocs} docs, {nvecs} vectors')
