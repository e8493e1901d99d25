#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala's
parquet dumps against the DuckDB oracles (columns sorted by name, values
hashed). Usage: python3 tools/check.py <outDir> [keyFilter]"""
import sys, os, json, hashlib
import duckdb

out = sys.argv[1]
filt = sys.argv[2] if len(sys.argv) > 2 else ""
oracles = json.load(open(os.path.join(out, "oracle_sql.json")))

con = duckdb.connect()
sf = "/root/testdata/sf0.01"
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def canon(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    df = df.sort_values(by=cols, key=lambda s: s.astype(str)).reset_index(drop=True)
    h = hashlib.md5()
    for row in df.itertuples(index=False):
        h.update(("|".join(repr(v) for v in row)).encode())
    return list(df.columns), [str(df[c].dtype) for c in cols], len(df), h.hexdigest()

fails = 0
for name in sorted(oracles):
    if filt and filt not in name:
        continue
    pq = os.path.join(out, name)
    if not os.path.isdir(pq):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        s_cols, s_types, s_rows, s_hash = canon(con.sql(f"SELECT * FROM read_parquet('{pq}/*.parquet')"))
        o_cols, o_types, o_rows, o_hash = canon(con.sql(oracles[name]))
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}")
        fails += 1
        continue
    ok = s_cols == o_cols and s_rows == o_rows and s_hash == o_hash
    if not ok:
        fails += 1
        print(f"FAIL {name}: rows {s_rows}/{o_rows} cols {s_cols}/{o_cols} "
              f"types {s_types}/{o_types} hash {'ok' if s_hash==o_hash else 'MISMATCH'}")
    else:
        print(f"ok   {name}: {s_rows} rows")
print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
sys.exit(1 if fails else 0)
