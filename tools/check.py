#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet dirs + oracle_sql.json), then this script
replays each oracle in DuckDB against the same sf dir and diffs values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(files[0])
        spark_cols = sorted(spark_tbl.column_names)
        spark_rows = sorted(
            (tuple(norm(r[c]) for c in spark_cols) for r in spark_tbl.to_pylist()),
            key=repr)
        try:
            duck = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        duck_cols = sorted(duck.column_names)
        duck_rows = sorted(
            (tuple(norm(r[c]) for c in duck_cols) for r in duck.to_pylist()),
            key=repr)
        if spark_cols != duck_cols:
            print(f"FAIL {name}: schema {spark_cols} vs {duck_cols}")
            n_fail += 1
        elif spark_rows != duck_rows:
            n_fail += 1
            diff_a = [r for r in spark_rows if r not in set(duck_rows)][:3]
            diff_b = [r for r in duck_rows if r not in set(spark_rows)][:3]
            print(f"FAIL {name}: rows {len(spark_rows)} vs {len(duck_rows)}; "
                  f"spark-only={diff_a} duck-only={diff_b}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(spark_rows)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
