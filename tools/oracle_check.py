#!/usr/bin/env python3
"""Replay SparkEntry oracles in DuckDB and compare against Verify output.

Usage: oracle_check.py <verify_out_dir> [sf_dir]

Mirrors the driver's correctness gate: for each query, sort columns by
name and compare row counts then exact values.
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        pq = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not pq:
            print(f"{name}: NO SPARK OUTPUT"); fails += 1; continue
        s = con.execute(f"SELECT * FROM read_parquet('{pq[0]}')").fetchdf()
        try:
            o = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {str(e)[:200]}"); fails += 1; continue
        s = s[sorted(s.columns)]
        o = o[sorted(o.columns)]
        if list(s.columns) != list(o.columns):
            print(f"{name}: SCHEMA {list(s.columns)} vs {list(o.columns)}")
            fails += 1; continue
        if len(s) != len(o):
            print(f"{name}: ROWS {len(s)} vs {len(o)}"); fails += 1; continue
        ok = True
        for c in s.columns:
            # The driver's hash is value-representation-sensitive: an
            # int64 Spark column vs a float64 oracle column (DuckDB
            # HUGEINT from a windowed/plain sum over BIGINT) red-rows
            # even when values are equal. Flag the kind mismatch here so
            # the local check fails exactly where the driver would.
            sk, ok_ = s[c].dtype.kind, o[c].dtype.kind
            if {sk, ok_} == {"i", "f"}:
                print(f"{name}: COL {c}: int/float dtype mismatch "
                      f"({s[c].dtype} vs {o[c].dtype}) — cast the oracle "
                      f"(DuckDB HUGEINT sums) to BIGINT")
                ok = False; fails += 1; break
            try:
                pd.testing.assert_series_equal(
                    s[c].reset_index(drop=True), o[c].reset_index(drop=True),
                    check_dtype=False, check_exact=True)
            except Exception as e:
                print(f"{name}: COL {c}: {str(e)[:200]}")
                ok = False; fails += 1; break
        if ok:
            print(f"{name}: OK rows={len(s)}")
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v2"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    sys.exit(main(out, sf))
