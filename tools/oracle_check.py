#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <outDir> [query_filter]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran: compares
each <outDir>/<name> parquet against the DuckDB execution of
<outDir>/oracle_sql.json's SQL over the same base tables. Build-time tool
only (driver-side python/duckdb) — not part of the shipped library.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and only not in name:
            continue
        sql = oracle[name]
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        wcols, gcols = sorted(want.columns), sorted(got.columns)
        if wcols != gcols:
            print(f"FAIL {name}: columns differ\n  oracle={wcols}\n  spark ={gcols}")
            n_fail += 1
            continue
        want, got = want[wcols], got[gcols]
        if len(want) != len(got):
            print(f"FAIL {name}: rows differ oracle={len(want)} spark={len(got)}")
            n_fail += 1
            continue
        wrows = sorted(tuple(canon(v) for v in r) for r in want.itertuples(index=False))
        grows = sorted(tuple(canon(v) for v in r) for r in got.itertuples(index=False))
        if wrows != grows:
            bad = [(w, g) for w, g in zip(wrows, grows) if w != g][:3]
            print(f"FAIL {name}: values differ; first diffs:")
            for w, g in bad:
                print(f"  oracle={w}\n  spark ={g}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(want)} rows)")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
