#!/usr/bin/env python3
"""Dev-only DuckDB oracle throughput baseline (NOT part of the shipped
library): times every oracle SQL from a `graft.Verify` dump against the same
parquet tables, so each round's BASELINE.md can publish a same-day
(Spark total, DuckDB total, ratio) pair measured on the same box.

Usage:
  python3 tools/bench_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            con.sql(sql).fetchall()
            dt = time.monotonic() - t0
        except Exception as e:
            dt = time.monotonic() - t0
            print(f"# {name} ERROR after {dt:.1f}s: {str(e)[:200]}", file=sys.stderr)
        times[name] = dt
        print(f"{name:34s} {dt:8.3f} s", file=sys.stderr)
    total = sum(times.values())
    print(json.dumps({"metric": "oracle_total", "value": round(total, 3),
                      "unit": "sec", "n_queries": len(times), "sf": sf_dir,
                      "queries": {k: round(v, 3) for k, v in sorted(times.items())}}))


if __name__ == "__main__":
    main()
