#!/usr/bin/env python3
"""Dev-only DuckDB oracle throughput baseline (NOT part of the shipped
library): times every oracle SQL from a `graft.Verify` dump against the same
parquet tables, so each round's BASELINE.md can publish a same-day
(Spark total, DuckDB total, ratio) pair measured on the same box.

Measurement discipline (round 14 — mirrors graft.Bench's Spark lane, so
ambient sandbox stalls are absorbed symmetrically instead of biasing the
published ratio):
  - pinned thread count (DUCKDB_GRAFT_THREADS, default = os.cpu_count(),
    recorded in the header) — the Spark lane pins local[N] the same way;
  - any query whose first run exceeds the 3 s floor re-runs once
    back-to-back and records the MIN, both timings logged to stderr
    (DuckDB has no JIT analog, so min-of-2 here guards ONLY against
    ambient stalls — the warmup asymmetry the Spark lane corrects with
    its sf0.001 code-warm pass does not exist in this lane);
  - a run-conditions header (host load, thread pin, timestamp) prints to
    stderr and rides the total line, so a published pair carries its
    conditions instead of being trusted bare;
  - a failing oracle records an error (and rc 1), never a fake timing.

Usage:
  python3 tools/bench_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

RERUN_FLOOR_SEC = 3.0


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    threads = int(os.environ.get("DUCKDB_GRAFT_THREADS", os.cpu_count()))
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0
    conditions = {"threads": threads, "load1_at_start": round(load1, 2),
                  "duckdb": duckdb.__version__,
                  "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(f"# conditions: {json.dumps(conditions)}", file=sys.stderr)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    times = {}
    errors = []

    def run_once(sql):
        t0 = time.monotonic()
        con.sql(sql).fetchall()
        return time.monotonic() - t0

    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            dt = run_once(sql)
            note = ""
            if dt > RERUN_FLOOR_SEC:
                # stall guard: min-of-2, both logged — same floor and
                # discipline as the Spark lane's heavy-tail re-run
                dt2 = run_once(sql)
                note = f"  (min of {dt:.3f}/{dt2:.3f} s)"
                dt = min(dt, dt2)
            times[name] = dt
            print(f"{name:34s} {dt:8.3f} s{note}", file=sys.stderr)
        except Exception as e:
            errors.append(name)
            print(f"# {name} ERROR: {str(e)[:200]}", file=sys.stderr)
    total = sum(times.values())
    print(json.dumps({"metric": "oracle_total", "value": round(total, 3),
                      "unit": "sec", "n_queries": len(times),
                      "errors": len(errors), "failed": errors,
                      "conditions": conditions, "sf": sf_dir,
                      "queries": {k: round(v, 3) for k, v in sorted(times.items())}}))
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
