#!/usr/bin/env python3
"""Dev-only local mirror of the driver's correctness gate (NOT part of the
shipped library): runs each oracle SQL in DuckDB over the same parquet tables
and diffs against the parquet written by `graft.Verify`.

Usage:
  python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Every oracle runs under a wall-clock timeout (GRAFT_ORACLE_TIMEOUT seconds,
default 120): a pathological oracle reports `oracle_timeout` and fails that
one query instead of hanging the whole gate (the r7 w17_adx lesson).
"""
import json
import math
import os
import sys
import threading

import duckdb

ORACLE_TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "120"))


def fetch_with_timeout(con, sql, seconds=ORACLE_TIMEOUT):
    """Run `sql` to completion; interrupt the connection if it exceeds the
    budget. Raises TimeoutError on interrupt.

    The done-flag (checked under a lock inside the timer callback) closes
    the race where the timer fires after fetchall() returned but before
    timer.cancel(): a late interrupt would otherwise land on the shared
    connection and spuriously abort the NEXT query's oracle."""
    done = [False]
    lock = threading.Lock()

    def maybe_interrupt():
        with lock:
            if not done[0]:
                con.interrupt()

    timer = threading.Timer(seconds, maybe_interrupt)
    timer.start()
    try:
        rows = con.sql(sql).fetchall()
        return rows
    except duckdb.InterruptException:
        raise TimeoutError(f"oracle_timeout after {seconds:.0f}s")
    finally:
        # set done under the lock BEFORE cancel, on every exit path: if any
        # exception (not just InterruptException) escapes fetchall near the
        # deadline, cancel() can't stop an already-running maybe_interrupt,
        # which would otherwise see done=False and interrupt the shared
        # connection, poisoning the NEXT query's oracle.
        with lock:
            done[0] = True
        timer.cancel()

def quoted(cols):
    # reserved-word column names (tx23's left/right) must be quoted
    return ['"%s"' % c for c in cols]


TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: we demand bit-identical doubles
    return repr(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got.columns)
            got_rows = con.sql(
                f"SELECT {', '.join(quoted(got_cols))} FROM got ORDER BY ALL").fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        try:
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_rows = fetch_with_timeout(
                con, f"SELECT {', '.join(quoted(exp_cols))} FROM exp ORDER BY ALL")
        except TimeoutError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns spark={got_cols} oracle={exp_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount spark={len(got_rows)} oracle={len(exp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, e) in enumerate(zip(got_rows, exp_rows)):
            if tuple(map(canon, g)) != tuple(map(canon, e)):
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: row {i} differs (cols {got_cols})")
            for c, (gv, ev) in enumerate(zip(g, e)):
                if canon(gv) != canon(ev):
                    print(f"   col {got_cols[c]}: spark={gv!r} oracle={ev!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
