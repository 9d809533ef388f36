#!/usr/bin/env python3
"""Dev-only DTYPE-STRICT mirror of the driver's correctness compare (NOT part
of the shipped library). Complements tools/check.py, whose fetchall/repr lane
provably CANNOT see the dtype-coercion failure class that kept 17 queries red
through round 10: the driver reads the Spark parquet through pyarrow→pandas
(DECIMAL(38,0) → object-of-decimal.Decimal, BIGINT → int64) and its DuckDB
oracle through `.df()` (DECIMAL(38,0) and HUGEINT → float64), so a value-exact
query still hash-mismatches whenever the two lanes disagree on dtype. This
checker reproduces BOTH lanes and fails on:

  - pandas dtype divergence between the lanes (int64 vs float64 vs object);
  - decimal.Decimal cells in either lane (one lane always coerces them);
  - ndarray/list cells (the driver's pandas sort crashes on them — r10 st8);
  - an unsortable frame (same reason);
  - and, of course, any canonical value mismatch after sorting.

Usage:
  python3 tools/lane_check.py <sfDir> <verifyOutDir> [query ...]
"""
import datetime as dt
import decimal
import glob
import json
import math
import os
import sys
import threading

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

ORACLE_TIMEOUT = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "120"))

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def df_with_timeout(con, sql, seconds=ORACLE_TIMEOUT):
    """Oracle SQL → pandas through DuckDB's .df() lane (the driver's lane),
    interrupted past the budget (the check.py done-flag discipline)."""
    done = [False]
    lock = threading.Lock()

    def maybe_interrupt():
        with lock:
            if not done[0]:
                con.interrupt()

    timer = threading.Timer(seconds, maybe_interrupt)
    timer.start()
    try:
        return con.sql(sql).df()
    except duckdb.InterruptException:
        raise TimeoutError(f"oracle_timeout after {seconds:.0f}s")
    finally:
        with lock:
            done[0] = True
        timer.cancel()


def dtype_lane(dtype):
    """Collapse a pandas dtype to its comparison-lane kind. The driver's
    hash is computed over the coerced values, so two lanes only agree when
    their kinds agree."""
    k = dtype.kind  # i/u/f/b/M/m/O
    return {"u": "i"}.get(k, k)


def cell_problem(v):
    """Return a reason string if this cell is of a class the driver's compare
    mishandles regardless of value."""
    if isinstance(v, decimal.Decimal):
        return "decimal.Decimal cell (DECIMAL output column: lanes diverge)"
    if isinstance(v, (np.ndarray, list, tuple, dict)):
        return "array/struct cell (driver's pandas sort crashes on these)"
    return None


def canon(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # bit-identical doubles, same bar as check.py
    # one canonical rendering for the whole date/datetime lane: pyarrow
    # yields datetime.date objects for DATE where DuckDB's .df() yields
    # datetime64[us] midnights — the driver's gate treats these as equal
    # (every DATE-output query is green), so the mirror must too
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, dt.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        return pd.Timestamp(v).isoformat()
    return repr(v)


def all_datelike(series):
    """True if every non-null value is a date/datetime object."""
    seen = False
    for v in series:
        if v is None or v is pd.NaT:
            continue
        if not isinstance(v, (dt.date, dt.datetime, pd.Timestamp)):
            return False
        seen = True
    return seen


def sort_frame(df, cols, side):
    try:
        return df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    except Exception as e:
        raise RuntimeError(f"{side} frame unsortable (driver would err): {e}")


def compare(name, spark_df, oracle_df):
    """Return list of failure strings (empty = lane-exact)."""
    fails = []
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    if s_cols != o_cols:
        return [f"columns spark={s_cols} oracle={o_cols}"]
    spark_df = spark_df[s_cols]
    oracle_df = oracle_df[s_cols]
    if len(spark_df) != len(oracle_df):
        fails.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    # cell-class scan BEFORE sorting (an ndarray column breaks the sort)
    for c in s_cols:
        for side, df in (("spark", spark_df), ("oracle", oracle_df)):
            if df[c].dtype.kind == "O":
                for v in df[c].head(1000):
                    p = cell_problem(v)
                    if p:
                        fails.append(f"col {c} [{side}]: {p}")
                        break
    if fails:
        return fails
    # the dtype-strict core: the two lanes must agree on every column's kind.
    # ONE tolerated divergence, pinned green by the driver's own gate: DATE
    # columns arrive as object-of-datetime.date via pyarrow but datetime64
    # via DuckDB's .df(); values compare through the canonical ISO rendering.
    for c in s_cols:
        sk, ok = dtype_lane(spark_df[c].dtype), dtype_lane(oracle_df[c].dtype)
        if sk != ok:
            if {sk, ok} == {"O", "M"}:
                obj = spark_df[c] if sk == "O" else oracle_df[c]
                if all_datelike(obj):
                    continue
            fails.append(
                f"col {c}: dtype lanes diverge spark={spark_df[c].dtype} "
                f"oracle={oracle_df[c].dtype} (driver hash would mismatch)")
    if fails:
        return fails
    try:
        sg = sort_frame(spark_df, s_cols, "spark")
        og = sort_frame(oracle_df, s_cols, "oracle")
    except RuntimeError as e:
        return [str(e)]
    for c in s_cols:
        a, b = sg[c], og[c]
        bad = None
        for i in range(len(a)):
            av, bv = a.iloc[i], b.iloc[i]
            a_null = av is None or (isinstance(av, float) and math.isnan(av)) or av is pd.NaT
            b_null = bv is None or (isinstance(bv, float) and math.isnan(bv)) or bv is pd.NaT
            if a_null and b_null:
                continue
            if canon(av) != canon(bv):
                bad = (i, av, bv)
                break
        if bad:
            i, av, bv = bad
            fails.append(f"col {c} row {i}: spark={av!r} oracle={bv!r}")
    return fails


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
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark parquet under {out_dir}/{name}")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat(
                [pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        except Exception as e:
            print(f"FAIL {name}: spark parquet unreadable via pyarrow: {e}")
            n_fail += 1
            continue
        try:
            oracle_df = df_with_timeout(con, sql)
        except TimeoutError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        fails = compare(name, spark_df, oracle_df)
        if fails:
            print(f"FAIL {name}:")
            for f in fails[:8]:
                print(f"   {f}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows, lane-exact)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
