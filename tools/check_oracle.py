#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> \
           [--only a,b] [--skip a,b] [--timeout SECS]

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with views
over <sfDir>/*.parquet, loads the Spark parquet result from
<verifyOutDir>/<name>/, sorts columns by name + rows by all columns, and
compares values exactly (reporting max float deltas on mismatch).

--timeout interrupts a DuckDB oracle run past SECS (default: none) and
records the query as TIMEOUT rather than FAIL — for beyond-the-gate
sweeps at larger SFs where a pathological baseline (the recursive-CTE
clustering) would stall the whole compare.
"""
import json
import sys
import glob
import threading
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_with_timeout(con, sql, timeout_s):
    """(df, timed_out): interrupt-based DuckDB timeout (duck_bench mold)."""
    if not timeout_s:
        return con.sql(sql).df(), False
    done = threading.Event()
    lock = threading.Lock()

    def watchdog():
        if not done.wait(timeout_s):
            with lock:
                if not done.is_set():
                    con.interrupt()

    t0 = time.perf_counter()
    threading.Thread(target=watchdog, daemon=True).start()
    try:
        df = con.sql(sql).df()
        with lock:
            done.set()
        return df, False
    except duckdb.InterruptException:
        elapsed = time.perf_counter() - t0
        with lock:
            done.set()
        if elapsed < timeout_s * 0.9:  # stray interrupt hit a fast query
            return run_with_timeout(con, sql, timeout_s)
        return None, True
    finally:
        done.set()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = skip = None
    timeout_s = None
    argv = sys.argv[3:]
    while argv:
        flag = argv.pop(0)
        if flag == "--only":
            only = set(argv.pop(0).split(","))
        elif flag == "--skip":
            skip = set(argv.pop(0).split(","))
        elif flag == "--timeout":
            timeout_s = float(argv.pop(0))
        else:
            sys.exit(f"unknown flag {flag}")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = n_timeout = 0
    for name in sorted(oracle):
        if (only is not None and name not in only) or (skip and name in skip):
            continue
        sql = oracle[name]
        try:
            expect, timed_out = run_with_timeout(con, sql, timeout_s)
            if timed_out:
                print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s (skipped)")
                n_timeout += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in files])
        if sorted(got.columns) != sorted(expect.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != "
                  f"{sorted(expect.columns)}")
            n_fail += 1
            continue
        g, e = canon(got), canon(expect)
        # normalize dtypes for compare (duckdb may give hugeint->object etc.)
        for c in g.columns:
            if g[c].dtype != e[c].dtype:
                try:
                    e[c] = e[c].astype(g[c].dtype)
                except Exception:
                    g[c] = g[c].astype(str)
                    e[c] = e[c].astype(str)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        if g.equals(e):
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            diff_cols = [c for c in g.columns if not g[c].equals(e[c])]
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:3]:
                neq = g[c] != e[c]
                # NaN == NaN treated equal by .equals but != here; recheck
                both_nan = g[c].isna() & e[c].isna()
                neq = neq & ~both_nan
                if neq.sum() == 0:
                    print(f"  {c}: only NaN-representation diffs")
                    continue
                idx = neq[neq].index[:5]
                print(f"  {c}: {int(neq.sum())} diffs, e.g. got="
                      f"{g.loc[idx, c].tolist()} want={e.loc[idx, c].tolist()}")
            n_fail += 1
    extra = f", {n_timeout} timeout" if n_timeout else ""
    print(f"== {n_pass} pass, {n_fail} fail{extra} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
