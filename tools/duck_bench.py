#!/usr/bin/env python3
"""Per-query DuckDB baseline timings for the bench artifact.

Usage: python3 tools/duck_bench.py <sfDir> <oracle_sql.json> <out.json>

Times each oracle SQL in DuckDB (views over <sfDir>/*.parquet, full
materialization via fetchall) and writes {name: seconds} JSON. Adaptive
reps: every query runs once; queries under 2 s run twice more and report
the min (steady state), slower ones report the single run so a
pathological baseline (e.g. a recursive-CTE clustering at 70+ s) does not
triple the bench wall-clock. Errors report null.

graft.Bench shells out to this script when python3+duckdb are available
and merges the result into BENCH_RESULT.json, so the per-query 2x gate is
mechanically checkable; it is also runnable standalone.
"""
import json
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Per-query ceiling: a pathological baseline (the recursive-CTE clustering
# runs ~76 s at sf0.1) must not stall the whole bench. A query that hits
# the ceiling is interrupted and recorded AT the ceiling — a conservative
# LOWER bound for DuckDB — and listed under "_timeouts" in the output.
QUERY_TIMEOUT_S = 30.0


def timed_run(con, sql):
    """Run sql with an interrupt-based timeout. Returns (seconds, timed_out)."""
    done = threading.Event()
    lock = threading.Lock()  # serializes "query finished" vs interrupt()

    def watchdog():
        if not done.wait(QUERY_TIMEOUT_S):
            # Re-check under the lock: if the query completed right at the
            # boundary, done is now set and interrupting would poison the
            # NEXT timed_run on this shared connection.
            with lock:
                if not done.is_set():
                    con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    t0 = time.perf_counter()
    try:
        con.sql(sql).fetchall()
        with lock:
            done.set()
        return time.perf_counter() - t0, False
    except duckdb.InterruptException:
        elapsed = time.perf_counter() - t0
        with lock:
            done.set()
        if elapsed < QUERY_TIMEOUT_S * 0.9:
            # A stray interrupt (e.g. leaked from a prior run) hit a fast
            # query — retry once rather than record a spurious timeout.
            return timed_run(con, sql)
        return QUERY_TIMEOUT_S, True
    finally:
        done.set()


def main():
    sf_dir, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_path) as f:
        oracle = json.load(f)
    out = {}
    timeouts = []
    for name in sorted(oracle):
        try:
            t, timed_out = timed_run(con, oracle[name])
            times = [t]
            if not timed_out and t < 2.0:
                for _ in range(2):
                    t2, _ = timed_run(con, oracle[name])
                    times.append(t2)
            if timed_out:
                timeouts.append(name)
                print(f"[duck_bench] {name} hit the {QUERY_TIMEOUT_S:.0f}s "
                      "ceiling; recording the floor", file=sys.stderr)
            out[name] = round(min(times), 3)
        except Exception as e:
            print(f"[duck_bench] {name} failed: {e}", file=sys.stderr)
            out[name] = None
    out["_timeouts"] = timeouts
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"[duck_bench] {len(out) - 1} queries timed -> {out_path}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
