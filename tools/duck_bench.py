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
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(oracle_path) as f:
        oracle = json.load(f)
    out = {}
    for name in sorted(oracle):
        times = []
        try:
            t0 = time.perf_counter()
            con.sql(oracle[name]).fetchall()
            times.append(time.perf_counter() - t0)
            if times[0] < 2.0:
                for _ in range(2):
                    t0 = time.perf_counter()
                    con.sql(oracle[name]).fetchall()
                    times.append(time.perf_counter() - t0)
            out[name] = round(min(times), 3)
        except Exception as e:
            print(f"[duck_bench] {name} failed: {e}", file=sys.stderr)
            out[name] = None
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"[duck_bench] {len(out)} queries timed -> {out_path}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
