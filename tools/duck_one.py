#!/usr/bin/env python3
"""Time ONE oracle query in DuckDB in its own process.

Same timing semantics as tools/duck_bench.py (30 s interrupt ceiling
recorded AT the ceiling as a conservative DuckDB floor; queries under
2 s re-run twice and report the min), but process-per-query so a wedged
interrupt — duck_bench's in-process watchdog deadlocked mid-run on the
sf10 sweep — costs only its own row. Driven by tools/duck_map.sh, which
assembles the per-query map duck_bench would have produced.

Usage: duck_one.py <sfDir> <oracle_sql.json> <query>
Prints one line: `<query> <seconds>` (the 30 s ceiling itself when
interrupted — the conservative DuckDB floor, flagged with a trailing
TIMEOUT marker: `<query> 30.0 TIMEOUT`).
"""
import json
import sys
import threading
import time

import duckdb

QUERY_TIMEOUT_S = 30.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def timed_run(con, sql):
    done = threading.Event()
    lock = threading.Lock()

    def watchdog():
        if not done.wait(QUERY_TIMEOUT_S):
            with lock:
                if not done.is_set():
                    con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    t0 = time.monotonic()
    try:
        con.execute(sql).fetchall()
        timed_out = False
    except duckdb.InterruptException:
        timed_out = True
    finally:
        with lock:
            done.set()
    return time.monotonic() - t0, timed_out


def main():
    sf_dir, oracle_path, name = sys.argv[1], sys.argv[2], sys.argv[3]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = json.load(open(oracle_path))[name]
    sec, timed_out = timed_run(con, sql)
    if timed_out:
        # record AT the ceiling — a conservative LOWER bound for DuckDB
        print(f"{name} {QUERY_TIMEOUT_S} TIMEOUT")
        return
    times = [sec]
    if sec < 2.0:
        for _ in range(2):
            t2, to2 = timed_run(con, sql)
            if not to2:  # an interrupted re-run is not a valid sample
                times.append(t2)
    print(f"{name} {round(min(times), 3)}")


if __name__ == "__main__":
    main()
