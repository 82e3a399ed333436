#!/usr/bin/env python3
"""Merge the sf10 Spark bench line with the correctness-sweep record.

Usage: tools/merge_sf10_bench.py <bench_json_line_file> <out.json> [prefix]

`prefix` (default target/sf10) names the sweep-file family to attach —
pass target/sf1 to merge an sf1 sweep.

Reads the one-line JSON graft.Bench printed (which already embeds the
per-query DuckDB map from tools/duck_bench.py with its 30 s clamp) and
attaches the sf10 correctness taxonomy assembled from:
  - target/sf10_oracle.txt      (round-1 compare, pre-isolation)
  - target/sf10_oracle_r2.txt   (round-2 per-process compare)
  - target/sf10_pairvalidate.txt (SweepValidate JSON lines)
  - target/sf10_ccvalidate.txt   (CcValidate verdict line, if present)
so BENCH_SF10_r14.json is one self-contained artifact.
"""
import json
import os
import re
import sys

bench_file, out = sys.argv[1], sys.argv[2]
prefix = sys.argv[3] if len(sys.argv) > 3 else "target/sf10"
sfname = os.path.basename(prefix)

with open(bench_file) as f:
    line = next(l for l in f if l.startswith("{"))
rec = json.loads(line)

status = {}


def mark(q, st, src):
    # later sources override earlier (round2 supersedes round1)
    status[q] = {"status": st, "via": src}


for path, src in [(f"{prefix}_oracle.txt", "duckdb_r1"),
                  (f"{prefix}_oracle_r2.txt", "duckdb_r2")]:
    if not os.path.exists(path):
        continue
    for l in open(path):
        m = re.match(r"^(PASS|FAIL|TIMEOUT) (\w+)", l)
        if m:
            st, q = m.groups()
            # round-1 rows poisoned by the duckdb OOM are not real FAILs
            if src == "duckdb_r1" and ("can't start new thread" in l
                                       or "Out of Memory" in l):
                continue
            mark(q, st.lower(), src)

if os.path.exists(f"{prefix}_pairvalidate.txt"):
    for l in open(f"{prefix}_pairvalidate.txt"):
        try:
            d = json.loads(l)
        except ValueError:
            continue
        if "query" in d:
            mark(d["query"], "pass" if d.get("pass") == 1 else "fail",
                 "spark_validator")

if os.path.exists(f"{prefix}_ccvalidate.txt"):
    txt = open(f"{prefix}_ccvalidate.txt").read()
    if "VALID fixpoint" in txt:
        mark("dedup_clusters", "pass", "cc_validator")

# bucketed-layout rows for the relational tail (graft.BucketBench at
# sf10): plain vs bucketed best-of-3 seconds + executed-plan exchange
# counts, attached verbatim so the artifact carries the layout lever
if os.path.exists(f"{prefix}_bucketbench.txt"):
    rows = []
    for l in open(f"{prefix}_bucketbench.txt"):
        i = l.find("{")
        if i < 0:
            continue
        try:
            d = json.loads(l[i:])
        except ValueError:
            continue
        if "query" in d or "floor" in d or "bucket_build" in d:
            rows.append(d)
    if rows:
        rec["bucketed"] = [r for r in rows if "bucket_build" not in r]
        # the one-time bucketed-layout write cost, disclosed next to the
        # index builds it is analogous to (ADVICE r16: the headline swap
        # must not hide the layout's build cost)
        for r in rows:
            if "bucket_build" in r:
                rec.setdefault("build_s", {})["bucketed_layout"] = r["sec"]
        # HEADLINE = the bucketed layout for the relational tail (the
        # layout a warehouse deployment would use; VERDICT r15 item 1) —
        # the flat-scan time moves to queries_flat as the secondary row.
        # Totals are recomputed so value/comparable reflect the headline.
        flat = {}
        for d in rows:
            q = d.get("query")
            if q and q in rec.get("queries", {}) and "bucketed_sec" in d:
                flat[q] = rec["queries"][q]
                rec["queries"][q] = d["bucketed_sec"]
        if flat:
            rec["queries_flat"] = flat
            rec["layout_note"] = (
                "relational rows (queries_flat keys) run the orderkey/"
                "partkey/custkey-bucketed layout in the headline; flat-"
                "parquet times kept in queries_flat. The ratio is layout-"
                "asymmetric: Spark reads the bucketed warehouse for these "
                "rows while DuckDB reads flat parquet; the one-time layout "
                "write cost is disclosed as build_s.bucketed_layout and is "
                "NOT in the headline totals (write-once, amortized across "
                "every query of the family)")
            rec["value"] = round(sum(v for v in rec["queries"].values()
                                     if isinstance(v, (int, float))), 3)
            comp = rec.get("comparable")
            if isinstance(comp, dict):
                golden = set(rec.get("golden", []))
                timeouts = set(rec.get("duck_timeouts", []))
                duck = rec.get("duck", {})
                pairs = [(q, t, duck[q]) for q, t in rec["queries"].items()
                         if isinstance(t, (int, float)) and q not in golden
                         and q not in timeouts
                         and isinstance(duck.get(q), (int, float))]
                comp["n"] = len(pairs)
                comp["spark_total"] = round(sum(p[1] for p in pairs), 3)
                comp["duck_total"] = round(sum(p[2] for p in pairs), 3)
                if comp["duck_total"]:
                    comp["ratio"] = round(
                        comp["spark_total"] / comp["duck_total"], 3)

# shuffle-byte accounting for the heavy pair-producing rows
# (graft.BenchSuite --leg shuffle): write/read bytes + records per query
if os.path.exists(f"{prefix}_shuffle.txt"):
    sh = {}
    for l in open(f"{prefix}_shuffle.txt"):
        i = l.find("{")
        if i < 0:
            continue
        try:
            d = json.loads(l[i:])
        except ValueError:
            continue
        if "query" in d:
            sh[d.pop("query")] = d
    if sh:
        rec["shuffle_bytes"] = sh
        # VERDICT r16 item 6: these rows come from a SEPARATE
        # instrumentation process (metrics-listener session, its own JVM
        # warmup), so their `sec` values are not the headline timings —
        # only the byte/record counts are the measurement.
        rec["shuffle_bytes_note"] = (
            "measured in a separate instrumentation run (BenchSuite --leg "
            "shuffle, own JVM/session); sec values reflect that run's "
            "context and are not comparable to the headline queries map — "
            "read only bytes/records from this table")

# golden-backed queries: since the per-SF golden trees (golden/sf10)
# these sweep like everything else — only mark excluded when the sweep
# genuinely produced no row for one (pre-per-SF-tree artifacts)
GOLDEN = ["embed_text", "media_features", "mmr_topk", "simhash_fp",
          "sparse_corpus_score", "sparse_score"]
for q in GOLDEN:
    if q not in status:
        mark(q, "excluded_golden_sf0.01", "design")

rec[f"{sfname}_correctness"] = dict(sorted(status.items()))
rec[f"{sfname}_correctness_summary"] = {
    "pass": sum(1 for v in status.values() if v["status"] == "pass"),
    "fail": sum(1 for v in status.values() if v["status"] == "fail"),
    "timeout": sum(1 for v in status.values() if v["status"] == "timeout"),
    "excluded_golden": sum(1 for v in status.values()
                           if v["status"].startswith("excluded_golden")),
}
with open(out, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps(rec[f"{sfname}_correctness_summary"]))
