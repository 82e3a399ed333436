#!/usr/bin/env python3
"""Attach a tools/duck_map.sh per-query DuckDB map to a bench artifact.

Usage: tools/attach_duck_map.py <duck_map.txt> <bench_artifact.json>

Fallback for runs where graft.Bench's in-process duck_bench child died
or hit its wall budget (the map comes back empty): duck_map times each
oracle query in its OWN process (same 30 s interrupt-floor semantics),
and this script grafts the map into the artifact's `duck` /
`duck_total` / `duck_timeouts` fields in place.
"""
import json
import sys

map_file, artifact = sys.argv[1], sys.argv[2]

times, timeouts = {}, []
for l in open(map_file):
    parts = l.split()
    if len(parts) >= 2 and parts[0] != "==":
        q = parts[0]
        if parts[1] == "ERROR":
            continue
        try:
            times[q] = float(parts[1])
        except ValueError:
            continue
        if "TIMEOUT" in parts[2:]:
            timeouts.append(q)

rec = json.load(open(artifact))
rec["duck"] = {q: times.get(q) for q in rec.get("queries", {})}
rec["duck_total"] = round(sum(v for v in rec["duck"].values() if v), 3)
rec["duck_timeouts"] = sorted(timeouts)
rec["duck_via"] = "tools/duck_map.sh (process-per-query; 30 s interrupt floor)"
# the comparable-subset ratio (golden + timeout rows excluded) came back
# null when the in-process baseline died — rebuild it from the new map
golden = set(rec.get("golden", []))
to = set(rec["duck_timeouts"])
pairs = [(t, rec["duck"][q]) for q, t in rec.get("queries", {}).items()
         if isinstance(t, (int, float)) and q not in golden and q not in to
         and isinstance(rec["duck"].get(q), (int, float))]
if pairs:
    spark_t = round(sum(p[0] for p in pairs), 3)
    duck_t = round(sum(p[1] for p in pairs), 3)
    rec["comparable"] = {"n": len(pairs), "spark_total": spark_t,
                         "duck_total": duck_t,
                         "ratio": round(spark_t / duck_t, 3) if duck_t else None}
with open(artifact, "w") as f:
    json.dump(rec, f, indent=1)
print(json.dumps({"attached": len(times), "duck_total": rec["duck_total"],
                  "timeouts": len(timeouts)}))
