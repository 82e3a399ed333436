#!/bin/bash
# Per-query DuckDB timing map over every oracle query, one PROCESS per
# query (see tools/duck_one.py — duck_bench's in-process interrupt
# watchdog deadlocked mid-run on the sf10 sweep, so a wedge must cost
# one row, not the run). Output lines in $3 (one per query):
#   <query> <sec>            completed
#   <query> 30.0 TIMEOUT     hit the interrupt ceiling (floor recorded)
#   <query> ERROR            duck_one.py itself failed (missing module,
#                            bad oracle path, killed by the outer
#                            timeout) — NEVER recorded as a timing row
# Usage: tools/duck_map.sh [sfDir] [oracle_sql.json] [outFile]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-target/sf10}
ORACLE=${2:-target/verify_sf10/oracle_sql.json}
OUTF=${3:-target/sf10_duck_map.txt}
[ -f "$ORACLE" ] || { echo "no oracle json at $ORACLE" >&2; exit 1; }
: > "$OUTF"
for q in $(python3 -c "import json;print(' '.join(sorted(json.load(open('$ORACLE')))))"); do
  # capture stdout and append it ONLY on exit 0: duck_one printing its
  # row and then wedging (killed by the outer timeout after the print)
  # must not leave BOTH a timing row and an ERROR row for one query
  if out=$(timeout 60 python3 tools/duck_one.py "$SF" "$ORACLE" "$q"); then
    printf '%s\n' "$out" >> "$OUTF"
  else
    echo "$q ERROR" >> "$OUTF"
  fi
done
echo "== duck_map done $(date -u +%H:%M:%S)" >> "$OUTF"
