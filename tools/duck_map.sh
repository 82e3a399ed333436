#!/bin/bash
# Per-query DuckDB timing map over every oracle query, one PROCESS per
# query (see tools/duck_one.py). Output: one `<query> <sec|TIMEOUT>`
# line per query in $2 (default target/sf10_duck_map.txt).
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-target/sf10}
OUTF=${2:-target/sf10_duck_map.txt}
ORACLE=target/verify_sf10/oracle_sql.json
: > "$OUTF"
for q in $(python3 -c "import json;print(' '.join(sorted(json.load(open('$ORACLE')))))"); do
  timeout 60 python3 tools/duck_one.py "$SF" "$ORACLE" "$q" >> "$OUTF" 2>/dev/null \
    || echo "$q TIMEOUT" >> "$OUTF"
done
echo "== duck_map done $(date -u +%H:%M:%S)" >> "$OUTF"
