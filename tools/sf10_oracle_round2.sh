#!/bin/bash
# Round-2 sf10 oracle compare: one check_oracle PROCESS per query, so a
# DuckDB OOM (dedup_clusters' recursive CTE exhausted the round-1
# process and poisoned every later query with thread/alloc failures)
# only costs its own row. Skips: queries already PASSed in round 1 and
# the pair-enumeration giants + dedup_clusters (SweepValidate /
# CcValidate cover them). Goldens sweep like everything else since the
# per-SF golden trees.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=target/sf10
OUT=target/verify_sf10
LOG=target/sf10_oracle_r2.txt
: > "$LOG"
SKIP="lsh_pairs simhash_dedup simhash_dedup_stats dedup_clusters"
PASSED=$(grep -E "^PASS" target/sf10_oracle.txt | awk '{print $2}')
for q in $(ls "$OUT" | grep -v oracle_sql.json | sort); do
  if echo "$SKIP $PASSED" | tr ' ' '\n' | grep -qx "$q"; then
    echo "SKIP $q (covered)" >> "$LOG"; continue
  fi
  timeout 900 python3 tools/check_oracle.py "$SF" "$OUT" --only "$q" \
    --timeout 300 2>&1 | grep -E "^(PASS|FAIL|TIMEOUT)" >> "$LOG" \
    || echo "FAIL $q: process died (OOM/timeout)" >> "$LOG"
done
echo "== round2 done $(date -u +%H:%M:%S)" >> "$LOG"
