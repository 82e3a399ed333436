#!/bin/bash
# Full 80-query correctness sweep at sf10 (VERDICT r13 item 1).
# Chain: Verify dump -> DuckDB compare (where it completes) ->
# CcValidate (dedup_clusters fixpoint) -> SweepValidate (pair family).
# Run detached: nohup tools/sf10_sweep.sh > target/sf10_sweep.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
SF=target/sf10
OUT=target/verify_sf10
# per-SF goldens: SPARK_GRAFT_GOLDEN_SF=sf10 points the dumped golden
# oracle SQL at the committed golden/sf10 tree, so the golden-backed six
# are swept like everything else. lsh_pairs/simhash_dedup dumps are
# pair-enumeration giants the pandas compare cannot hold, and
# dedup_clusters' recursive-CTE oracle OOM-poisons the shared round-1
# DuckDB process ("can't start new thread" on every later query, seen
# r14 AND r15) -- SweepValidate/CcValidate cover all three
GIANT=lsh_pairs,simhash_dedup,simhash_dedup_stats,dedup_clusters

echo "== verify dump start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_NO_COALESCE=1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_GOLDEN_SF=sf10 \
  tools/run_main.sh graft.Verify "$SF" "$OUT" 2>&1 \
  | grep -E '\[verify\]' || true
echo "== verify dump done $(date -u +%H:%M:%S)"

df -h / | tail -1

echo "== duckdb compare start $(date -u +%H:%M:%S)"
# hard wall: the shared round-1 process has twice wedged AFTER its OOM
# poisoning (r16: 28 min silent at 60 GB resident) — round 2 re-runs
# everything round 1 didn't PASS, so killing round 1 loses nothing
timeout 2700 python3 tools/check_oracle.py "$SF" "$OUT" --timeout 300 \
  --skip "$GIANT" 2>&1 | tee target/sf10_oracle.txt | tail -30
echo "== duckdb compare done $(date -u +%H:%M:%S)"

echo "== CcValidate (dedup_clusters) start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.CcValidate "$SF" "$OUT/dedup_clusters" 2>&1 \
  | grep -vE '^2[0-9]/' | tee target/sf10_ccvalidate.txt | tail -20
echo "== CcValidate done $(date -u +%H:%M:%S)"

echo "== SweepValidate (pair family) start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.SweepValidate "$SF" "$OUT" 2>&1 \
  | grep -E '^\{' | tee target/sf10_pairvalidate.txt
echo "== SweepValidate done $(date -u +%H:%M:%S)"
echo "== sweep complete $(date -u +%H:%M:%S)"
