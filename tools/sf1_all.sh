#!/bin/bash
# Full sf1 artifact: 80/80 correctness sweep (per-SF goldens included)
# + probe-only bench, merged into one BENCH_SF1 record.
# The three DuckDB-pathological rows (dedup_clusters' recursive CTE
# OOM-poisons the shared oracle process; the pair giants blow the pandas
# compare) are excluded from the DuckDB round and covered by
# CcValidate / SweepValidate instead — same taxonomy as sf10.
# Run detached:
#   nohup tools/sf1_all.sh BENCH_SF1_r15.json > target/sf1_all.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_SF1_r15.json}
SF=target/sf1
DUMP=target/verify_sf1

rm -f target/sf1_oracle.txt target/sf1_oracle_r2.txt \
  target/sf1_pairvalidate.txt target/sf1_ccvalidate.txt

echo "== sf1 verify dump start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_NO_COALESCE=1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_GOLDEN_SF=sf1 \
  tools/run_main.sh graft.Verify "$SF" "$DUMP" 2>&1 \
  | grep -E '\[verify\]' || true
echo "== sf1 verify dump done $(date -u +%H:%M:%S)"

echo "== sf1 duckdb compare start $(date -u +%H:%M:%S)"
python3 tools/check_oracle.py "$SF" "$DUMP" --timeout 300 \
  --skip dedup_clusters,lsh_pairs,simhash_dedup,simhash_dedup_stats 2>&1 \
  | tee target/sf1_oracle.txt | tail -10
echo "== sf1 duckdb compare done $(date -u +%H:%M:%S)"

echo "== sf1 CcValidate start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.CcValidate "$SF" "$DUMP/dedup_clusters" 2>&1 \
  | grep -vE '^2[0-9]/' | tee target/sf1_ccvalidate.txt | tail -5
echo "== sf1 SweepValidate start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.SweepValidate "$SF" "$DUMP" 2>&1 \
  | grep -E '^\{' | tee target/sf1_pairvalidate.txt

echo "== sf1 bench start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=32g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=2 \
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_GOLDEN_SF=sf1 \
  tools/run_main.sh graft.Bench 2>&1 | grep '^{' | tail -1 \
  > target/sf1_bench_line.json
cp BENCH_RESULT.json target/sf1_bench_full.json
python3 tools/merge_sf10_bench.py target/sf1_bench_full.json "$OUT" target/sf1

# duck-baseline fallback: empty map → rebuild process-per-query and graft
if python3 -c "import json,sys; sys.exit(0 if json.load(open('$OUT')).get('duck_total', 0) == 0 else 1)"; then
  echo "== duck map fallback start $(date -u +%H:%M:%S)"
  tools/duck_map.sh "$SF" "$DUMP/oracle_sql.json" target/sf1_duck_map.txt
  python3 tools/attach_duck_map.py target/sf1_duck_map.txt "$OUT"
fi
echo "== sf1 all done $(date -u +%H:%M:%S)"
