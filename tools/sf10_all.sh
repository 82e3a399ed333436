#!/bin/bash
# Full sf10 artifact refresh: correctness sweep (round-1 + per-process
# round-2 oracle + CcValidate + SweepValidate), probe-only Bench with
# untimed index builds (build_s), and the bucketed-layout relational
# rows, merged into ONE self-contained BENCH_SF10 record.
# Run detached:
#   nohup tools/sf10_all.sh BENCH_SF10_r15.json > target/sf10_all.log 2>&1 &
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-BENCH_SF10_r15.json}

# stale inputs from a previous round must not leak into the merge
rm -f target/sf10_oracle.txt target/sf10_oracle_r2.txt \
  target/sf10_pairvalidate.txt target/sf10_ccvalidate.txt \
  target/sf10_bucketbench.txt target/sf10_shuffle.txt

tools/sf10_sweep.sh
echo "== oracle round2 start $(date -u +%H:%M:%S)"
tools/sf10_oracle_round2.sh
tail -5 target/sf10_oracle_r2.txt

echo "== sf10 bench start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=3 \
  SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_GOLDEN_SF=sf10 \
  tools/run_main.sh graft.Bench 2>&1 | grep '^{' | tail -1 \
  > target/sf10_bench_line.json
cp BENCH_RESULT.json target/sf10_bench_full.json
echo "== bucketbench start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.BucketBench 2>&1 | grep '\[bucketbench\]' \
  | tee target/sf10_bucketbench.txt
echo "== shuffle accounting start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_GOLDEN_SF=sf10 \
  tools/run_main.sh graft.BenchSuite --leg shuffle \
    simhash_dedup simhash_dedup_stats lsh_pairs jaccard_pairs dedup_clusters 2>&1 \
  | grep '\[shuffle\]' | tee target/sf10_shuffle.txt
python3 tools/merge_sf10_bench.py target/sf10_bench_full.json "$OUT"

# duck-baseline fallback: if Bench's in-process duck_bench child died or
# hit its wall budget (empty map), rebuild the per-query map one PROCESS
# per query (wedge-immune) and graft it into the artifact
if python3 -c "import json,sys; sys.exit(0 if json.load(open('$OUT')).get('duck_total', 0) == 0 else 1)"; then
  echo "== duck map fallback start $(date -u +%H:%M:%S)"
  tools/duck_map.sh target/sf10 target/verify_sf10/oracle_sql.json \
    target/sf10_duck_map.txt
  python3 tools/attach_duck_map.py target/sf10_duck_map.txt "$OUT"
fi
echo "== sf10 all done $(date -u +%H:%M:%S)"
