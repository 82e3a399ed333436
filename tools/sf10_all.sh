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
  target/sf10_bucketbench.txt

tools/sf10_sweep.sh
echo "== oracle round2 start $(date -u +%H:%M:%S)"
tools/sf10_oracle_round2.sh
tail -5 target/sf10_oracle_r2.txt

echo "== sf10 bench start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=2 \
  SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_GOLDEN_SF=sf10 \
  tools/run_main.sh graft.Bench 2>&1 | grep '^{' | tail -1 \
  > target/sf10_bench_line.json
cp BENCH_RESULT.json target/sf10_bench_full.json
echo "== bucketbench start $(date -u +%H:%M:%S)"
SPARK_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=target/sf10 SPARK_GRAFT_CPUS=32 \
  tools/run_main.sh graft.BucketBench 2>&1 | grep '\[bucketbench\]' \
  | tee target/sf10_bucketbench.txt
python3 tools/merge_sf10_bench.py target/sf10_bench_full.json "$OUT"
echo "== sf10 all done $(date -u +%H:%M:%S)"
