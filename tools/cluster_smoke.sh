#!/bin/bash
# Run graft.ClusterSmoke on local-cluster[2,8,4096]: two separate worker
# JVMs, executors with their own classloaders/filesystem view — the
# cheapest honest stand-in for a multi-executor deployment. Worker dirs
# and logs are kept INSIDE the repo (workers default to SPARK_HOME/work,
# which is off-limits).
# Usage: tools/cluster_smoke.sh [sfDir]
set -uo pipefail
cd "$(dirname "$0")/.."
export SPARK_HOME=/opt/spark
# the executor launcher infers the Scala version from a BUILD tree
# (assembly/target/scala-*); a release layout has none — pin it
export SPARK_SCALA_VERSION=2.13
export SPARK_WORKER_DIR="$PWD/target/cluster-work"
export SPARK_LOG_DIR="$PWD/target/cluster-work/logs"
export SPARK_LOCAL_IP=127.0.0.1
mkdir -p "$SPARK_WORKER_DIR" "$SPARK_LOG_DIR"
SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-4g} \
  exec tools/run_main.sh graft.ClusterSmoke "${1:-/root/testdata/sf0.01}"
