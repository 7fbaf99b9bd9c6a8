#!/bin/bash
# Round-5 executor-mode scaling, AMORTIZED shape: one interleaved
# 1-vs-4 single-core-executor pair at 8M vertices / 26.2M edges x 10
# fixed rounds — double the per-round compute of cluster_scaling4.sh so
# the per-round driver/scheduler fixed cost (decomposed in BENCH.md
# round-5: ~constant per round, caps 1->4 efficiency at ~0.92 on the 4M
# shape) weighs half as much.  This is the 100TB-regime question: does
# efficiency recover when per-round work dominates the floor?
# Appends to cluster_scaling_runs.jsonl with mode r5_big_1v4.
# Usage: scripts/cluster_scaling_big.sh [rep]
set -u
cd "$(dirname "$0")/.."
REP="${1:-0}"
V=8000000
R=10
export SPARK_MASTER_HOST=127.0.0.1 SPARK_LOCAL_IP=127.0.0.1
export PYSPARK_PYTHON="$(which python)"
OUT=scripts/cluster_scaling_runs.jsonl

start_workers() {
  for i in $(seq 1 "$1"); do
    SPARK_WORKER_DIR=/tmp/spark-worker-$i /opt/spark/sbin/spark-daemon.sh start \
      org.apache.spark.deploy.worker.Worker "$i" spark://127.0.0.1:7077 \
      --host 127.0.0.1 --cores 1 --memory 12g --webui-port $((8090 + i)) \
      >/dev/null 2>&1
  done
  sleep 6
}
stop_workers() {
  for i in $(seq 1 8); do
    /opt/spark/sbin/spark-daemon.sh stop org.apache.spark.deploy.worker.Worker "$i" \
      >/dev/null 2>&1
  done
  sleep 3
}

/opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077 >/dev/null 2>&1
sleep 4

if [ $((REP % 2)) -eq 0 ]; then ORDER="1 4"; else ORDER="4 1"; fi
for n in $ORDER; do
  start_workers "$n"
  SPARK_DRIVER_MEMORY=8g python scripts/pagerank_job.py \
    --master spark://127.0.0.1:7077 --cores "$n" \
    --synthetic-vertices "$V" --rounds "$R" 2>/dev/null \
    | tail -1 | sed "s/^/{\"mode\":\"r5_big_1v4\",\"executors\":$n,\"rep\":$REP,\"run\":/;s/$/}/" \
    | tee -a "$OUT"
  stop_workers
done
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1
