#!/bin/bash
# Two-cluster-size scaling evidence on a REAL multi-executor Spark
# standalone cluster (one box): N=2 vs 4N=8 single-core executor JVMs,
# each with its own heap/GC, shuffling over localhost — the closest
# sandbox emulation of "N executors -> 4N executors" the north rule
# asks for (thread-mode local[N] shares one JVM heap and one
# allocator, which is NOT how executors scale on a cluster).
#
# Usage: scripts/cluster_scaling.sh [vertices] [rounds] [repeats]
# Output: one JSON line per run, appended to scripts/cluster_scaling_runs.jsonl
set -u
cd "$(dirname "$0")/.."
V="${1:-4000000}"
R="${2:-10}"
REP="${3:-2}"
export SPARK_MASTER_HOST=127.0.0.1 SPARK_LOCAL_IP=127.0.0.1
export PYSPARK_PYTHON="$(which python)"
OUT=scripts/cluster_scaling_runs.jsonl

start_workers() {  # $1 = count
  for i in $(seq 1 "$1"); do
    SPARK_WORKER_DIR=/tmp/spark-worker-$i /opt/spark/sbin/spark-daemon.sh start \
      org.apache.spark.deploy.worker.Worker "$i" spark://127.0.0.1:7077 \
      --host 127.0.0.1 --cores 1 --memory 10g --webui-port $((8090 + i)) \
      >/dev/null 2>&1
  done
  sleep 6
}

stop_workers() {  # $1 = count
  for i in $(seq 1 "$1"); do
    /opt/spark/sbin/spark-daemon.sh stop org.apache.spark.deploy.worker.Worker "$i" \
      >/dev/null 2>&1
  done
  sleep 3
}

/opt/spark/sbin/start-master.sh --host 127.0.0.1 --port 7077 >/dev/null 2>&1
sleep 4

for rep in $(seq 1 "$REP"); do
  for n in 8 2; do
    start_workers "$n"
    SPARK_DRIVER_MEMORY=8g python scripts/pagerank_job.py \
      --master spark://127.0.0.1:7077 --cores "$n" \
      --synthetic-vertices "$V" --rounds "$R" 2>/dev/null \
      | tail -1 | sed "s/^/{\"executors\":$n,\"rep\":$rep,\"run\":/;s/$/}/" >> "$OUT"
    stop_workers 8
  done
done
echo "CLUSTER_SCALING_DONE" >> "$OUT"
