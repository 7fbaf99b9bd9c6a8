#!/bin/bash
# Round-4 executor-mode scaling unit (VERDICT r3 task 5): ONE
# interleaved 1-vs-4 single-core-executor pair on a real standalone
# cluster (separate worker JVMs, localhost shuffle), 4M vertices /
# 13.1M edges x 10 fixed rounds.  Appends to cluster_scaling_runs.jsonl.
# Usage: scripts/cluster_scaling4.sh [rep]
set -u
cd "$(dirname "$0")/.."
REP="${1:-0}"
V=4000000
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

# interleave order by rep parity
if [ $((REP % 2)) -eq 0 ]; then ORDER="1 4"; else ORDER="4 1"; fi
for n in $ORDER; do
  start_workers "$n"
  SPARK_DRIVER_MEMORY=8g python scripts/pagerank_job.py \
    --master spark://127.0.0.1:7077 --cores "$n" \
    --synthetic-vertices "$V" --rounds "$R" 2>/dev/null \
    | tail -1 | sed "s/^/{\"mode\":\"r4_1v4\",\"executors\":$n,\"rep\":$REP,\"run\":/;s/$/}/" \
    | tee -a "$OUT"
  stop_workers
done
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1
