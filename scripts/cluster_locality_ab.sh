#!/bin/bash
# Locality-wait A/B on the 4-executor leg (round 5): cached barrier
# partitions carry executor locality preferences, and the default
# spark.locality.wait=3s makes task waves stall for a preferred-but-
# busy executor — a per-stage floor that exists ONLY in multi-executor
# mode (a 1-exec leg has nowhere else to schedule, so it never waits).
# Interleaves default-wait vs wait=0 4-exec runs at 4M vertices x 10
# rounds; appends to cluster_scaling_runs.jsonl with mode r5_loc_ab.
# Usage: scripts/cluster_locality_ab.sh [reps]
set -u
cd "$(dirname "$0")/.."
REPS="${1:-2}"
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

for rep in $(seq 0 $((REPS - 1))); do
  for variant in default wait0; do
    EXTRA=""
    [ "$variant" = wait0 ] && EXTRA="--locality-wait 0s"
    start_workers 4
    SPARK_DRIVER_MEMORY=8g python scripts/pagerank_job.py \
      --master spark://127.0.0.1:7077 --cores 4 $EXTRA \
      --synthetic-vertices "$V" --rounds "$R" 2>/dev/null \
      | tail -1 \
      | sed "s/^/{\"mode\":\"r5_loc_ab\",\"variant\":\"$variant\",\"executors\":4,\"rep\":$rep,\"run\":/;s/$/}/" \
      | tee -a "$OUT"
    stop_workers
  done
done
/opt/spark/sbin/stop-master.sh >/dev/null 2>&1
