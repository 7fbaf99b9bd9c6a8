#!/usr/bin/env bash
# spark-submit packaging: zip the package, ship with --py-files.
# On a real cluster replace --master with yarn/k8s://... and size
# executors; everything else is unchanged (the engine has no
# local-mode assumptions beyond the default master in session.py).
#
#   scripts/submit.sh [pagerank_job args...]
#
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/graphscope_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" graphscope_spark)
exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  "$REPO/scripts/pagerank_job.py" "$@"
