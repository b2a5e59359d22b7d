#!/usr/bin/env bash
# Cluster deployment shape (BASELINE.json north_rule: "runs via
# spark-submit --py-files on multi-executor clusters at N and 4N
# executors"). The sandbox has no cluster manager; this script documents
# and locally smoke-tests the exact packaging a YARN/k8s deployment uses.
#
#   ./tools/submit_example.sh                # local smoke (local[8])
#   MASTER=yarn EXECUTORS=250 ./tools/submit_example.sh   # real cluster
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${MASTER:-local[8]}"
EXECUTORS="${EXECUTORS:-8}"

# package the library for the executors' PYTHONPATH
rm -f /tmp/lightcrawler_spark.zip
python -m zipfile -c /tmp/lightcrawler_spark.zip lightcrawler_spark/

exec spark-submit \
  --master "$MASTER" \
  --name lightcrawler-bench \
  --py-files /tmp/lightcrawler_spark.zip \
  --conf spark.executor.instances="$EXECUTORS" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.coalescePartitions.parallelismFirst=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.shuffle.partitions=$((EXECUTORS * 4)) \
  bench.py
