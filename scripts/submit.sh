#!/usr/bin/env bash
# spark-submit launch recipe (north rule: "launched via spark-submit --py-files").
#
# Usage:
#   scripts/submit.sh build --pages /path/pages.parquet --workdir /path/wd
#   scripts/submit.sh incremental --pages ... --delta ... --workdir ...
#   scripts/submit.sh query --workdir ... who_references "acme corp"
#
# Locally this uses local[*]; on a cluster add e.g.
#   MASTER="--master yarn --deploy-mode cluster --num-executors 200"
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="$(mktemp -d)/cgc.zip"
(cd "$REPO" && zip -qr "$ZIP" codegraphcontext_spark)

MASTER="${MASTER:---master local[${SPARK_GRAFT_CPUS:-32}]}"

exec spark-submit \
  $MASTER \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  "$REPO/scripts/driver.py" "$@"
