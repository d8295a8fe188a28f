#!/bin/bash
# One local-cluster DedupOnce leg exactly as graft.Bench spawns it:
#   execleg.sh <NxC> <totalCores> [repeats] [parts]
# env: SPARK_GRAFT_EXTRA_CONFS for A/B spark confs, SPARK_GRAFT_TASK_METRICS=1
# prints TASK_METRICS lines + DEDUP_ONCE_SECONDS.
set -u
SPEC=$1; TOTAL=$2; REPEATS=${3:-1}; PARTS=${4:-256}
CORPUS=${CORPUS:-/tmp/graft-bench-corpusd-1000000-bucketed}
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_SCALA_VERSION=2.13 SPARK_WORKER_DIR=/tmp/graft-worker \
java $OPENS -Xmx8g -XX:ActiveProcessorCount=$TOTAL \
  -Dspark.ui.enabled=false -cp "$CP" graft.tools.DedupOnce \
  "$SPEC" "$CORPUS" "$REPEATS" "$PARTS" 2>/dev/null \
  | grep -E "TASK_METRICS|DEDUP_ONCE_SECONDS"
