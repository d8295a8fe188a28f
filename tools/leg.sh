#!/bin/bash
# One DedupOnce leg: leg.sh <cores> <corpusDir> [repeats] [parts] [extra...]
set -u
CORES=$1; CORPUS=$2; REPEATS=${3:-1}; PARTS=${4:-256}
shift 4 2>/dev/null || shift $#
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
MAIN=${MAIN:-graft.tools.DedupOnce}
java $OPENS -Xmx8g -XX:ActiveProcessorCount=$CORES "$@" \
  -Dspark.ui.enabled=false -cp "$CP" $MAIN \
  $CORES "$CORPUS" $REPEATS $PARTS 2>/dev/null | grep _ONCE_SECONDS
