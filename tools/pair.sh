#!/bin/bash
# One interleaved scaling pair: 32-core leg then 8-core leg, child JVMs
# exactly as graft.Bench spawns them (8g heap, ActiveProcessorCount).
# usage: pair.sh <corpusDir> [repeats] [parts] [extraJvmFlags...]
set -u
CORPUS=${1:-/tmp/graft-bench-corpusd-1000000}
REPEATS=${2:-2}
PARTS=${3:-256}
shift 3 2>/dev/null || shift $#
EXTRA=("$@")
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
run_leg() {
  local cores=$1
  java $OPENS -Xmx8g -XX:ActiveProcessorCount=$cores "${EXTRA[@]}" \
    -Dspark.ui.enabled=false -cp "$CP" graft.tools.DedupOnce \
    $cores "$CORPUS" $REPEATS $PARTS 2>/dev/null | grep DEDUP_ONCE_SECONDS
}
H=$(run_leg 32); L=$(run_leg 8)
TH=${H#DEDUP_ONCE_SECONDS=}; TL=${L#DEDUP_ONCE_SECONDS=}
echo "high32=$TH low8=$TL eff=$(python3 -c "print(f'{$TL/(4*$TH):.3f}')")"
