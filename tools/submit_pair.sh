#!/bin/bash
# submit_pair.sh — the north rule's LITERAL protocol: the production job
# submitted via spark-submit on a multi-executor standalone cluster at two
# cluster sizes (N and 4N executors), same input, same config; throughput
# at both plus scaling efficiency.
#
#   tools/submit_pair.sh [corpusDir] [outJson]
#
# Runs graft.Main (the checkpointed production pipeline: every stage
# written to the work dir with per-partition lineage + metrics, resumable
# by --run-id) under local-cluster[N,2,8192]: N real executor JVMs of
# 2 cores / 8 GiB each (round 5: 1-core executor JVMs are an unfaithful
# unit — SerialGC ergonomics under an 8g heap and C2/GC/netty sharing the
# lone task core inflate shuffle write 22x; 2 cores is the smallest
# faithful executor, BENCH/BASELINE.md round-5 section). Legs are
# bracketed 8,2,8 — the short legs sample
# the host window on both sides of the long one (this shared VM drifts
# ±20-30% on a scale of minutes).
set -e
CORPUS=${1:-/tmp/graft-bench-corpusd-1000000-bucketed}
OUT=${2:-BENCH/submit_pair.json}
JAR=target/scala-2.13/apachedatasketchesgospark_2.13-0.1.0.jar
SUBMIT=${SPARK_HOME:-/opt/spark}/bin/spark-submit
export SPARK_SCALA_VERSION=2.13 SPARK_WORKER_DIR=/tmp/graft-worker

leg() { # leg <nExecs> <runTag>  -> seconds on stdout
  local n=$1 tag=$2
  local work=/tmp/graft-submit-$tag
  rm -rf "$work"
  local t0=$(date +%s%N)
  "$SUBMIT" \
    --master "local-cluster[$n,2,8192]" \
    --class graft.Main \
    --conf spark.executor.memory=8g \
    --conf spark.sql.shuffle.partitions=256 \
    --conf spark.sql.files.maxPartitionBytes=16m \
    --conf spark.locality.wait=0 \
    --conf spark.executor.extraJavaOptions=-XX:ActiveProcessorCount=2 \
    --conf spark.ui.enabled=false \
    --driver-memory 4g \
    "$JAR" \
    --input "$CORPUS" --workdir "$work" --run-id "$tag" \
    >"/tmp/graft-submit-$tag.log" 2>&1
  local t1=$(date +%s%N)
  grep -q "\[graft\] run_id=$tag" "/tmp/graft-submit-$tag.log" \
    || { echo "leg $tag FAILED (see /tmp/graft-submit-$tag.log)" >&2; return 1; }
  echo $(( (t1 - t0) / 1000000 ))
}

steal() { grep ^cpu /proc/stat | head -1 | awk '{print $9}'; }

S0=$(steal); MS8A=$(leg 8 sub8a); S1=$(steal)
MS2=$(leg 2 sub2);  S2=$(steal)
MS8B=$(leg 8 sub8b); S3=$(steal)

python3 - "$MS8A" "$MS2" "$MS8B" "$((S1-S0))" "$((S2-S1))" "$((S3-S2))" "$CORPUS" <<'EOF' | tee "$OUT"
import sys, json
ms8a, ms2, ms8b, st8a, st2, st8b = map(int, sys.argv[1:7])
t8 = (ms8a + ms8b) / 2000.0
t2 = ms2 / 1000.0
print(json.dumps({
  "protocol": "spark-submit --master local-cluster[N,2,8192] --class graft.Main (checkpointed production pipeline, stage writes + lineage + metrics included)",
  "corpus": sys.argv[7],
  "execs_low": 2, "execs_high": 8, "cores_per_exec": 2,
  "sec_low": round(t2, 1),
  "sec_high_before": round(ms8a/1000.0, 1), "sec_high_after": round(ms8b/1000.0, 1),
  "efficiency": round(t2 / (4.0 * t8), 3),
  "efficiency_range": [round(t2/(4.0*max(ms8a,ms8b)/1000.0), 3),
                        round(t2/(4.0*min(ms8a,ms8b)/1000.0), 3)],
  "steal_ticks": {"high_before": st8a, "low": st2, "high_after": st8b},
}))
EOF
