#!/bin/bash
# Round-5 scaling-gate watchdog (BENCH.md protocol, round-4 @ a58fef5):
# probe the isolated fetch kernel (graft.tools.CodecCal) until the host
# expresses >= $THRESHOLD pages/s at 16 threads, then run the gated
# median-of-5 alternating N/4N scaling bench. All probes are logged for
# full disclosure in BENCH.md.
set -u
cd /root/repo
THRESHOLD=${THRESHOLD:-650}
LOG=/tmp/scaling_watchdog.log
PROBE_CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== watchdog start $(date -u +%H:%M:%S) threshold=$THRESHOLD ===" >> "$LOG"
while true; do
  OUT=$(timeout 300 java -XX:+UseParallelGC -cp "$PROBE_CP" graft.tools.CodecCal 1200 16 224 2>/dev/null | grep 'cache=off pages/s' | sed 's/.*= //; s/ .*//')
  BEST=$(echo "$OUT" | sort -n | tail -1)
  BEST=${BEST:-0}
  echo "$(date -u +%H:%M:%S) probe 16-thread cache=off pages/s: $(echo $OUT | tr '\n' ' ') best=$BEST" >> "$LOG"
  if [ "$(awk -v b="$BEST" -v t="$THRESHOLD" 'BEGIN{print (b>=t)?1:0}')" = "1" ]; then
    echo "$(date -u +%H:%M:%S) host healthy (>=$THRESHOLD) — launching gated scaling bench (reps=5)" >> "$LOG"
    SPARK_GRAFT_BENCH_REPS=5 timeout 5400 sbt -batch "runMain graft.ScalingBench" >> /tmp/scaling_run.log 2>&1
    echo "$(date -u +%H:%M:%S) scaling bench exited rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 240
done
