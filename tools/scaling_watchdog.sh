#!/bin/bash
# Round-5 scaling-gate watchdog (BENCH.md protocol, round-4 @ a58fef5):
# probe the isolated fetch kernel (graft.tools.CodecCal) until the host
# expresses >= $THRESHOLD pages/s at 16 threads on TWO CONSECUTIVE probes
# (a single healthy probe can be the edge of a transient window — run 2
# launched off one 720 reading and the window closed mid-run), then run
# the gated median-of-5 alternating N/4N scaling bench on the protocol
# workload (400 hosts x 128 details = 51,200 pages, the same input every
# round's gate used). All probes are logged for full disclosure in BENCH.md.
set -u
cd /root/repo
THRESHOLD=${THRESHOLD:-700}
WORKLOAD=${WORKLOAD:-"400 1 128 128 224"}
LOG=/tmp/scaling_watchdog.log
PROBE_CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== watchdog start $(date -u +%H:%M:%S) threshold=$THRESHOLD x2 workload=$WORKLOAD ===" >> "$LOG"
STREAK=0
while true; do
  OUT=$(timeout 300 java -XX:+UseParallelGC -cp "$PROBE_CP" graft.tools.CodecCal 1200 16 224 2>/dev/null | grep 'cache=off pages/s' | sed 's/.*= //; s/ .*//')
  BEST=$(echo "$OUT" | sort -n | tail -1)
  BEST=${BEST:-0}
  if [ "$(awk -v b="$BEST" -v t="$THRESHOLD" 'BEGIN{print (b>=t)?1:0}')" = "1" ]; then
    STREAK=$((STREAK+1))
  else
    STREAK=0
  fi
  echo "$(date -u +%H:%M:%S) probe 16-thread cache=off pages/s: $(echo $OUT | tr '\n' ' ') best=$BEST streak=$STREAK" >> "$LOG"
  if [ "$STREAK" -ge 2 ]; then
    echo "$(date -u +%H:%M:%S) host healthy (>=$THRESHOLD twice) — launching gated scaling bench (reps=5, workload $WORKLOAD)" >> "$LOG"
    SPARK_GRAFT_BENCH_REPS=5 timeout 4500 sbt -batch "runMain graft.ScalingBench $WORKLOAD" >> /tmp/scaling_run.log 2>&1
    echo "$(date -u +%H:%M:%S) scaling bench exited rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 150
done
