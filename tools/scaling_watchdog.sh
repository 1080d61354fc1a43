#!/bin/bash
# Round-6 scaling-gate watchdog (BENCH.md protocol; round-5 ADVICE fixes):
# probe the isolated fetch kernel (graft.tools.CodecCal) until the host is
# healthy on TWO CONSECUTIVE probe cycles, then run the gated median-of-5
# alternating N/4N scaling bench on the protocol workload. ADVICE items
# addressed:
#  - probe health uses the MIN of BOTH cache=off readings (no upward-biased
#    best-of), and gates on BOTH the 4-thread and 16-thread kernels so the
#    launch condition is symmetric across the two levels of the gated ratio;
#  - an empty/unparsable probe (stale target/classes, CodecCal crash) aborts
#    loudly instead of looping forever on best=0;
#  - the bench's exit code propagates out of the watchdog, and the bench
#    timeout is overridable alongside WORKLOAD (the 4500 s default fits the
#    protocol 400x128 workload only — override BENCH_TIMEOUT for bigger runs).
# All probes are logged for full disclosure in BENCH.md.
set -u
cd /root/repo
THRESHOLD=${THRESHOLD:-700}    # 16-thread floor, pages/s (idle box ~800+)
THRESHOLD4=${THRESHOLD4:-190}  # 4-thread floor, pages/s (idle box ~220-240)
WORKLOAD=${WORKLOAD:-"400 1 128 128 224"}
BENCH_TIMEOUT=${BENCH_TIMEOUT:-4500}
LOG=/tmp/scaling_watchdog.log
PROBE_CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== watchdog start $(date -u +%H:%M:%S) floors 16t>=$THRESHOLD 4t>=$THRESHOLD4 x2 workload=$WORKLOAD timeout=$BENCH_TIMEOUT ===" >> "$LOG"

probe_min() { # $1 = thread count; prints the MIN of the two cache=off readings
  timeout 300 java -XX:+UseParallelGC -cp "$PROBE_CP" graft.tools.CodecCal 1200 "$1" 224 2>/dev/null \
    | grep 'cache=off pages/s' | sed 's/.*= //; s/ .*//' | sort -n | head -1
}

STREAK=0
while true; do
  P16=$(probe_min 16)
  P4=$(probe_min 4)
  if [ -z "${P16:-}" ] || [ -z "${P4:-}" ]; then
    echo "$(date -u +%H:%M:%S) FATAL: probe produced no parsable output (run 'sbt compile' for target/scala-2.13/classes, or CodecCal crashed)" >> "$LOG"
    exit 2
  fi
  if [ "$(awk -v a="$P16" -v t="$THRESHOLD" -v b="$P4" -v u="$THRESHOLD4" 'BEGIN{print (a>=t && b>=u)?1:0}')" = "1" ]; then
    STREAK=$((STREAK+1))
  else
    STREAK=0
  fi
  echo "$(date -u +%H:%M:%S) probe min cache=off pages/s: 16t=$P16 4t=$P4 streak=$STREAK" >> "$LOG"
  if [ "$STREAK" -ge 2 ]; then
    echo "$(date -u +%H:%M:%S) host healthy (both floors twice) — launching gated scaling bench (reps=5, workload $WORKLOAD)" >> "$LOG"
    SPARK_GRAFT_BENCH_REPS=5 timeout "$BENCH_TIMEOUT" sbt -batch "runMain graft.ScalingBench $WORKLOAD" >> /tmp/scaling_run.log 2>&1
    RC=$?
    echo "$(date -u +%H:%M:%S) scaling bench exited rc=$RC" >> "$LOG"
    exit $RC
  fi
  sleep 150
done
