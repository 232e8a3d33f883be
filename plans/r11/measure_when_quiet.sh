#!/bin/bash
# Round-11 builder tool: wait for hypervisor steal to go quiet, then run
# profile_many on the given queries.  Usage:
#   measure_when_quiet.sh <suffix> <q1> [q2 ...]
# Polls /proc/stat steal; requires <15 ticks over a 15s window before
# starting (and gives up after ~45 min of waiting so logs show why).
suffix="$1"; shift
for i in $(seq 1 180); do
  s0=$(awk '/^cpu /{print $9}' /proc/stat)
  sleep 15
  s1=$(awk '/^cpu /{print $9}' /proc/stat)
  d=$((s1-s0))
  if [ "$d" -lt 15 ]; then
    echo "quiet (steal=$d/15s) after $((i*15))s — measuring"
    exec env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      SWS_PROFILE_RUNS=5 python "$(dirname "$0")/profile_many.py" "$suffix" "$@"
  fi
  echo "busy (steal=$d/15s), waiting..."
done
echo "never went quiet; giving up"
exit 1
