#!/bin/bash
# Round-3c chain: wait for the running knob A/B (/tmp/stack_ab.log) to
# finish, give the tunnel 90 s to release the client slot, then run the
# canonical bench ladder (health-gated) into /tmp/bench_r3c.log.
set -u
LOG=${1:-/tmp/stack_ab.log}
missing=0
while ! grep -q "DONE" "$LOG" 2>/dev/null; do
  # If the A/B process died without DONE, bail to the bench anyway after
  # the log has been static for 20 min — or after 20 min of the log not
  # existing at all (A/B crashed before its first write / mistyped path).
  if [ ! -e "$LOG" ]; then
    missing=$((missing + 1))
    if [ "$missing" -ge 20 ]; then
      echo "[chain] $LOG absent for 20 min; proceeding" >&2
      break
    fi
  elif [ -n "$(find "$LOG" -mmin +20 2>/dev/null)" ]; then
    echo "[chain] $LOG static >20min without DONE; proceeding" >&2
    break
  fi
  sleep 60
done
sleep 90
cd /root/repo
MRT_BENCH_WAIT_MIN=60 python -u bench.py > /tmp/bench_r3c.json 2>/tmp/bench_r3c.log
echo "[chain] bench done rc=$?" >> /tmp/bench_r3c.log
