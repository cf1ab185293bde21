#!/bin/bash
# Swap chainJ -> chainK without ever killing a live TPU client (same
# pattern as r4_swapI.sh): wait until chainJ has no python child (its
# inter-stage/inter-probe sleeps), kill the bash + sleep, verify no
# python holds the tunnel, launch chainK.
#
# Extra gate vs swapI: do NOT swap before chainJ's battery-1 ladder
# (bench.py) has finished — we want /tmp/bench_r4J.json captured. The
# remaining chainJ battery stages are terrain-class reads that are
# unreadable in the current degraded regime; chainK re-runs the same
# battery in its own health-gated loop, so nothing is lost, and chainK's
# degraded-readable K1/K2/K3 stages (paged FB_ROWS sweep, watertight
# A/B, on-chip parity at the new supertile default) run sooner.
set -u
CHAIN_PID="${1:?usage: r4_swapK.sh <chainJ-bash-pid>}"
log() { echo "[swapK $(date +%H:%M:%S)] $*" >&2; }

# Gate: wait for the battery-1 ladder artifact to be complete (bench.py
# writes the JSON line last; an empty file means it is still running).
while kill -0 "$CHAIN_PID" 2>/dev/null; do
  if [ -s /tmp/bench_r4J.json ]; then
    log "battery-1 ladder artifact present — proceeding to swap window"
    break
  fi
  sleep 15
done

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  kids=$(ps --ppid "$CHAIN_PID" -o pid=,comm= 2>/dev/null)
  if echo "$kids" | grep -q python; then
    sleep 5
    continue
  fi
  log "safe window — killing chainJ bash $CHAIN_PID"
  kill "$CHAIN_PID" 2>/dev/null
  echo "$kids" | awk '$2=="sleep"{print $1}' | while read -r p; do
    kill "$p" 2>/dev/null
  done
  break
done

for i in $(seq 1 60); do
  # NB: match tools/tpu_* specifically — a bare 'tpu_' also matches the
  # resident /root/.tpu_init.py daemon and spins the full 10 minutes.
  if ps -eo comm=,args= | grep -v grep | grep -E '^python' \
       | grep -qE 'tools/tpu_|bench\.py'; then
    log "a TPU python is still alive; waiting"
    sleep 10
  else
    break
  fi
done
sleep 20
log "launching chainK"
nohup bash /root/repo/tools/r4_chainK.sh > /tmp/r4K_driver.log 2>&1 &
echo $! > /tmp/r4K.pid
log "chainK pid $(cat /tmp/r4K.pid)"
