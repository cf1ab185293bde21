#!/bin/bash
# Swap chainB -> chainC without ever killing a live TPU client.
# Only fires while chainB sits in its 9-min degraded-gate sleep (last
# log line says so AND no python child exists); if chainB ever goes
# healthy-battery, abort the swap and leave it alone.
set -u
CHAIN_PID="${1:?usage: r4_swapC.sh <chainB-bash-pid>}"
log() { echo "[swapC $(date +%H:%M:%S)] $*" >&2; }

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  if grep -q "running full battery" /tmp/r4_chainB.log 2>/dev/null; then
    log "chainB reached a healthy battery — NOT swapping"
    exit 0
  fi
  last=$(tail -1 /tmp/r4_chainB.log 2>/dev/null)
  kids=$(ps --ppid "$CHAIN_PID" -o pid=,comm= 2>/dev/null)
  if echo "$last" | grep -q "still degraded; sleeping" && \
     ! echo "$kids" | grep -q python; then
    log "safe window — killing chainB bash $CHAIN_PID"
    kill "$CHAIN_PID" 2>/dev/null
    echo "$kids" | awk '$2=="sleep"{print $1}' | while read -r p; do
      kill "$p" 2>/dev/null
    done
    break
  fi
  sleep 5
done

# belt-and-braces: confirm no TPU python client is alive before chainC.
# Pattern excludes the system tunnel daemon /root/.tpu_init.py (whose
# name matches a bare 'tpu_'), and the loop ABORTS instead of launching
# if a real client never clears (single-client tunnel discipline).
clear_ok=0
for i in $(seq 1 120); do
  if ps -eo args= | grep -v grep | grep -E 'tools/tpu_|bench\.py' \
       | grep -q python; then
    log "a TPU python is still alive; waiting"
    sleep 10
  else
    clear_ok=1
    break
  fi
done
if [ "$clear_ok" = 0 ]; then
  log "ABORT: a TPU client still holds the tunnel after 20 min — not launching"
  exit 1
fi
sleep 20
log "launching chainC"
nohup bash /root/repo/tools/r4_chainC.sh > /tmp/r4_chainC.log 2>&1 &
log "chainC pid $!"
