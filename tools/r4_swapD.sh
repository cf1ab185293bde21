#!/bin/bash
# Swap chainC -> chainD without ever killing a live TPU client: only
# fires while chainC sits in an 18-min idle-gap sleep (last log line
# says so AND no python child). Aborts if chainC went healthy-battery.
set -u
CHAIN_PID="${1:?usage: r4_swapD.sh <chainC-bash-pid>}"
log() { echo "[swapD $(date +%H:%M:%S)] $*" >&2; }

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  if grep -q "running full battery" /tmp/r4_chainC.log 2>/dev/null; then
    log "chainC reached a healthy battery — NOT swapping"
    exit 0
  fi
  last=$(tail -1 /tmp/r4_chainC.log 2>/dev/null)
  kids=$(ps --ppid "$CHAIN_PID" -o pid=,comm= 2>/dev/null)
  if echo "$last" | grep -q "tunnel idle for 18 min" && \
     ! echo "$kids" | grep -q python; then
    log "idle window — killing chainC bash $CHAIN_PID"
    kill "$CHAIN_PID" 2>/dev/null
    echo "$kids" | awk '$2=="sleep"{print $1}' | while read -r p; do
      kill "$p" 2>/dev/null
    done
    break
  fi
  sleep 5
done

# Confirm no TPU python client is alive (exclude the system tunnel
# daemon /root/.tpu_init.py, which matched the old 'tpu_' pattern).
# ABORT instead of launching if a client never clears — e.g. a probe
# orphaned by a TOCTOU between the ps read and the kill (single-client
# tunnel discipline: never start a second client).
clear_ok=0
for i in $(seq 1 60); do
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
  log "ABORT: a TPU client still holds the tunnel after 10 min — not launching"
  exit 1
fi
sleep 20
log "launching chainD"
nohup bash /root/repo/tools/r4_chainD.sh > /tmp/r4_chainD.log 2>&1 &
log "chainD pid $!"
