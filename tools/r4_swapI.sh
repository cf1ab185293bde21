#!/bin/bash
# Swap chainH -> chainI without ever killing a live TPU client (same
# pattern as r4_swap_chain.sh): wait until chainH's only child is its
# inter-probe sleep, kill the bash + sleep, verify no python holds the
# tunnel, launch chainI.
set -u
CHAIN_PID="${1:?usage: r4_swapI.sh <chainH-bash-pid>}"
log() { echo "[swapI $(date +%H:%M:%S)] $*" >&2; }

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  kids=$(ps --ppid "$CHAIN_PID" -o pid=,comm= 2>/dev/null)
  if echo "$kids" | grep -q python; then
    sleep 5
    continue
  fi
  log "safe window — killing chainH bash $CHAIN_PID"
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
log "launching chainI"
nohup bash /root/repo/tools/r4_chainI.sh > /tmp/r4_chainI.log 2>&1 &
log "chainI pid $!"
