#!/bin/bash
# Swap chainA -> chainB without ever killing a live TPU client:
# wait until chainA's only child is its inter-stage `sleep`, then kill
# the bash (PID passed as $1) and that sleep, verify no python holds
# the tunnel, and launch chainB.
set -u
CHAIN_PID="${1:?usage: r4_swap_chain.sh <chainA-bash-pid>}"
log() { echo "[swap $(date +%H:%M:%S)] $*" >&2; }

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  kids=$(ps --ppid "$CHAIN_PID" -o pid=,comm= 2>/dev/null)
  if echo "$kids" | grep -q python; then
    sleep 5
    continue
  fi
  # children are only sleep (or none): safe window
  log "safe window — killing chainA bash $CHAIN_PID"
  kill "$CHAIN_PID" 2>/dev/null
  echo "$kids" | awk '$2=="sleep"{print $1}' | while read -r p; do
    kill "$p" 2>/dev/null
  done
  break
done

# belt-and-braces: confirm no python client is alive before chainB
for i in $(seq 1 60); do
  if ps -eo comm=,args= | grep -v grep | grep -E '^python' \
       | grep -qE 'tpu_|bench\.py'; then
    log "a TPU python is still alive; waiting"
    sleep 10
  else
    break
  fi
done
sleep 20
log "launching chainB"
nohup bash /root/repo/tools/r4_chainB.sh > /tmp/r4_chainB.log 2>&1 &
log "chainB pid $!"
