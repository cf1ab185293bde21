#!/bin/bash
# Swap chainK -> chainL without ever killing a live TPU client (same
# pattern as r4_swapK.sh). Gate: wait until chainK's degraded-readable
# stages (K1 FB_ROWS, K2 watertight, K3 parity, K4 epilogue) are done —
# the health-gated loop that follows is identical to chainL's, so
# nothing is lost, and chainL's multicam camera-fold A/B runs sooner.
set -u
CHAIN_PID="${1:?usage: r4_swapL.sh <chainK-bash-pid>}"
log() { echo "[swapL $(date +%H:%M:%S)] $*" >&2; }

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  if grep -q "degraded-readable stage DONE" /tmp/r4K_driver.log 2>/dev/null; then
    log "chainK degraded stages done — proceeding to swap window"
    break
  fi
  sleep 30
done

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  kids=$(ps --ppid "$CHAIN_PID" -o pid=,comm= 2>/dev/null)
  if echo "$kids" | grep -q python; then
    sleep 5
    continue
  fi
  log "safe window — killing chainK bash $CHAIN_PID"
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
log "launching chainL"
nohup bash /root/repo/tools/r4_chainL.sh > /tmp/r4L_driver.log 2>&1 &
echo $! > /tmp/r4L.pid
log "chainL pid $(cat /tmp/r4L.pid)"
