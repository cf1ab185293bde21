#!/bin/bash
# Swap chainL -> chainM without ever killing a live TPU client (same
# pattern as r4_swapL.sh). Gate: chainL's degraded-readable stage is
# already done (its driver log says so), so the only wait is for a
# no-python window — but NEVER swap mid-battery: if the driver log shows
# "running full battery" without a later "battery complete", hold off.
set -u
CHAIN_PID="${1:?usage: r4_swapM.sh <chainL-bash-pid>}"
log() { echo "[swapM $(date +%H:%M:%S)] $*" >&2; }

battery_active() {
  local started done
  started=$(grep -c "running full battery" /tmp/r4L_driver.log 2>/dev/null); started=${started:-0}
  done=$(grep -c "battery complete" /tmp/r4L_driver.log 2>/dev/null); done=${done:-0}
  [ "$started" -gt "$done" ]
}

while kill -0 "$CHAIN_PID" 2>/dev/null; do
  if battery_active; then
    sleep 60
    continue
  fi
  kids=$(ps --ppid "$CHAIN_PID" -o pid=,comm= 2>/dev/null)
  if echo "$kids" | grep -q python; then
    sleep 5
    continue
  fi
  # Re-check the battery gate after the python check (a probe that went
  # healthy flips into the battery after a 60 s sleep).
  if battery_active; then
    sleep 60
    continue
  fi
  log "safe window — killing chainL bash $CHAIN_PID"
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
log "launching chainM"
nohup bash /root/repo/tools/r4_chainM.sh > /tmp/r4M_driver.log 2>&1 &
echo $! > /tmp/r4M.pid
log "chainM pid $(cat /tmp/r4M.pid)"
