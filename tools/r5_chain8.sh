#!/bin/bash
# Round-5 chain 8 (final): one full bench.py ladder with the round's
# shipped defaults (fused export ON) — self-captured r5 artifact +
# compile-cache warmth for the driver's end-of-round bench — then the
# tunnel stays FREE (no probe loop: the driver needs the chip).
#   nohup bash tools/r5_chain8.sh > /tmp/r5_8_driver.log 2>&1 &
set -u
cd /root/repo
log() { echo "[r5c8 $(date +%H:%M:%S)] $*" >&2; }

log "waiting for chain 7 to exit"
while ! grep -Eq '^\[r5c7 [0-9:]+\] ALL DONE' /tmp/r5_7_driver.log \
    2>/dev/null; do
  sleep 30
done
log "chain 7 done; 60 s client gap"
sleep 60

log "S1: full bench ladder (health-annotated; new defaults)"
MRT_BENCH_WAIT_MIN=10 python -u bench.py \
  > /tmp/bench_r5_final.json 2>/tmp/bench_r5_final.log
log "S1 rc=$?"
log "ALL DONE — tunnel free for the driver bench"
