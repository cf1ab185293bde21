#!/bin/bash
# Round-5 chain 7: final fused-export decision attempt — one scene,
# 15 alternating rounds with the garbage-retry tool (best available
# discrimination in an unstable session: chain 5 read −12%, chain 6
# +10.5% — a third, longer, hardened read breaks the tie), then a
# textured 9-rounder, then the resumed health-gated battery loop.
#   echo $(date +%s) > /tmp/r5_6_cutoff
#   nohup bash tools/r5_chain7.sh > /tmp/r5_7_driver.log 2>&1 &
set -u
cd /root/repo
log() { echo "[r5c7 $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r5_7_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+2 hours 30 minutes' +%s > "$CUTOFF_FILE"

log "waiting for chain 6 to exit"
while ! grep -Eq '^\[r5c6 [0-9:]+\] ALL DONE' /tmp/r5_6_driver.log \
    2>/dev/null; do
  sleep 30
done
log "chain 6 done; 60 s client gap"
sleep 60

log "S1: headline fused-export decision (15 rounds, alternating,"
log "    garbage-retry, longer rollouts for lower per-read variance)"
python -u tools/tpu_env_ab.py --scene headline --rounds 15 \
  --steps 4 12 --configs "" "MRT_KERNEL_EXPORT=1" \
  > /tmp/r5_export_headline15.log 2>&1
log "S1 rc=$?"
sleep 60
log "S2: textured fused-export decision (9 rounds, alternating)"
python -u tools/tpu_env_ab.py --scene textured --rounds 9 \
  --steps 4 12 --configs "" "MRT_KERNEL_EXPORT=1" \
  > /tmp/r5_export_textured9.log 2>&1
log "S2 rc=$?"
sleep 60

run_battery() {
  log "battery 1/5: terrain structural knobs at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 10 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r5_knob_ab.log 2>&1
  log "battery 1/5 rc=$?"; sleep 60
  log "battery 2/5: seed oracle + warmstart + prepass timing"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 10 \
    > /tmp/r5_seed_probe.log 2>&1
  log "battery 2/5 rc=$?"; sleep 60
  log "battery 3/5: wall TILE_RPS x supertile re-read (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --scene wall \
    --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
    > /tmp/r5_wall.log 2>&1
  log "battery 3/5 rc=$?"; sleep 60
  log "battery 4/5: multicam fold curve, healthy re-read (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --scene multicam \
    --configs "MRT_SUPERTILE=4" "MRT_SUPERTILE=8" "" > /tmp/r5_multicam.log 2>&1
  log "battery 4/5 rc=$?"; sleep 60
  log "battery 5/5: paged fb_rows >=50%-bar confirm (paged bench)"
  python -u tools/tpu_paged_tex_bench.py > /tmp/r5_fbrows_auto.log 2>&1
  sleep 60
  MRT_TEX_FB_ROWS=64 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r5_fbrows_64.log 2>&1
  log "battery 5/5 rc=$?"
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$(cat "$CUTOFF_FILE")" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r5_gate.log 2>&1
  if grep -q "session HEALTHY" /tmp/r5_gate.log; then
    if [ "$got_healthy" = 0 ]; then
      log "probe HEALTHY — running full battery"
      sleep 60
      run_battery
      got_healthy=1
      log "battery complete — low-duty re-probes continue"
    else
      log "probe HEALTHY (battery already done) — idle re-probe"
    fi
    sleep 1080
  else
    log "still degraded; tunnel idle for 18 min"
    sleep 1080
  fi
done
log "ALL DONE (got_healthy=$got_healthy) — tunnel free for the driver"
