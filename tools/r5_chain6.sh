#!/bin/bash
# Round-5 chain 6: fused-export DECISION re-run. Chain 5's A/B window
# carried the unstable-session signature (garbage reads of 7.6M/22M
# f/s inside two defaults rows) and disagreed with itself across
# scenes (headline −12%, textured +6.6%, wall −4.6%) — discard per
# protocol. This re-run uses the alternating within-round order (new
# in tpu_env_ab) and more rounds.
#   echo $(date +%s) > /tmp/r5_5_cutoff
#   nohup bash tools/r5_chain6.sh > /tmp/r5_6_driver.log 2>&1 &
set -u
cd /root/repo
log() { echo "[r5c6 $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r5_6_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+3 hours' +%s > "$CUTOFF_FILE"

log "waiting for chain 5 to exit"
while ! grep -Eq '^\[r5c5 [0-9:]+\] ALL DONE' /tmp/r5_5_driver.log \
    2>/dev/null; do
  sleep 30
done
log "chain 5 done; 60 s client gap"
sleep 60

log "S1: headline fused-export decision (9 rounds, alternating order)"
python -u tools/tpu_env_ab.py --scene headline --rounds 9 \
  --configs "" "MRT_KERNEL_EXPORT=1" \
  > /tmp/r5_export_headline9.log 2>&1
log "S1 rc=$?"
sleep 60
log "S2: textured fused-export decision (7 rounds, alternating order)"
python -u tools/tpu_env_ab.py --scene textured --rounds 7 \
  --configs "" "MRT_KERNEL_EXPORT=1" \
  > /tmp/r5_export_textured7.log 2>&1
log "S2 rc=$?"
sleep 60
log "S3: wall fused-export decision (7 rounds, alternating order)"
python -u tools/tpu_env_ab.py --scene wall --rounds 7 \
  --configs "" "MRT_KERNEL_EXPORT=1" \
  > /tmp/r5_export_wall7.log 2>&1
log "S3 rc=$?"
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
log "ALL DONE (got_healthy=$got_healthy)"
