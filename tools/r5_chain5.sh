#!/bin/bash
# Round-5 chain 5: fused-export epilogue (MRT_KERNEL_EXPORT) on-chip
# parity + decision A/B — the ~10% lever the r5 epilogue probe exposed
# (docs/benchmarks.md roofline "Measured check") — then the resumed
# health-gated battery loop.
#   echo $(date +%s) > /tmp/r5_4_cutoff
#   nohup bash tools/r5_chain5.sh > /tmp/r5_5_driver.log 2>&1 &
set -u
cd /root/repo
log() { echo "[r5c5 $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r5_5_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+3 hours' +%s > "$CUTOFF_FILE"

# Sentinel anchored to line start (see r5_chain3.sh note).
log "waiting for chain 4 to exit"
while ! grep -Eq '^\[r5c4 [0-9:]+\] ALL DONE' /tmp/r5_4_driver.log \
    2>/dev/null; do
  sleep 30
done
log "chain 4 done; 60 s client gap"
sleep 60

log "S1: on-chip frame parity with the fused export ON (kernel vs jnp"
log "    reference — values must be identical; edge-race criterion)"
MRT_KERNEL_EXPORT=1 python -u tools/tpu_parity_check.py \
  > /tmp/r5_export_parity.log 2>&1
rc=$?
log "S1 rc=$rc"
sleep 60
if [ "$rc" != 0 ]; then
  log "fused-export parity FAILED on chip — skipping the A/B (see log)"
else
  log "S2: headline fused-export A/B (7 rounds interleaved)"
  python -u tools/tpu_env_ab.py --scene headline --rounds 7 \
    --configs "" "MRT_KERNEL_EXPORT=1" \
    > /tmp/r5_export_headline.log 2>&1
  log "S2 rc=$?"
  sleep 60
  log "S3: textured fused-export A/B (5 rounds)"
  python -u tools/tpu_env_ab.py --scene textured --rounds 5 \
    --configs "" "MRT_KERNEL_EXPORT=1" \
    > /tmp/r5_export_textured.log 2>&1
  log "S3 rc=$?"
  sleep 60
  log "S4: wall fused-export A/B (5 rounds — the r2 #6 160k question)"
  python -u tools/tpu_env_ab.py --scene wall --rounds 5 \
    --configs "" "MRT_KERNEL_EXPORT=1" \
    > /tmp/r5_export_wall.log 2>&1
  log "S4 rc=$?"
  sleep 60
  log "S5: multicam fused-export A/B (3 rounds — ragged-camera class)"
  python -u tools/tpu_env_ab.py --scene multicam --rounds 3 \
    --configs "" "MRT_KERNEL_EXPORT=1" \
    > /tmp/r5_export_multicam.log 2>&1
  log "S5 rc=$?"
  sleep 60
fi

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
