#!/bin/bash
# Round-5 chain 2: fused pack-kernel on-chip parity + self-calibrating
# A/B (VERDICT r5 #2), then the resumed health-gated battery from
# chain 1. Launch AFTER setting chain 1's cutoff to now:
#   echo $(date +%s) > /tmp/r5_1_cutoff
#   nohup bash tools/r5_chain2.sh > /tmp/r5_2_driver.log 2>&1 &
# Waits for chain 1's "ALL DONE" sentinel before touching the tunnel.
# Degraded-session protocol (docs/benchmarks.md): every A/B leads with
# a KNOWN ladder config ("" on the headline scene, canonical 502-518k)
# so each delta ships with its own same-session calibration ratio.
set -u
cd /root/repo
log() { echo "[r5c2 $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r5_2_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+5 hours' +%s > "$CUTOFF_FILE"

log "waiting for chain 1 to exit (sentinel: ALL DONE)"
while ! grep -q "ALL DONE" /tmp/r5_1_driver.log 2>/dev/null; do
  sleep 30
done
log "chain 1 done; 60 s client gap"
sleep 60

log "S1: on-chip pack-kernel parity (bitwise bar; gate for everything else)"
python -u tools/tpu_pack_parity.py > /tmp/r5_pack_parity.log 2>&1
rc=$?
log "S1 rc=$rc"
sleep 60
if [ "$rc" != 0 ]; then
  log "pack parity FAILED on chip — skipping pack A/Bs (see log)"
else
  log "S2: headline pack A/B (calibration row first; 3 rounds)"
  python -u tools/tpu_env_ab.py --scene headline --rounds 3 \
    --configs "" "MRT_PACK_SELECT=1" "MRT_PACK_KERNEL=1" \
              "MRT_PACK_KERNEL=1,MRT_PACK_WB=128" \
              "MRT_PACK_KERNEL=1,MRT_PACK_WB=32" \
    > /tmp/r5_pack_headline.log 2>&1
  log "S2 rc=$?"
  sleep 60
  log "S3: textured pack A/B (in-kernel sampling path; 3 rounds)"
  python -u tools/tpu_env_ab.py --scene textured --rounds 3 \
    --configs "" "MRT_PACK_SELECT=1" "MRT_PACK_KERNEL=1" \
    > /tmp/r5_pack_textured.log 2>&1
  log "S3 rc=$?"
  sleep 60
  log "S4: wall pack A/B (128 px resident row; 2 rounds)"
  python -u tools/tpu_env_ab.py --scene wall --rounds 2 \
    --configs "" "MRT_PACK_KERNEL=1" \
    > /tmp/r5_pack_wall.log 2>&1
  log "S4 rc=$?"
  sleep 60
fi

log "S5: in-kernel stage-share ablation battery (headline; measures the"
log "    roofline's counted ~730 ops/px against per-stage reality —"
log "    docs/benchmarks.md roofline section; outputs deliberately wrong)"
python -u tools/tpu_env_ab.py --scene headline --rounds 3 \
  --configs "" "MRT_ABLATE_RAYGEN=1" "MRT_ABLATE_SWEEP=1" \
            "MRT_ABLATE_RESOLVE=1" "MRT_ABLATE_SHADE=1" "MRT_ABLATE_PACK=1" \
  > /tmp/r5_ablate.log 2>&1
log "S5 rc=$?"
sleep 60

# Resume chain 1's health-gated battery loop (battery at most once).
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
