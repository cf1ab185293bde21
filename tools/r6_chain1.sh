#!/bin/bash
# Round-6 chain 1 (pre-staged by r5, mirroring how r4 staged
# r5_chain1.sh): launch FIRST THING next session with
#   nohup bash tools/r6_chain1.sh > /tmp/r6_1_driver.log 2>&1 &
# and poll the log. Order: canonical ladder (artifact + cache), the
# r5 fused-export healthy-confirm (the one default shipped on
# calibrated degraded evidence), then the three-rounds-old healthy-
# gated terrain battery. Single client at all times; 60 s gaps.
set -u
cd /root/repo
log() { echo "[r6c1 $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r6_1_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+6 hours' +%s > "$CUTOFF_FILE"

log "S0: canonical ladder (health-annotated artifact; repopulates"
log "    .cache/mrt_xla_cache if missing)"
MRT_BENCH_WAIT_MIN=10 python -u bench.py \
  > /tmp/bench_r6_1.json 2>/tmp/bench_r6_1.log
log "S0 rc=$?"; sleep 60

log "S1: fused-export confirm (15 alternating rounds; r5 decided"
log "    default-on at +3.7% — confirm or revert on this read)"
python -u tools/tpu_env_ab.py --scene headline --rounds 15 \
  --steps 4 12 --configs "" "MRT_KERNEL_EXPORT=0" \
  > /tmp/r6_export_confirm.log 2>&1
log "S1 rc=$?"; sleep 60

run_battery() {
  log "battery 1/5: terrain structural knobs at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 10 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r6_knob_ab.log 2>&1
  log "battery 1/5 rc=$?"; sleep 60
  log "battery 2/5: seed oracle + warmstart + prepass timing"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 10 \
    > /tmp/r6_seed_probe.log 2>&1
  log "battery 2/5 rc=$?"; sleep 60
  log "battery 3/5: wall TILE_RPS x supertile re-read (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --scene wall \
    --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
    > /tmp/r6_wall.log 2>&1
  log "battery 3/5 rc=$?"; sleep 60
  log "battery 4/5: multicam fold curve (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --scene multicam \
    --configs "MRT_SUPERTILE=4" "MRT_SUPERTILE=8" "" > /tmp/r6_multicam.log 2>&1
  log "battery 4/5 rc=$?"; sleep 60
  log "battery 5/5: paged fb_rows >=50%-bar confirm (paged bench)"
  python -u tools/tpu_paged_tex_bench.py > /tmp/r6_fbrows_auto.log 2>&1
  sleep 60
  MRT_TEX_FB_ROWS=64 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r6_fbrows_64.log 2>&1
  log "battery 5/5 rc=$?"
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$(cat "$CUTOFF_FILE")" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r6_gate.log 2>&1
  if grep -q "session HEALTHY" /tmp/r6_gate.log; then
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
