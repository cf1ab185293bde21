#!/bin/bash
# Round-5 chain 1: the measurement-debt battery (docs/roadmap.md
# "Round-5 plan" #1). Launch FIRST THING in round 5 with
#   nohup bash tools/r5_chain1.sh > /tmp/r5_1_driver.log 2>&1 &
# and poll the log. Health-gated: every stage that needs a healthy
# session waits for it inside one long-lived client; the
# degraded-readable stages run regardless.
# Single client at all times; 60 s gaps between client processes.
set -u
cd /root/repo
log() { echo "[r5c1 $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r5_1_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+6 hours' +%s > "$CUTOFF_FILE"

log "S0: canonical ladder (also repopulates .cache/mrt_xla_cache if"
log "    missing — repo-local, reboots no longer wipe it); health-"
log "    annotated artifact"
MRT_BENCH_WAIT_MIN=10 python -u bench.py \
  > /tmp/bench_r5_1.json 2>/tmp/bench_r5_1.log
log "S0 rc=$?"; sleep 60

run_battery() {
  log "battery 1/5: terrain structural knobs at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 10 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r5_knob_ab.log 2>&1
  log "battery 1/5 rc=$?"; sleep 60
  log "battery 2/5: seed oracle + warmstart + prepass timing (VERDICT r3 #3)"
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
  log "battery 5/5: paged fb_rows >=50%-bar confirm (fb_rows binds at"
  log "    import -> one process per value; the PAGED bench, not the"
  log "    resident-texture env_ab scene)"
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
