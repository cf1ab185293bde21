#!/bin/bash
# Round-4 chain M: follow-up to chainL. New since chainL launched: the
# planar input pack (MRT_PACK_PLANAR, default on — CPU-bitwise-pinned)
# and the fb_rows auto-sizer. Headline/textured/multicam are
# small-resident-sweep classes, so their A/Bs stay roughly readable in
# the degraded regime.
#   M0 on-chip parity with the new defaults (planar pack + auto fb_rows
#      + supertile 64) — correctness reads stay valid degraded
#   M1 planar pack A/B: headline + textured, "" vs MRT_PACK_PLANAR=0
#   M2 multicam supertile refinement: 4/8/16/32/64 budget curve
#   M3 health-gated loop: canonical ladder + terrain knob A/Bs + seed
#      oracle probe + wall re-read
# Single client at all times; 60 s gaps between stages.
set -u
cd /root/repo
log() { echo "[chainM $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r4M_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+6 hours' +%s > "$CUTOFF_FILE"

healthy_artifact() {
  python - "$1" <<'EOF'
import json, sys
try:
    rec = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
except Exception:
    sys.exit(1)
sys.exit(0 if (rec.get("tpu_health") or {}).get("healthy") else 1)
EOF
}

log "M0: on-chip parity at the new defaults"
python -u tools/tpu_parity_check.py > /tmp/r4M_parity.log 2>&1
log "M0 rc=$?"; sleep 60

log "M1a: planar pack A/B (headline, 5 rounds)"
python -u tools/tpu_env_ab.py --rounds 5 --scene headline \
  --configs "" "MRT_PACK_PLANAR=0" > /tmp/r4M_planar_headline.log 2>&1
log "M1a rc=$?"; sleep 60
log "M1b: planar pack A/B (textured, 3 rounds)"
python -u tools/tpu_env_ab.py --rounds 3 --scene textured \
  --configs "" "MRT_PACK_PLANAR=0" > /tmp/r4M_planar_tex.log 2>&1
log "M1b rc=$?"; sleep 60

log "M2: multicam supertile budget curve (5 rounds)"
python -u tools/tpu_env_ab.py --rounds 5 --scene multicam \
  --configs "MRT_SUPERTILE=4" "MRT_SUPERTILE=8" "MRT_SUPERTILE=16" \
            "MRT_SUPERTILE=32" "" > /tmp/r4M_multicam_st.log 2>&1
log "M2 rc=$?"; sleep 60
log "degraded-readable stage DONE — entering health-gated loop"

run_battery() {
  log "battery 1/4: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4M.json 2>/tmp/bench_r4M.log
  log "battery 1/4 rc=$?"
  if healthy_artifact /tmp/bench_r4M.json; then
    cp /tmp/bench_r4M.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured -> /tmp/bench_r4_final.json"
  fi
  sleep 60
  log "battery 2/4: terrain knob A/B at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 5 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4M_knob_ab.log 2>&1
  log "battery 2/4 rc=$?"; sleep 60
  log "battery 3/4: seed oracle + warmstart + prepass probe"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 5 \
    > /tmp/r4M_seed_probe.log 2>&1
  log "battery 3/4 rc=$?"; sleep 60
  log "battery 4/4: healthy wall re-read (TILE_RPS x supertile)"
  python -u tools/tpu_env_ab.py --rounds 3 --scene wall \
    --configs "" "MRT_TILE_RPS=4" "MRT_SUPERTILE=16" "MRT_SUPERTILE=128" \
    > /tmp/r4M_wall_healthy.log 2>&1
  log "battery 4/4 rc=$?"
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$(cat "$CUTOFF_FILE")" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: short fresh-client anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r4M_gate.log 2>&1
  anchor=$(grep -oE '[0-9.]+ f/s' /tmp/r4M_gate.log | tail -1)
  log "probe $probe_n anchor: ${anchor:-unreadable}"
  if grep -q "session HEALTHY" /tmp/r4M_gate.log; then
    log "probe HEALTHY — running full battery"
    sleep 60
    run_battery
    got_healthy=1
    log "battery complete (got_healthy=1) — low-duty re-probes continue"
    sleep 1080
  else
    log "still degraded; tunnel idle for 18 min"
    sleep 1080
  fi
done
log "ALL DONE — tunnel free (got_healthy=$got_healthy)"
