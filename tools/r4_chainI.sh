#!/bin/bash
# Round-4 chain I: the clamp SURVIVED the VM reboot (anchor 23.0 — the
# deepened r3 regime; it is TPU-host-side, not client-side). So stop
# waiting: run everything the degraded regime can actually read
# (protocol note 4: headline-class rows read ~5-8% low and A/B *ratios*
# stay roughly readable; terrain-class is garbage at any size), then
# fall back to the chainH-style health-gated loop for the terrain
# battery.
#
# Degraded-readable stage (immediately):
#   D1 epilogue/supertile probe (headline class) — where do the
#      headline's ms go: XLA epilogue vs per-program floor vs layout
#   D2 wall TILE_RPS=4 / =2 / =4+supertile8 (the +2.6..4% hints)
#   D3 watertight cost A/B (textured 64² class, relative factor)
#   D4 paged-texture FB_ROWS 64/32/16 (one process per value)
# Health-gated loop (after): canonical ladder + terrain knob A/Bs +
# seed oracle probe — healthy sessions only.
set -u
cd /root/repo
log() { echo "[chainI $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r4I_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+8 hours' +%s > "$CUTOFF_FILE"

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

log "D1: epilogue/supertile probe (3 rounds)"
python -u tools/tpu_epilogue_probe.py --rounds 3 > /tmp/r4I_epilogue.log 2>&1
log "D1 rc=$?"; sleep 60

log "D2: wall TILE_RPS battery (3 rounds)"
python -u tools/tpu_env_ab.py --rounds 3 --scene wall \
  --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=2" \
            "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
  > /tmp/r4I_wall_rps.log 2>&1
log "D2 rc=$?"; sleep 60

log "D3: watertight cost A/B (3 rounds)"
python -u tools/tpu_watertight_ab.py --rounds 3 > /tmp/r4I_wt_ab.log 2>&1
log "D3 rc=$?"; sleep 60

log "D4: paged-texture FB_ROWS sweep"
for fb in 64 32 16; do
  MRT_TEX_FB_ROWS=$fb python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4I_paged_fb${fb}.log 2>&1
  log "D4 fb=$fb rc=$?"; sleep 60
done
log "degraded-readable stage DONE — entering health-gated loop"

run_battery() {
  log "battery 1/4: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4I.json 2>/tmp/bench_r4I.log
  log "battery 1/4 rc=$?"
  if healthy_artifact /tmp/bench_r4I.json; then
    cp /tmp/bench_r4I.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured -> /tmp/bench_r4_final.json"
  fi
  sleep 60
  log "battery 2/4: terrain knob A/B at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 5 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4I_knob_ab.log 2>&1
  log "battery 2/4 rc=$?"; sleep 60
  log "battery 3/4: seed oracle + warmstart + prepass probe"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 5 \
    > /tmp/r4I_seed_probe.log 2>&1
  log "battery 3/4 rc=$?"; sleep 60
  log "battery 4/4: healthy wall TILE_RPS re-read"
  python -u tools/tpu_env_ab.py --rounds 3 --scene wall \
    --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
    > /tmp/r4I_wall_rps_healthy.log 2>&1
  log "battery 4/4 rc=$?"
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$(cat "$CUTOFF_FILE")" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: short fresh-client anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r4I_gate.log 2>&1
  anchor=$(grep -oE '[0-9.]+ f/s' /tmp/r4I_gate.log | tail -1)
  log "probe $probe_n anchor: ${anchor:-unreadable}"
  if grep -q "session HEALTHY" /tmp/r4I_gate.log; then
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
