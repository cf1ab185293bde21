#!/bin/bash
# Round-4 chain H: post-reboot measurement battery.
#
# The VM (and hence the tunnel client side) rebooted, so the long
# clamped episode's client state is gone — probe immediately, and if
# the session is healthy run everything that is still unread on chip
# (VERDICT r3 #1/#3/#4/#6):
#   - canonical bench ladder (healthy artifact for docs + knob defaults)
#   - terrain round-3b knob A/Bs (PLANE_BINS/TRI_RANGES/ATTR_ONCE/
#     UV_DEFER/WIN_SORT decision)
#   - wall TILE_RPS=4 re-read (the degraded-session +4% hint)
#   - seed oracle probe (terrain >=150 lever: confirm/falsify)
#   - watertight cost A/B healthy re-read
#   - paged-texture FB_ROWS sweep (import-time knob -> one process per
#     value)
# Single client at all times; 60 s gaps between stages so the tunnel
# sees a clean idle window (CLAUDE.md discipline).
set -u
cd /root/repo
log() { echo "[chainH $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r4H_cutoff
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

run_battery() {
  log "battery 1/6: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4H.json 2>/tmp/bench_r4H.log
  log "battery 1/6 rc=$?"
  if healthy_artifact /tmp/bench_r4H.json; then
    cp /tmp/bench_r4H.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured -> /tmp/bench_r4_final.json"
  fi
  sleep 60
  log "battery 2/6: terrain knob A/B at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 5 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4H_knob_ab.log 2>&1
  log "battery 2/6 rc=$?"; sleep 60
  log "battery 3/6: wall TILE_RPS re-read (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --scene wall \
    --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=2" \
    > /tmp/r4H_wall_rps.log 2>&1
  log "battery 3/6 rc=$?"; sleep 60
  log "battery 4/6: seed oracle probe"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 5 \
    > /tmp/r4H_seed_probe.log 2>&1
  log "battery 4/6 rc=$?"; sleep 60
  log "battery 5/6: watertight cost A/B healthy re-read"
  python -u tools/tpu_watertight_ab.py --rounds 3 > /tmp/r4H_wt_ab.log 2>&1
  log "battery 5/6 rc=$?"; sleep 60
  log "battery 6/6: paged-texture FB_ROWS sweep (one process per value)"
  for fb in 64 32 16; do
    MRT_TEX_FB_ROWS=$fb python -u tools/tpu_paged_tex_bench.py \
      > /tmp/r4H_paged_fb${fb}.log 2>&1
    log "battery 6/6 fb=$fb rc=$?"; sleep 60
  done
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$(cat "$CUTOFF_FILE")" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: short fresh-client anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r4H_gate.log 2>&1
  anchor=$(grep -oE '[0-9.]+ f/s' /tmp/r4H_gate.log | tail -1)
  log "probe $probe_n anchor: ${anchor:-unreadable}"
  if grep -q "session HEALTHY" /tmp/r4H_gate.log; then
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
