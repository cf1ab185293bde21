#!/bin/bash
# Round-4 chain B (replaces chainA stages 6-7 after the 5h degraded
# episode): health-gated measurement battery. A cheap single-config
# gate client polls the terrain anchor; only when it reads healthy
# (>=75 f/s, CLAUDE.md protocol) does the battery run — every unread
# VERDICT-r3 A/B FIRST (terrain knobs, seed oracle, wall TILE_RPS,
# paged-texture knobs incl. MRT_TEX_REUSE), then the canonical bench
# ladder. Hard deadlines keep the tunnel free for the driver's own
# BENCH_r04 capture at round end (~19:15 UTC).
set -u
cd /root/repo
log() { echo "[chainB $(date +%H:%M:%S)] $*" >&2; }

FULL_CUTOFF=$(date -d '2026-08-19 17:00 UTC' +%s)   # last start of gate+full battery
LATE_CUTOFF=$(date -d '2026-08-19 18:00 UTC' +%s)   # last start of gate+ladder only

run_battery() {
  log "battery 1/5: terrain knob A/B (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 10 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4B_knob_ab.log 2>&1
  log "battery 1/5 rc=$?"; sleep 60
  log "battery 2/5: seed oracle probe (terrain warm-start upper bound)"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 10 \
    > /tmp/r4B_seed_probe.log 2>&1
  log "battery 2/5 rc=$?"; sleep 60
  log "battery 3/5: wall TILE_RPS/supertile A/B (5 rounds)"
  python -u tools/tpu_env_ab.py --scene wall --rounds 5 \
    --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
    > /tmp/r4B_wall_ab.log 2>&1
  log "battery 3/5 rc=$?"; sleep 60
  log "battery 4/5: paged-texture knobs"
  python -u tools/tpu_paged_tex_bench.py > /tmp/r4B_paged_default.log 2>&1
  sleep 60
  MRT_TEX_REUSE=0 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4B_paged_noreuse.log 2>&1
  sleep 60
  MRT_TEX_FB_ROWS=32 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4B_paged_fb32.log 2>&1
  log "battery 4/5 rc=$?"; sleep 60
  log "battery 5/5: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4B.json 2>/tmp/bench_r4B.log
  log "battery 5/5 rc=$?"
  if python - <<'EOF'
import json, sys
try:
    rec = json.loads(open("/tmp/bench_r4B.json").read().strip().splitlines()[-1])
except Exception:
    sys.exit(1)
sys.exit(0 if (rec.get("tpu_health") or {}).get("healthy") else 1)
EOF
  then
    cp /tmp/bench_r4B.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured"
    return 0
  fi
  return 1
}

got_healthy=0
while [ "$(date +%s)" -lt "$FULL_CUTOFF" ]; do
  log "gate: terrain anchor poll (wait-healthy 75, max 35 min)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 35 \
    --configs "" > /tmp/r4B_gate.log 2>&1
  if grep -q "session HEALTHY" /tmp/r4B_gate.log; then
    log "gate HEALTHY — running full battery"
    sleep 60
    if run_battery; then got_healthy=1; break; fi
    log "battery ran but ladder came back unhealthy — re-gating"
  else
    log "gate: still degraded; sleeping 9 min"
    sleep 540
  fi
done

if [ "$got_healthy" = 0 ]; then
  # Degraded-fallback: small-kernel A/Bs are ~5-8% suppressed but
  # roughly uniform (CLAUDE.md) — capture the paged-texture reuse A/B
  # anyway, annotated by the session logs, then keep hunting a healthy
  # ladder until the late cutoff.
  log "fallback: degraded-session paged-texture reuse A/B"
  python -u tools/tpu_paged_tex_bench.py > /tmp/r4B_paged_default_degr.log 2>&1
  sleep 60
  MRT_TEX_REUSE=0 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4B_paged_noreuse_degr.log 2>&1
  sleep 60
  while [ "$(date +%s)" -lt "$LATE_CUTOFF" ]; do
    log "late gate: anchor poll (max 20 min) + ladder if healthy"
    python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 20 \
      --configs "" > /tmp/r4B_gate_late.log 2>&1
    if grep -q "session HEALTHY" /tmp/r4B_gate_late.log; then
      MRT_BENCH_WAIT_MIN=5 python -u bench.py \
        > /tmp/bench_r4B_late.json 2>/tmp/bench_r4B_late.log
      cp /tmp/bench_r4B_late.json /tmp/bench_r4_final.json 2>/dev/null
      break
    fi
    sleep 540
  done
fi
log "ALL DONE — tunnel free"
