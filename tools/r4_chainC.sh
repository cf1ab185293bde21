#!/bin/bash
# Round-4 chain C: LOW-duty-cycle health gate (idle-recovery experiment).
# chainA/B's gates held a client ~80% of the wall clock; 6+ h of that
# (and r3's 8 h continuous wait) never saw the degraded regime clear.
# chainC changes the one untested variable: a SHORT fresh client probes
# the terrain anchor (~4-5 min incl. compile), then the tunnel is left
# COMPLETELY idle for 18 min — testing whether recovery needs idle time
# and/or client turnover. On a healthy probe it runs the same full
# battery as chainB (every unread VERDICT-r3 A/B first, canonical
# ladder last).
set -u
cd /root/repo
log() { echo "[chainC $(date +%H:%M:%S)] $*" >&2; }

FULL_CUTOFF=$(date -d '2026-08-19 17:15 UTC' +%s)   # last start of full battery
LATE_CUTOFF=$(date -d '2026-08-19 18:10 UTC' +%s)   # last start of ladder-only

run_battery() {
  log "battery 1/5: terrain knob A/B (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 10 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4C_knob_ab.log 2>&1
  log "battery 1/5 rc=$?"; sleep 60
  log "battery 2/5: seed oracle probe (terrain warm-start upper bound)"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 10 \
    > /tmp/r4C_seed_probe.log 2>&1
  log "battery 2/5 rc=$?"; sleep 60
  log "battery 3/5: wall TILE_RPS/supertile A/B (5 rounds)"
  python -u tools/tpu_env_ab.py --scene wall --rounds 5 \
    --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
    > /tmp/r4C_wall_ab.log 2>&1
  log "battery 3/5 rc=$?"; sleep 60
  log "battery 4/5: paged-texture knobs"
  python -u tools/tpu_paged_tex_bench.py > /tmp/r4C_paged_default.log 2>&1
  sleep 60
  MRT_TEX_REUSE=0 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4C_paged_noreuse.log 2>&1
  sleep 60
  MRT_TEX_FB_ROWS=32 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4C_paged_fb32.log 2>&1
  log "battery 4/5 rc=$?"; sleep 60
  log "battery 5/5: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4C.json 2>/tmp/bench_r4C.log
  log "battery 5/5 rc=$?"
  if python - <<'EOF'
import json, sys
try:
    rec = json.loads(open("/tmp/bench_r4C.json").read().strip().splitlines()[-1])
except Exception:
    sys.exit(1)
sys.exit(0 if (rec.get("tpu_health") or {}).get("healthy") else 1)
EOF
  then
    cp /tmp/bench_r4C.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured"
    return 0
  fi
  return 1
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$FULL_CUTOFF" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: short fresh-client anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r4C_gate.log 2>&1
  anchor=$(grep -oE '[0-9.]+ f/s' /tmp/r4C_gate.log | tail -1)
  log "probe $probe_n anchor: ${anchor:-unreadable}"
  if grep -q "session HEALTHY" /tmp/r4C_gate.log; then
    log "probe HEALTHY — running full battery"
    sleep 60
    if run_battery; then got_healthy=1; break; fi
    log "battery ran but ladder came back unhealthy — back to idle-gating"
  else
    log "still degraded; tunnel idle for 18 min"
    sleep 1080
  fi
done

if [ "$got_healthy" = 0 ]; then
  # Degraded-fallback: small-kernel rows are ~5-8% suppressed but roughly
  # uniform (CLAUDE.md) — capture the paged-texture reuse A/B anyway,
  # annotated by the session logs, then hunt a healthy ladder until the
  # late cutoff with the same low-duty-cycle gate.
  log "fallback: degraded-session paged-texture reuse A/B"
  python -u tools/tpu_paged_tex_bench.py > /tmp/r4C_paged_default_degr.log 2>&1
  sleep 60
  MRT_TEX_REUSE=0 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4C_paged_noreuse_degr.log 2>&1
  sleep 60
  while [ "$(date +%s)" -lt "$LATE_CUTOFF" ]; do
    log "late probe: short anchor read + ladder if healthy"
    python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
      --configs "" > /tmp/r4C_gate_late.log 2>&1
    if grep -q "session HEALTHY" /tmp/r4C_gate_late.log; then
      MRT_BENCH_WAIT_MIN=5 python -u bench.py \
        > /tmp/bench_r4C_late.json 2>/tmp/bench_r4C_late.log
      cp /tmp/bench_r4C_late.json /tmp/bench_r4_final.json 2>/dev/null
      break
    fi
    sleep 1080
  done
fi
log "ALL DONE — tunnel free"
