#!/bin/bash
# Round-4 chain D: degraded-readable knob A/Bs + low-duty-cycle gate.
#
# Why: the degraded regime CLAMPS big kernels (512² terrain reads a flat
# ~1391 ms for every knob config — differences invisible), but small
# kernels stay readable (~5-8% uniformly low: the wall A/B showed real
# spread in the same session). So run the round-3b structural knob A/B
# on SMALLER terrain configs (256² and 128², same scene/knob matrix —
# suppression cancels in same-size comparisons) to get relative signal
# TODAY, annotated as degraded-regime reads pending healthy confirmation.
# Then fall back to chainC's low-duty-cycle healthy gate (short fresh
# client + 18-min idle gaps).
set -u
cd /root/repo
log() { echo "[chainD $(date +%H:%M:%S)] $*" >&2; }

FULL_CUTOFF=$(date -d '2026-08-19 17:15 UTC' +%s)   # last start of full battery
LATE_CUTOFF=$(date -d '2026-08-19 18:10 UTC' +%s)   # last start of ladder-only

run_battery() {
  log "battery 1/5: terrain knob A/B at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 10 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4D_knob_ab.log 2>&1
  log "battery 1/5 rc=$?"; sleep 60
  log "battery 2/5: seed oracle probe (terrain warm-start upper bound)"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 10 \
    > /tmp/r4D_seed_probe.log 2>&1
  log "battery 2/5 rc=$?"; sleep 60
  log "battery 3/5: wall TILE_RPS/supertile A/B (5 rounds)"
  python -u tools/tpu_env_ab.py --scene wall --rounds 5 \
    --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
    > /tmp/r4D_wall_ab.log 2>&1
  log "battery 3/5 rc=$?"; sleep 60
  log "battery 4/5: paged-texture knobs"
  python -u tools/tpu_paged_tex_bench.py > /tmp/r4D_paged_default.log 2>&1
  sleep 60
  MRT_TEX_REUSE=0 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4D_paged_noreuse.log 2>&1
  sleep 60
  MRT_TEX_FB_ROWS=32 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4D_paged_fb32.log 2>&1
  log "battery 4/5 rc=$?"; sleep 60
  log "battery 5/5: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4D.json 2>/tmp/bench_r4D.log
  log "battery 5/5 rc=$?"
  if python - <<'EOF'
import json, sys
try:
    rec = json.loads(open("/tmp/bench_r4D.json").read().strip().splitlines()[-1])
except Exception:
    sys.exit(1)
sys.exit(0 if (rec.get("tpu_health") or {}).get("healthy") else 1)
EOF
  then
    cp /tmp/bench_r4D.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured"
    return 0
  fi
  return 1
}

# ---- Stage 0: degraded-readable knob A/Bs (run NOW, small kernels) ----
log "stage 0a: terrain knob A/B at 256 (3 rounds, degraded-readable)"
python -u tools/tpu_env_ab.py --rounds 3 --res 256 \
  --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
            "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4D_knob256.log 2>&1
log "stage 0a rc=$?"; sleep 60
log "stage 0b: terrain knob A/B at 128 (3 rounds, degraded-readable)"
python -u tools/tpu_env_ab.py --rounds 3 --res 128 \
  --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
            "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4D_knob128.log 2>&1
log "stage 0b rc=$?"; sleep 60
log "stage 0c: warm-start A/B at 256 (degraded-readable seed probe)"
python -u tools/tpu_seed_probe.py --res 256 > /tmp/r4D_seed256.log 2>&1
log "stage 0c rc=$?"

# ---- Low-duty-cycle healthy gate (chainC scheme) ----
got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$FULL_CUTOFF" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: short fresh-client anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r4D_gate.log 2>&1
  anchor=$(grep -oE '[0-9.]+ f/s' /tmp/r4D_gate.log | tail -1)
  log "probe $probe_n anchor: ${anchor:-unreadable}"
  if grep -q "session HEALTHY" /tmp/r4D_gate.log; then
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
  log "fallback: degraded-session paged-texture reuse A/B"
  python -u tools/tpu_paged_tex_bench.py > /tmp/r4D_paged_default_degr.log 2>&1
  sleep 60
  MRT_TEX_REUSE=0 python -u tools/tpu_paged_tex_bench.py \
    > /tmp/r4D_paged_noreuse_degr.log 2>&1
  sleep 60
  while [ "$(date +%s)" -lt "$LATE_CUTOFF" ]; do
    log "late probe: short anchor read + ladder if healthy"
    python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
      --configs "" > /tmp/r4D_gate_late.log 2>&1
    if grep -q "session HEALTHY" /tmp/r4D_gate_late.log; then
      MRT_BENCH_WAIT_MIN=5 python -u bench.py \
        > /tmp/bench_r4D_late.json 2>/tmp/bench_r4D_late.log
      cp /tmp/bench_r4D_late.json /tmp/bench_r4_final.json 2>/dev/null
      break
    fi
    sleep 1080
  done
fi
log "ALL DONE — tunnel free"
