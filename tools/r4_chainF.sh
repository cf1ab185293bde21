#!/bin/bash
# Round-4 chain F: degraded-readable measurement battery + healthy gate.
#
# Runs after chainE exits (waits on its ALL DONE sentinel). Stage 0 is
# work that does NOT need a healthy session: the watertight depth ulp
# diagnostic (correctness read), the per-pixel cost ablation probe on
# the headline class (relative factors readable in the clamp, CLAUDE.md
# protocol note), the wall TILE_RPS A/B (wall class, same), and the
# paged fallback-region A/B. Then the long-horizon low-duty-cycle
# health gate from chainE: on terrain-anchor recovery the canonical
# ladder runs first, then the terrain knob batteries.
#
# Cutoff file: /tmp/r4F_cutoff (epoch seconds; builder-extendable).
set -u
cd /root/repo
log() { echo "[chainF $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r4F_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+6 hours' +%s > "$CUTOFF_FILE"

# Wait for chainE to release the tunnel.
while ! grep -q "ALL DONE" /tmp/r4_chainE.log 2>/dev/null; do
  sleep 60
done
sleep 90

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

# ---- Stage 0: degraded-valid reads ----
log "stage 0a: watertight depth ulp diagnostic"
python -u tools/tpu_wt_depth_diag.py > /tmp/r4F_wt_diag.log 2>&1
log "stage 0a rc=$?"; sleep 60
log "stage 0b: per-pixel cost ablation probe (headline class, 3 rounds)"
python -u tools/tpu_env_ab.py --scene headline --rounds 3 \
  --configs "" "MRT_ABLATE_RAYGEN=1" "MRT_ABLATE_SWEEP=1" \
            "MRT_ABLATE_RESOLVE=1" "MRT_ABLATE_SHADE=1" "MRT_ABLATE_PACK=1" \
  > /tmp/r4F_ablate_ab.log 2>&1
log "stage 0b rc=$?"; sleep 60
log "stage 0c: wall TILE_RPS A/B (5 rounds)"
python -u tools/tpu_env_ab.py --scene wall --rounds 5 \
  --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
  > /tmp/r4F_wall_ab.log 2>&1
log "stage 0c rc=$?"; sleep 60
log "stage 0d: paged-texture fallback-region A/B"
python -u tools/tpu_paged_tex_bench.py > /tmp/r4F_paged_default.log 2>&1
sleep 60
MRT_TEX_FB_ROWS=32 python -u tools/tpu_paged_tex_bench.py \
  > /tmp/r4F_paged_fb32.log 2>&1
log "stage 0d rc=$?"; sleep 60

run_battery() {
  log "battery 1/4: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4F.json 2>/tmp/bench_r4F.log
  log "battery 1/4 rc=$?"
  if healthy_artifact /tmp/bench_r4F.json; then
    cp /tmp/bench_r4F.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured -> /tmp/bench_r4_final.json"
  else
    log "ladder came back unhealthy — continuing battery anyway"
  fi
  sleep 60
  log "battery 2/4: terrain knob A/B at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 5 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4F_knob_ab.log 2>&1
  log "battery 2/4 rc=$?"; sleep 60
  log "battery 3/4: seed oracle probe (terrain warm-start upper bound)"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 5 \
    > /tmp/r4F_seed_probe.log 2>&1
  log "battery 3/4 rc=$?"; sleep 60
  log "battery 4/4: watertight cost A/B healthy re-read"
  python -u tools/tpu_watertight_ab.py --rounds 3 > /tmp/r4F_wt_ab_healthy.log 2>&1
  log "battery 4/4 rc=$?"
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$(cat "$CUTOFF_FILE")" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: short fresh-client anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r4F_gate.log 2>&1
  anchor=$(grep -oE '[0-9.]+ f/s' /tmp/r4F_gate.log | tail -1)
  log "probe $probe_n anchor: ${anchor:-unreadable}"
  if grep -q "session HEALTHY" /tmp/r4F_gate.log; then
    log "probe HEALTHY — running full battery"
    sleep 60
    run_battery
    got_healthy=1
    log "battery complete — continuing low-duty probes for re-reads"
    sleep 1080
  else
    log "still degraded; tunnel idle for 18 min"
    sleep 1080
  fi
done
log "ALL DONE — tunnel free (got_healthy=$got_healthy)"
