#!/bin/bash
# Round-4 chain G: chase the headline bottleneck + record the new
# watertight parity bar, then resume the healthy gate.
#
# The ablation probe (chainF stage 0b) showed NO per-pixel kernel stage
# above ~4% of step time at the headline config — the time goes
# somewhere else. Stage 0 here isolates the remaining candidates
# (XLA epilogue via render_core-only rollouts; per-program floor via
# MRT_SUPERTILE=16/64) and captures a device-op profile, plus re-runs
# the parity matrix (now with the documented watertight depth bar — a
# clean 0-FAILURES record). Then the chainE/F probe-gated loop.
set -u
cd /root/repo
log() { echo "[chainG $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r4G_cutoff
[ -e "$CUTOFF_FILE" ] || date -d '+6 hours' +%s > "$CUTOFF_FILE"

while ! grep -q "ALL DONE" /tmp/r4_chainF.log 2>/dev/null; do
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

log "stage 0a: epilogue/supertile probe (headline class, 3 rounds)"
python -u tools/tpu_epilogue_probe.py --rounds 3 > /tmp/r4G_epilogue.log 2>&1
log "stage 0a rc=$?"; sleep 60
log "stage 0b: device-op profile at the headline config"
python -u tools/tpu_profile_session.py 4096 pallas > /tmp/r4G_profile.log 2>&1
log "stage 0b rc=$?"; sleep 60
log "stage 0c: parity matrix re-run (watertight depth bar)"
python -u tools/tpu_parity_check.py > /tmp/r4G_parity.log 2>&1
log "stage 0c rc=$?"; sleep 60

run_battery() {
  log "battery 1/4: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4G.json 2>/tmp/bench_r4G.log
  log "battery 1/4 rc=$?"
  if healthy_artifact /tmp/bench_r4G.json; then
    cp /tmp/bench_r4G.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured -> /tmp/bench_r4_final.json"
  fi
  sleep 60
  log "battery 2/4: terrain knob A/B at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 5 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4G_knob_ab.log 2>&1
  log "battery 2/4 rc=$?"; sleep 60
  log "battery 3/4: seed oracle probe"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 5 \
    > /tmp/r4G_seed_probe.log 2>&1
  log "battery 3/4 rc=$?"; sleep 60
  log "battery 4/4: watertight cost A/B healthy re-read"
  python -u tools/tpu_watertight_ab.py --rounds 3 > /tmp/r4G_wt_ab.log 2>&1
  log "battery 4/4 rc=$?"
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$(cat "$CUTOFF_FILE")" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: short fresh-client anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r4G_gate.log 2>&1
  anchor=$(grep -oE '[0-9.]+ f/s' /tmp/r4G_gate.log | tail -1)
  log "probe $probe_n anchor: ${anchor:-unreadable}"
  if grep -q "session HEALTHY" /tmp/r4G_gate.log; then
    log "probe HEALTHY — running full battery"
    sleep 60
    run_battery
    got_healthy=1
    log "battery complete — continuing low-duty probes"
    sleep 1080
  else
    log "still degraded; tunnel idle for 18 min"
    sleep 1080
  fi
done
log "ALL DONE — tunnel free (got_healthy=$got_healthy)"
