#!/bin/bash
# Round-4 chain J: supertile-budget sweep, following the chainI D1
# epilogue-probe signal (MRT_SUPERTILE=64 medianed +15% on the headline
# row while st16 was neutral — map the curve with real rounds before
# touching the default; headline-class A/Bs stay readable in the
# degraded regime).
#   J1 headline: ST 4(default)/16/32/64/128, 5 rounds
#   J2 wall:     ST default/16/64, + ST=64+TILE_RPS=4 combo, 5 rounds
#   J3 textured: ST default vs 64, 3 rounds (in-kernel sampling class)
# Then the same health-gated terrain battery loop as chainI.
set -u
cd /root/repo
log() { echo "[chainJ $(date +%H:%M:%S)] $*" >&2; }

CUTOFF_FILE=/tmp/r4J_cutoff
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

log "J1: headline supertile sweep (5 rounds)"
python -u tools/tpu_env_ab.py --rounds 5 --scene headline \
  --configs "" "MRT_SUPERTILE=16" "MRT_SUPERTILE=32" "MRT_SUPERTILE=64" \
            "MRT_SUPERTILE=128" \
  > /tmp/r4J_headline_st.log 2>&1
log "J1 rc=$?"; sleep 60

log "J2: wall supertile sweep (5 rounds)"
python -u tools/tpu_env_ab.py --rounds 5 --scene wall \
  --configs "" "MRT_SUPERTILE=16" "MRT_SUPERTILE=64" \
            "MRT_SUPERTILE=64,MRT_TILE_RPS=4" \
  > /tmp/r4J_wall_st.log 2>&1
log "J2 rc=$?"; sleep 60

log "J3: textured supertile A/B (3 rounds)"
python -u tools/tpu_env_ab.py --rounds 3 --scene textured \
  --configs "" "MRT_SUPERTILE=64" \
  > /tmp/r4J_tex_st.log 2>&1
log "J3 rc=$?"; sleep 60
log "supertile sweep stage DONE — entering health-gated loop"

run_battery() {
  log "battery 1/4: canonical bench ladder"
  MRT_BENCH_WAIT_MIN=10 python -u bench.py \
    > /tmp/bench_r4J.json 2>/tmp/bench_r4J.log
  log "battery 1/4 rc=$?"
  if healthy_artifact /tmp/bench_r4J.json; then
    cp /tmp/bench_r4J.json /tmp/bench_r4_final.json
    log "HEALTHY ladder artifact captured -> /tmp/bench_r4_final.json"
  fi
  sleep 60
  log "battery 2/4: terrain knob A/B at 512 (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --wait-healthy 75 --wait-max-min 5 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4J_knob_ab.log 2>&1
  log "battery 2/4 rc=$?"; sleep 60
  log "battery 3/4: seed oracle + warmstart + prepass probe"
  python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 5 \
    > /tmp/r4J_seed_probe.log 2>&1
  log "battery 3/4 rc=$?"; sleep 60
  log "battery 4/4: healthy wall re-read (TILE_RPS x supertile)"
  python -u tools/tpu_env_ab.py --rounds 3 --scene wall \
    --configs "" "MRT_TILE_RPS=4" "MRT_SUPERTILE=64" \
              "MRT_SUPERTILE=64,MRT_TILE_RPS=4" \
    > /tmp/r4J_wall_healthy.log 2>&1
  log "battery 4/4 rc=$?"
}

got_healthy=0
probe_n=0
while [ "$(date +%s)" -lt "$(cat "$CUTOFF_FILE")" ]; do
  probe_n=$((probe_n + 1))
  log "probe $probe_n: short fresh-client anchor read (max 3 min poll)"
  python -u tools/tpu_env_ab.py --rounds 1 --wait-healthy 75 --wait-max-min 3 \
    --configs "" > /tmp/r4J_gate.log 2>&1
  anchor=$(grep -oE '[0-9.]+ f/s' /tmp/r4J_gate.log | tail -1)
  log "probe $probe_n anchor: ${anchor:-unreadable}"
  if grep -q "session HEALTHY" /tmp/r4J_gate.log; then
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
