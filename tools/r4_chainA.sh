#!/bin/bash
# Round-4 consolidated on-chip chain (relaunch after the tunnel wedge):
# every measurement from VERDICT r3 in one serialized client sequence.
set -u
cd /root/repo

echo "[chainA] stage 1: terrain knob A/B (wait-healthy 75)" >&2
python -u tools/tpu_env_ab.py --rounds 3 \
  --wait-healthy 75 --wait-max-min 150 \
  --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
            "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" \
  > /tmp/r4_knob_ab2.log 2>&1
echo "[chainA] stage 1 rc=$?" >&2
sleep 90

echo "[chainA] stage 2: wall TILE_RPS + supertile A/B" >&2
python -u tools/tpu_env_ab.py --scene wall --rounds 3 \
  --configs "" "MRT_TILE_RPS=4" "MRT_SUPERTILE=8" \
            "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
  > /tmp/r4_wall_ab2.log 2>&1
echo "[chainA] stage 2 rc=$?" >&2
sleep 90

echo "[chainA] stage 3: canonical bench ladder" >&2
MRT_BENCH_WAIT_MIN=30 python -u bench.py \
  > /tmp/bench_r4a.json 2>/tmp/bench_r4a.log
echo "[chainA] stage 3 rc=$?" >&2
sleep 90

echo "[chainA] stage 4: parity matrix" >&2
python -u tools/tpu_parity_check.py > /tmp/r4_parity.log 2>&1
echo "[chainA] stage 4 rc=$?" >&2
sleep 90

echo "[chainA] stage 5: seed oracle probe" >&2
python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 60 \
  > /tmp/r4_seed_probe.log 2>&1
echo "[chainA] stage 5 rc=$?" >&2
sleep 90

echo "[chainA] stage 6: paged-texture geometry knobs (per-process)" >&2
python -u tools/tpu_paged_tex_bench.py > /tmp/r4_paged_default.log 2>&1
sleep 90
MRT_TEX_FB_ROWS=32 python -u tools/tpu_paged_tex_bench.py \
  > /tmp/r4_paged_fb32.log 2>&1
sleep 90
MRT_TEX_PAGE_ROWS=64 python -u tools/tpu_paged_tex_bench.py \
  > /tmp/r4_paged_pw64.log 2>&1
echo "[chainA] stage 6 rc=$?" >&2
sleep 90

echo "[chainA] stage 7: healthy-bench retry loop" >&2
for i in 1 2 3 4 5 6; do
  MRT_BENCH_WAIT_MIN=40 python -u bench.py \
    > /tmp/bench_r4_try$i.json 2>/tmp/bench_r4_try$i.log
  if python - "$i" <<'EOF'
import json, sys
i = sys.argv[1]
try:
    rec = json.loads(open(f"/tmp/bench_r4_try{i}.json").read().strip().splitlines()[-1])
except Exception:
    sys.exit(1)
h = rec.get("tpu_health") or {}
sys.exit(0 if h.get("healthy") else 1)
EOF
  then
    cp /tmp/bench_r4_try$i.json /tmp/bench_r4_final.json
    echo "[chainA] HEALTHY artifact on attempt $i" >&2
    break
  fi
  sleep 1500
done
echo "[chainA] ALL DONE" >&2
