#!/bin/bash
# Round-4 stage-1 chain (VERDICT r3 #1): convert the round-3b structural
# knobs into on-chip truth, read TILE_RPS on the wall row, then re-record
# the canonical ladder — all in one long-lived sequence so a healthy
# window found by stage 1 is reused by stages 2-3.
set -u
cd /root/repo

echo "[chain] stage 1: terrain knob A/B (wait-healthy 75)" >&2
python -u tools/tpu_env_ab.py --rounds 3 \
  --wait-healthy 75 --wait-max-min 240 \
  --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
            "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" \
  > /tmp/r4_knob_ab.log 2>&1
echo "[chain] stage 1 rc=$?" >&2
sleep 90

echo "[chain] stage 2: wall TILE_RPS A/B" >&2
python -u tools/tpu_env_ab.py --scene wall --rounds 3 \
  --wait-healthy 115000 --wait-max-min 30 \
  --configs "" "MRT_TILE_RPS=4" "MRT_TILE_RPS=2" \
  > /tmp/r4_wall_ab.log 2>&1
echo "[chain] stage 2 rc=$?" >&2
sleep 90

echo "[chain] stage 3: canonical bench ladder" >&2
MRT_BENCH_WAIT_MIN=45 python -u bench.py \
  > /tmp/bench_r4a.json 2>/tmp/bench_r4a.log
echo "[chain] stage 3 rc=$?" >&2
echo "[chain] ALL DONE" >&2
