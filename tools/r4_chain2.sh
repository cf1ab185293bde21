#!/bin/bash
# Round-4 stage-2 chain: waits for r4_chain1 (knob A/B + wall TILE_RPS +
# canonical ladder) to finish, then runs the remaining on-chip work:
# the full parity matrix (VERDICT r3 #9), the best_t-seeding oracle
# probe (#3), the wall supertile A/B (#4), and the paged-texture
# geometry knob A/Bs (#6, per-process since the knobs bind at import).
set -u
LOG=/tmp/r4_chain1.log
while ! grep -q "ALL DONE" "$LOG" 2>/dev/null; do
  if [ -e "$LOG" ] && [ -n "$(find "$LOG" -mmin +400 2>/dev/null)" ]; then
    echo "[chain2] chain1 log static >400min; proceeding" >&2
    break
  fi
  sleep 120
done
sleep 90
cd /root/repo

echo "[chain2] parity matrix" >&2
python -u tools/tpu_parity_check.py > /tmp/r4_parity.log 2>&1
echo "[chain2] parity rc=$?" >&2
sleep 90

echo "[chain2] seed oracle probe" >&2
python -u tools/tpu_seed_probe.py --wait-healthy 75 --wait-max-min 90 \
  > /tmp/r4_seed_probe.log 2>&1
echo "[chain2] seed probe rc=$?" >&2
sleep 90

echo "[chain2] wall supertile A/B" >&2
python -u tools/tpu_env_ab.py --scene wall --rounds 3 \
  --configs "" "MRT_SUPERTILE=8" "MRT_TILE_RPS=4,MRT_SUPERTILE=8" \
  > /tmp/r4_wall2_ab.log 2>&1
echo "[chain2] wall2 rc=$?" >&2
sleep 90

echo "[chain2] paged-texture geometry knobs (per-process)" >&2
python -u tools/tpu_paged_tex_bench.py > /tmp/r4_paged_default.log 2>&1
sleep 90
MRT_TEX_FB_ROWS=32 python -u tools/tpu_paged_tex_bench.py \
  > /tmp/r4_paged_fb32.log 2>&1
sleep 90
MRT_TEX_PAGE_ROWS=64 python -u tools/tpu_paged_tex_bench.py \
  > /tmp/r4_paged_pw64.log 2>&1
sleep 90
MRT_TEX_FB_ROWS=32 MRT_TEX_PAGE_ROWS=64 python -u tools/tpu_paged_tex_bench.py \
  > /tmp/r4_paged_fb32pw64.log 2>&1
echo "[chain2] ALL DONE" >&2
