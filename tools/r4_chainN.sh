#!/bin/bash
# Round-4 chain N: post-reboot short-window chain (the session driver's
# wall clock is ~1h, so every stage is bounded and the chain exits well
# before the driver's end-of-round bench needs the tunnel).
# Pending on-chip reads it serves, in value order:
#   N0 planar-pack A/B on the headline row (MRT_PACK_PLANAR default-on
#      with zero hardware reads; first config doubles as the health
#      anchor) — headline class stays roughly readable degraded
#   N1 planar-pack A/B on the textured row
#   N2 multicam camera-fold fine curve (4/8/16 vs 64 default; the
#      chainL 4-vs-64 gap was inside the degraded spread)
#   N3 ONLY if N0's anchor read healthy: terrain structural-knob A/B
#      (the r3b defaults still have zero readable on-chip rows)
# Single client at all times; the deadline is checked between stages.
set -u
cd /root/repo
log() { echo "[chainN $(date +%H:%M:%S)] $*" >&2; }

DEADLINE=$(( $(date +%s) + ${CHAINN_BUDGET_S:-2400} ))
left() { echo $(( DEADLINE - $(date +%s) )); }

log "deadline in $(left)s"

log "N0: planar pack A/B (headline, 3 rounds) + health anchor"
python -u tools/tpu_env_ab.py --rounds 3 --scene headline \
  --configs "" "MRT_PACK_PLANAR=0" > /tmp/r4N_planar_headline.log 2>&1
log "N0 rc=$?  ($(left)s left)"; sleep 30

if [ "$(left)" -gt 900 ]; then
  log "N1: planar pack A/B (textured, 2 rounds)"
  python -u tools/tpu_env_ab.py --rounds 2 --scene textured \
    --configs "" "MRT_PACK_PLANAR=0" > /tmp/r4N_planar_tex.log 2>&1
  log "N1 rc=$?  ($(left)s left)"; sleep 30
fi

if [ "$(left)" -gt 700 ]; then
  log "N2: multicam camera-fold fine curve (3 rounds)"
  python -u tools/tpu_env_ab.py --rounds 3 --scene multicam \
    --configs "MRT_SUPERTILE=4" "MRT_SUPERTILE=8" "MRT_SUPERTILE=16" "" \
    > /tmp/r4N_multicam.log 2>&1
  log "N2 rc=$?  ($(left)s left)"; sleep 30
fi

# Terrain compiles are 80s+ each with a cold cache (the reboot wiped
# /tmp/mrt_xla_cache): only worth it if the session is healthy AND
# there is real time left.
anchor_healthy=0
# Read the first-config median f/s and compare to 480k (healthy
# headline reads 500k+, degraded ~450-477k, clamped far less).
med=$(grep -oE 'MEDIAN \[defaults\]: [0-9,.]+' /tmp/r4N_planar_headline.log \
      | head -1 | grep -oE '[0-9,.]+$' | tr -d ,)
log "headline first-config median: ${med:-none} (healthy flag: $anchor_healthy)"
# ADVICE r4 (medium): the clamp is KERNEL-CLASS-dependent — a clamped
# session reads the headline ~477k (inside ±10% of a 480k bar) while
# terrain reads are garbage at any size. Bar raised to 500k (canonical
# 502-518k) AND N3 itself now waits on the terrain anchor, which is the
# kernel class actually being measured.
if [ -n "${med:-}" ] && python -c "import sys; sys.exit(0 if float('$med') >= 500000 else 1)"; then
  anchor_healthy=1
fi

if [ "$anchor_healthy" = 1 ] && [ "$(left)" -gt 1200 ]; then
  log "N3: terrain knob A/B (healthy window, 2 rounds, 256 res for compile budget)"
  python -u tools/tpu_env_ab.py --rounds 2 --res 256 \
    --wait-healthy 75 --wait-max-min 10 \
    --configs "" "MRT_PLANE_BINS=0" "MRT_TRI_RANGES=0" "MRT_ATTR_ONCE=0" \
              "MRT_UV_DEFER=0" "MRT_WIN_SORT=1" > /tmp/r4N_knob_ab.log 2>&1
  log "N3 rc=$?  ($(left)s left)"
else
  log "N3 skipped (healthy=$anchor_healthy, left=$(left)s)"
fi

log "ALL DONE — tunnel free"
