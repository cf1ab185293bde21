#!/bin/bash
# Round-3c chain stage 2: after the canonical bench (/tmp/bench_r3c.json)
# lands, run wall + headline knob A/Bs — but only if the session is
# healthy and there is comfortable margin before the driver's own
# end-of-round bench (no second client may be alive then).
set -u
DEADLINE_H=${DEADLINE_H:-10}
DEADLINE_M=${DEADLINE_M:-30}
for i in $(seq 1 300); do
  [ -s /tmp/bench_r3c.json ] && break
  sleep 60
done
[ -s /tmp/bench_r3c.json ] || { echo "[chain2] no bench artifact; exit" >&2; exit 0; }
now_h=$(date +%H); now_m=$(date +%M)
if [ "$now_h" -gt "$DEADLINE_H" ] || { [ "$now_h" -eq "$DEADLINE_H" ] && [ "$now_m" -ge "$DEADLINE_M" ]; }; then
  echo "[chain2] past ${DEADLINE_H}:${DEADLINE_M}; leaving the tunnel free for the driver" >&2
  exit 0
fi
if ! grep -q '"healthy": true' /tmp/bench_r3c.json; then
  echo "[chain2] bench ran degraded; wall A/B would be unreadable; exit" >&2
  exit 0
fi
sleep 90
cd /root/repo
# Bitwise kernel<->jnp parity on hardware first — pins the round-3b
# structural knobs (plane bins, tri ranges, attr-once, prep rows) on
# chip, not just in CPU interpret mode.
python -u tools/tpu_parity_check.py > /tmp/parity_r3c.log 2>&1
sleep 60
python -u tools/tpu_env_ab.py --scene wall --rounds 3 --wait-healthy 0 \
  --configs "" "MRT_PLANE_BINS=0" "MRT_PREP_STREAM=0" "MRT_TILE_RPS=2" \
  "MRT_TILE_RPS=4" \
  > /tmp/wall_ab_r3c.log 2>&1
sleep 60
python -u tools/tpu_env_ab.py --scene headline --rounds 3 --wait-healthy 0 \
  --configs "" "MRT_PLANE_BINS=0" "MRT_WIN_SORT=1" \
  > /tmp/head_ab_r3c.log 2>&1
echo "[chain2] done"
