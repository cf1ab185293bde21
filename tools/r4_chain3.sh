#!/bin/bash
# Round-4 stage-3 chain: after chain2, keep re-running the canonical
# bench ladder until one run carries tpu_health.healthy=true (VERDICT
# r3 #1: a healthy-session driver artifact), up to 8 attempts spaced
# 25 min. Each attempt is one clean client (no kills).
set -u
LOG=/tmp/r4_chain2.log
while ! grep -q "ALL DONE" "$LOG" 2>/dev/null; do
  if [ -e "$LOG" ] && [ -n "$(find "$LOG" -mmin +700 2>/dev/null)" ]; then
    echo "[chain3] chain2 log static >700min; proceeding" >&2
    break
  fi
  sleep 180
done
sleep 90
cd /root/repo
for i in 1 2 3 4 5 6 7 8; do
  echo "[chain3] bench attempt $i" >&2
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
    echo "[chain3] HEALTHY artifact on attempt $i" >&2
    break
  fi
  sleep 1500
done
echo "[chain3] ALL DONE" >&2
