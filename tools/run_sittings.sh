#!/bin/bash
# Paired spark/duck sitting batch (r16, r15 verdict #4): N sittings,
# spark-first back-to-back (the standing protocol, protocol-proven by
# the r15 pairing-order A/B), settle-gated launches. Usage:
#   tools/run_sittings.sh <batch> <n> [outdir]
# Writes <outdir>/<batch>_s{i}.json / <batch>_d{i}.json and a
# <batch>_sittings.log with launch/end loads and settle seconds.
set -u
BATCH="${1:?batch name}"
N="${2:?sitting count}"
OUT="${3:-docs/records/r16}"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
LOG="$OUT/${BATCH}_sittings.log"
for i in $(seq 1 "$N"); do
  settle=0
  # settle gate: wait (up to 10 min) for 1-min load < 1.0
  while true; do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < 1.0 else 0)")
    [ "$ok" = 1 ] && break
    [ "$settle" -ge 600 ] && break
    sleep 30; settle=$((settle + 30))
  done
  echo "$(date +%H:%M:%S) sitting ${BATCH}_s$i: load $(cut -d' ' -f1-3 /proc/loadavg) settle ${settle}s" >> "$LOG"
  SDLS_SETTLE_S=$settle python bench.py 2>/dev/null | tail -1 > "$OUT/${BATCH}_s$i.json"
  SDLS_SETTLE_S=$settle python tools/duck_baseline.py 2>/dev/null | tail -1 > "$OUT/${BATCH}_d$i.json"
  echo "$(date +%H:%M:%S) done ${BATCH}_s$i: end load $(cut -d' ' -f1 /proc/loadavg)" >> "$LOG"
done
