#!/bin/bash
# Quiet-window bench launcher for the overcommitted host (see BENCH.md):
# poll the calibrated single-core CPU probe every ~30 s and fire
# `python bench.py` only when two samples 15 s apart both read >= THRESH
# of the stored calibration — launching into a degraded window wastes
# 20+ minutes and records walls 1.5-2x the engine's quiet band.
#
# Usage: bash jobs/bench_watcher.sh [THRESH] [OUT_PREFIX]
#   THRESH      probe ratio needed to launch (default 0.92; round-5
#               evidence: windows >= 0.92 produced the only clean gates)
#   OUT_PREFIX  output path prefix (default .scratch/bench_watch)
# Writes $OUT_PREFIX.json / $OUT_PREFIX.err; logs probes to
# $OUT_PREFIX.log. Exits 0 after one bench run, 3 on ~2 h timeout.
set -u
cd "$(dirname "$0")/.."
THRESH="${1:-0.92}"
PREFIX="${2:-.scratch/bench_watch}"
LOG="$PREFIX.log"
mkdir -p "$(dirname "$PREFIX")" || { echo "cannot create output dir for $PREFIX" >&2; exit 2; }
# a missing/zero calibration makes every probe fail silently (0/0) and
# the watcher would poll 2 h then misreport host throttle — fail fast
python -c "import bench; c=bench._read_calibration(); exit(0 if c and c>0 else 1)" 2>/dev/null \
  || { echo "no bench calibration (run python bench.py once to create it)" >&2; exit 2; }
probe() { python -c "import bench; print(round(bench._abs_cpu_probe()/bench._read_calibration(),3))" 2>/dev/null; }
ok() { python -c "exit(0 if float('${1:-0}' or 0)>=$THRESH else 1)" 2>/dev/null; }
echo "$(date +%T) watcher start (thresh $THRESH)" >> "$LOG"
for _ in $(seq 1 240); do
  r=$(probe)
  echo "$(date +%T) probe $r" >> "$LOG"
  if ok "$r"; then
    sleep 15
    r2=$(probe)
    echo "$(date +%T) confirm $r2" >> "$LOG"
    if ok "$r2"; then
      echo "$(date +%T) LAUNCH" >> "$LOG"
      python bench.py > "$PREFIX.json" 2> "$PREFIX.err"
      rc=$?
      echo "$(date +%T) DONE rc=$rc" >> "$LOG"
      exit "$rc"
    fi
  fi
  sleep 30
done
echo "$(date +%T) timed out: no quiet window" >> "$LOG"
exit 3
