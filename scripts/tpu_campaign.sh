#!/bin/bash
# TPU measurement campaign: headline bench across the execution knobs plus
# the 1pass fidelity gate.  Results append to CAMPAIGN.log with timestamps.
#
# (Round-4 history: the wpack UNet and conv-form shootouts this script used
# to run decided AGAINST those impls — wpack 0.835x isolated, s2d 416 vs
# 316 ms/chunk — and both were deleted; numbers in benchmarks/README.md.)
#
# Usage: bash scripts/tpu_campaign.sh [quick]
#   quick: headline variants only (skip the isolated sweeps)
set -u
cd "$(dirname "$0")/.."
LOG="CAMPAIGN.log"
QUICK="${1:-}"

run() {
  local name="$1"; shift
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG"
  timeout 2400 "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ($(date -u +%H:%M:%SZ))" | tee -a "$LOG"
}

# headline grid: default (1pass), 3pass fallback
run "bench default/1pass" python bench.py
run "bench 3pass"         env V2E_WARP_PRECISION=3pass python bench.py

if [ "$QUICK" != "quick" ]; then
  run "warp 1pass fidelity gate" python scripts/warp_precision_check.py
  run "isolated UNet sweep"      python benchmarks/sweep_unet.py
fi

echo; echo "== JSON lines recorded =="
grep -h '"metric"' "$LOG" | tail -8
