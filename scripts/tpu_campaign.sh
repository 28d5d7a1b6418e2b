#!/bin/bash
# Round-3 TPU measurement campaign: run the headline bench across the new
# execution knobs (unet impl, warp precision), the isolated UNet sweep, and
# the 1pass fidelity gate.  Results append to CAMPAIGN.log with timestamps.
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

# headline grid: defaults, wpack UNet, 1pass warp, both
run "bench dense/3pass"  python bench.py
run "bench wpack/3pass"  env V2E_UNET_IMPL=wpack python bench.py
run "bench dense/1pass"  env V2E_WARP_PRECISION=1pass python bench.py
run "bench wpack/1pass"  env V2E_UNET_IMPL=wpack V2E_WARP_PRECISION=1pass python bench.py

if [ "$QUICK" != "quick" ]; then
  run "sweep_wpack (isolated UNet)" python benchmarks/sweep_wpack.py
  run "warp 1pass fidelity gate"    python scripts/warp_precision_check.py
  run "conv forms shootout"         python benchmarks/bench_conv_forms.py
fi

echo; echo "== JSON lines recorded =="
grep -h '"metric"' "$LOG" | tail -8
