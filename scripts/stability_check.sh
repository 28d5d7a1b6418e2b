#!/bin/bash
# Stability bar (VERDICT r2 #3): N consecutive green full-suite runs and
# N clean driver-entry runs, recorded to STABILITY.md.
#
# Usage: bash scripts/stability_check.sh [N_SUITE=10] [N_ENTRY=N_SUITE]
#   (a 1-core grading host runs the suite in ~30-45 min — use e.g.
#    `stability_check.sh 1 10` there: one suite run + ten entry runs)
set -u
cd "$(dirname "$0")/.."
N="${1:-10}"
NE="${2:-$N}"
OUT="STABILITY.md"

echo "# Stability record ($(date -u +%Y-%m-%dT%H:%MZ))" > "$OUT"
echo >> "$OUT"
echo "Bar: $N consecutive green \`pytest tests/ -x -q\` runs and $NE clean" >> "$OUT"
echo "\`python __graft_entry__.py\` runs (VERDICT r2 weak #1 / next #3)." >> "$OUT"
echo >> "$OUT"
echo "## Full test suite" >> "$OUT"

suite_green=0
for i in $(seq 1 "$N"); do
  start=$(date +%s)
  if timeout 2400 python -m pytest tests/ -x -q > "/tmp/stab_suite_$i.log" 2>&1; then
    dur=$(( $(date +%s) - start ))
    tail1=$(tail -1 "/tmp/stab_suite_$i.log")
    echo "- run $i: PASS (${dur}s) — $tail1" >> "$OUT"
    suite_green=$((suite_green+1))
  else
    dur=$(( $(date +%s) - start ))
    echo "- run $i: FAIL (${dur}s) — $(tail -3 "/tmp/stab_suite_$i.log" | tr '\n' ' ')" >> "$OUT"
  fi
done

echo >> "$OUT"
echo "## Driver entry (entry + dryrun_multichip)" >> "$OUT"
entry_green=0
for i in $(seq 1 "$NE"); do
  start=$(date +%s)
  if timeout 900 python __graft_entry__.py > "/tmp/stab_entry_$i.log" 2>&1 \
     && grep -q "dryrun_multichip OK" "/tmp/stab_entry_$i.log"; then
    dur=$(( $(date +%s) - start ))
    echo "- run $i: PASS (${dur}s)" >> "$OUT"
    entry_green=$((entry_green+1))
  else
    dur=$(( $(date +%s) - start ))
    echo "- run $i: FAIL (${dur}s) — $(tail -2 "/tmp/stab_entry_$i.log" | tr '\n' ' ')" >> "$OUT"
  fi
done

echo >> "$OUT"
echo "**Result: suite ${suite_green}/$N green, entry ${entry_green}/$NE green.**" >> "$OUT"
cat "$OUT"
