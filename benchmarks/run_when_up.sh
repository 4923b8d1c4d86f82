#!/bin/bash
# Unattended post-optimization measurement battery.
#
# Polls the axon TPU tunnel (which has two outage modes: fail-fast
# UNAVAILABLE and a BLOCKING client constructor — hence the subprocess
# probe under `timeout`); the moment it answers, runs (serialized — one
# process owns the chip) the compiled-kernel correctness gates, the
# mask-select A/B, the headline bench, and the post-strength-reduction
# tile sweeps, appending everything to $OUT.  Written for the multi-hour
# tunnel outages of round 2 so no availability window is wasted.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/tpu_battery.log}
echo "=== battery start $(date -u +%FT%TZ) ===" >> "$OUT"

# 1. wait for the chip (up to ~8h; each hung probe is killed at 120s)
up=0
for i in $(seq 1 300); do
  if timeout 120 python -c "import jax; jax.devices()" 2>/dev/null; then
    up=1; break
  fi
  sleep 90
done
if [ "$up" != 1 ]; then
  echo "TPU never came up $(date -u +%FT%TZ)" >> "$OUT"
  exit 1
fi
echo "TPU up at $(date -u +%FT%TZ)" >> "$OUT"

run() {
  echo "--- $* ($(date -u +%FT%TZ))" >> "$OUT"
  timeout 2400 "$@" >> "$OUT" 2>&1
  echo "--- exit=$? ($(date -u +%FT%TZ))" >> "$OUT"
}

# 2. compiled-kernel correctness gates (golden NL + full TL/AD symmetry)
run python drivers/run_nonlinear.py --precision single --num-cols 4096 --impl pallas
run python drivers/run_symmetry_test.py --precision single --num-cols 4096 --impl pallas
# 3. mask-select A/B (decides the MASK_SELECT default)
run python benchmarks/sweep_maskselect.py
# 4. headline bench (NL/TL/AD chains)
run python bench.py
# 5. tile sweeps on the folded/strength-reduced kernels
run python benchmarks/sweep_tl.py
run python benchmarks/sweep_ad.py
echo "=== battery done $(date -u +%FT%TZ) ===" >> "$OUT"
