#!/bin/bash
# Unattended post-optimization measurement battery.
#
# Polls the axon TPU tunnel; the moment it answers, runs (serialized — one
# process owns the chip) the compiled-kernel smoke gates, the headline
# bench, and the post-stream-fold tile sweeps, appending everything to
# $OUT.  Written for the multi-hour tunnel outage of round 2 so no
# availability window is wasted.
set -u
cd /root/repo
OUT=${1:-/tmp/tpu_battery.log}
echo "=== battery start $(date -u +%FT%TZ) ===" >> "$OUT"

# 1. wait for the chip (up to ~8h)
up=0
for i in $(seq 1 320); do
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

# 2. compiled-kernel smoke gates (golden NL + full TL/AD symmetry)
run python drivers/run_nonlinear.py --precision single --num-cols 4096 --impl pallas
run python drivers/run_symmetry_test.py --precision single --num-cols 4096 --impl pallas
# 3. headline bench (NL/TL/AD chains)
run python bench.py
# 4. tile sweeps on the folded/strength-reduced kernels
run python benchmarks/sweep_tl.py
run python benchmarks/sweep_ad.py
echo "=== battery done $(date -u +%FT%TZ) ===" >> "$OUT"
