#!/bin/bash
# Serial on-chip measurement queue (round 4 PENDING items).
#
# Waits for the axon TPU relay to come back, then runs every measurement
# that was queued on the outage, one at a time (1-CPU host: never two JAX
# jobs at once), logging to onchip_logs/.  Order: cheap decision-makers
# first (assignment A/B -> default), then quality/scaling measurements,
# then the full bench refresh with whatever defaults the A/B picked.
#
# Usage:  bash scripts/run_onchip_queue.sh [--no-wait]
set -u
cd "$(dirname "$0")/.."
mkdir -p onchip_logs

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
assert float(jnp.sum(x @ x)) > 0
assert jax.devices()[0].platform == "tpu"
EOF
}

if [ "${1:-}" != "--no-wait" ]; then
  echo "[queue] probing TPU relay..."
  until probe; do
    echo "[queue] relay down at $(date -u +%H:%M:%SZ); retry in 300s"
    sleep 300
  done
fi
echo "[queue] TPU up at $(date -u +%H:%M:%SZ)"

# 1-CPU host: never overlap a timed on-chip run with a pytest job or any
# CPU experiment that wrapped itself in a /tmp/cpu_busy.* marker
while pgrep -f "pytest" >/dev/null 2>&1 || ls /tmp/cpu_busy.* >/dev/null 2>&1; do
  echo "[queue] host busy (pytest or cpu_busy marker); waiting 60s"
  sleep 60
done
echo "[queue] starting queue at $(date -u +%H:%M:%SZ)"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[queue] ==== $name ($(date -u +%H:%M:%SZ)) ===="
  timeout "$tmo" "$@" >"onchip_logs/$name.log" 2>&1
  local rc=$?
  echo "[queue] $name done rc=$rc ($(date -u +%H:%M:%SZ))"
  tail -3 "onchip_logs/$name.log" | sed 's/^/[queue]   /'
}

run ab_assignment   2400 python scripts/ab_assignment.py
run amdahl_mot16    3600 python scripts/amdahl_mot16.py
run gallery_scaling 5400 python scripts/gallery_scaling.py
run int8_quality    5400 python examples/experiment_int8_quality.py
# crop_size quality ablation already measured in full on CPU (metrics are
# platform-independent; EVAL.md "Fast-crop mode") — chip time goes to
# perf-only runs instead
run dress_rehearsal 10800 python scripts/dress_rehearsal.py \
    --root /tmp/market_synth_r4 --int8 --check
run bench_full      3600 python bench.py

echo "[queue] ALL DONE $(date -u +%H:%M:%SZ)"
