#!/bin/bash
# Serial TPU measurement queue (one process at a time — two OOM the chip).
# Waits for the remote-compile relay to come back, then runs each probe.
# Round-4 state: re-measure the stage-2 fast step at the round-3b lever
# set (fixed-coords 3D-sampler VJP + halved quad backward tile landed
# AFTER the last recorded 0.540 — VERDICT item 3), then the gated bench.
cd "$(dirname "$0")/.."
log=/tmp/tpu_queue.log
echo "=== queue start $(date -u) ===" >> "$log"

# wait for the relay
until timeout 900 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jax.jit(lambda v: v*2+1)(jnp.arange(8.0)))
print('relay OK')
" >> "$log" 2>&1; do
  echo "relay still down $(date -u)" >> "$log"
  sleep 120
done

run() {
  echo "--- $* $(date -u)" >> "$log"
  timeout 3600 "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date -u)" >> "$log"
}

run python scripts/bench_train.py --only stage2_pallas_mlp_bf16_noremat
run python scripts/bench_train.py --only stage2_skin_bf16_noremat
run python bench.py
run python scripts/bench_train.py --only stage2_quad_noremat
run python scripts/bench_train.py --only stage2_noremat
run python bench.py --blind --coarse 64
echo "=== queue done $(date -u) ===" >> "$log"
