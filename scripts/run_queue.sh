#!/bin/bash
# Serial TPU measurement queue (one process at a time — two OOM the chip).
# Waits for the remote-compile relay to come back, then runs each probe.
# Round-5 state: sampling-schedule sweep (fps for the gated configs whose
# fidelity the round-5 dB harness measures + blind re-measure for the
# round-4 16.75-vs-17.24 regression check), then the two untried bf16
# training variants against the <=0.5 s/iter stage-2 target.
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
  timeout 7200 "$@" >> "$log" 2>&1
  echo "--- rc=$? $(date -u)" >> "$log"
}

run python scripts/sweep_sampling.py
run python scripts/bench_train.py --only stage2_all_bf16_noremat
run python scripts/bench_train.py --only stage2_quad_allfast_noremat
echo "=== queue done $(date -u) ===" >> "$log"
