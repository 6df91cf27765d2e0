#!/bin/bash
# Serial TPU measurement queue (one process at a time — two OOM the chip).
# Waits for the remote-compile relay to come back, then runs each probe.
# Round-5 end state: the sweep + training variants ran (results in
# docs/PERF.md round 5); this queue now re-verifies the two headline
# operating points end-to-end after any change.
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

run python bench.py
run python scripts/bench_train.py --only stage2_all_bf16_noremat
echo "=== queue done $(date -u) ===" >> "$log"
