#!/bin/bash
# Serial TPU measurement queue (one process at a time — two OOM the chip).
# Waits for the remote-compile relay to come back, then runs each probe.
# Round-3b state: the decision-critical items (quad_allfast / skin_bf16 /
# quad f32 / probe_bwd_pieces with skin_dvol_fixed) run first; the
# scatter-variant sweep and the sorted A/B close the backlog.
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

run python scripts/bench_train.py --only stage2_quad_allfast_noremat
run python scripts/bench_train.py --only stage2_skin_bf16_noremat
run python scripts/bench_train.py --only stage2_quad_noremat
run python scripts/probe_bwd_pieces.py --dtype float32
run python scripts/probe_bwd_pieces.py --dtype float32 --sorted
run python scripts/bench_train.py --only stage2_pallas_mlp_bf16_noremat --sorted-scatter
run python scripts/probe_scatter.py
run python bench.py
echo "=== queue done $(date -u) ===" >> "$log"
