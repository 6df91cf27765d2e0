"""Multi-chip stage-2 measurement hook (VERDICT r3 item 9).

Runs automatically from scripts/run_queue.sh; exits 0 immediately when only
one device is visible (the current environment tunnels a single v5e chip),
so it costs CI nothing — if multi-chip hardware ever appears the queue
picks it up with no code change:

  * the batch-sharded stage-2 d_step at the reference operating point
    (batch = n_devices full 128² frames -> 512² GAN) — the one step whose
    LOSS depends on cross-device batch statistics (minibatch-stddev groups,
    spec reference model/styleUnet.py:542-548). On 8 devices the stddev
    group-vs-batch interaction spans every chip, the case CI can only
    exercise on a 4-device virtual sub-mesh (tests/test_train_steps.py::
    test_stage2_d_step_sharded_matches_single; the 8-thread rendezvous
    starves the 1-core CI host).
  * the ray-sharded serving frame (bench.py --mesh runs this too; repeated
    here so one queue entry records both numbers).

Timing is device-resident (lax.scan inside one dispatch, transfer-synced)
— see scripts/bench_train.py:scan_time for why host-loop timing measures
the tunnel instead of the chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    n_dev = jax.device_count()
    if n_dev < 2:
        print(json.dumps({"skipped": f"1 device visible (need >=2); "
                          "re-run on a v5e-8 to record multi-chip numbers"}))
        return

    from bench_train import scan_time, synth_batch
    from havatar_tpu.cli.common import resolve_config
    from havatar_tpu.parallel import make_mesh, batch_sharding, replicated
    from havatar_tpu.train import stage2

    mesh = make_mesh(("data",))
    res = {"n_devices": n_dev}

    cfg = resolve_config("config/singleview_512_HD_base.yml")
    cfg.gan.batch = n_dev                 # one full frame per chip
    rng = jax.random.PRNGKey(0)
    batch = synth_batch(rng, B=n_dev, R=128 * 128, full=True)
    example = {k: np.asarray(v) for k, v in batch.items()}

    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        models, st = stage2.init_state(cfg, rng, num_frames=4,
                                       example_batch=example)
    d_step, _, _, _ = stage2.make_steps(cfg, *models)

    batch = {k: jax.device_put(v, batch_sharding(mesh))
             for k, v in batch.items()}
    st = jax.device_put(st, replicated(mesh))

    st, per_iter = scan_time(
        lambda s, i: d_step(s, batch, jax.random.fold_in(rng, i)), st, n=3)
    res[f"stage2_d_step_sharded_{n_dev}dev_s"] = per_iter
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
