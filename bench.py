"""Benchmark: 512² self-reenactment throughput (frames/sec) on TPU.

Times the flagship inference pipeline — conditioned double-plane NeRF
(full 128² feature render) followed by the StyleUNet 128²→512²
super-resolution — end to end, device-resident, with per-frame changing
inputs (conditions + head pose), exactly the per-frame work of the
reference's reenactment loop (avatarHD_reenactment.py:151-170).

Default schedule: occupancy-gated (gate_aabb halo) 16 coarse + 16 fine
samples/ray vs the reference's blind 64+16 over the dataset near/far.
Measured quality of this operating point (docs/PERF.md round 5, asserted
in test_torch_checkpoint_files.py + test_gated_sampling.py): 47.6 dB
agreement with the reference's frame on a dense checkpoint scene, and
ground-truth accuracy within 1.0 dB of the reference schedule's own
(44.9 vs 45.9 dB vs a dense blind 509+16 render) at 2.0x its frame
rate. ``--coarse 32`` selects the quality knee — MORE accurate than the
reference's blind 64+16 (48.5 vs 45.9 dB vs ground truth); ``--blind``
reproduces the reference's exact schedule (112.9 dB, bit-level parity
path).

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "fps", "vs_baseline": fps/30}
(the driver-set target is >=30 fps at 512², BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _wait_for_backend(max_wait_s: float = 1800.0) -> None:
    """Retry a trivial compile until the remote-compile relay answers.

    The axon backend's relay (the only way this environment reaches the
    TPU compiler) goes down for stretches and fails with INTERNAL errors
    mid-read; a bench invocation that lands in such a window would
    otherwise die before measuring anything. Bounded, logs to stderr."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    while True:
        try:
            jax.jit(lambda x: x + 1)(jnp.ones((8, 128))).block_until_ready()
            return
        except Exception as e:                        # noqa: BLE001
            if time.time() - t0 > max_wait_s:
                raise
            print(f"bench: backend probe failed ({type(e).__name__}); "
                  f"retrying in 120 s", file=sys.stderr, flush=True)
            time.sleep(120.0)


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="store_true",
                    help="shard the ray axis over all visible devices "
                         "(auto-enabled when >1 device)")
    ap.add_argument("--frames", type=int, default=30,
                    help="frames per timed run (smoke tests use 1)")
    ap.add_argument("--blind", action="store_true",
                    help="disable occupancy-gated sampling: march the "
                         "reference's blind 64+16 schedule over the full "
                         "dataset near/far")
    ap.add_argument("--coarse", type=int, default=None,
                    help="coarse samples/ray (default: 16 gated, 64 blind)")
    ap.add_argument("--fine", type=int, default=16,
                    help="fine samples/ray")
    flags, _ = ap.parse_known_args()
    gated = not flags.blind
    num_coarse = flags.coarse if flags.coarse is not None else (
        16 if gated else 64)

    _wait_for_backend()

    use_mesh = flags.mesh or jax.device_count() > 1
    mesh = None
    if use_mesh:
        from havatar_tpu.parallel import make_mesh

        mesh = make_mesh(("data",))
    # Multi-chip runs the shard_map serving route (infer/serving.py): each
    # chip runs the fused Pallas march on its ray shard — shard_map is what
    # keeps the kernels on a mesh (GSPMD cannot partition a Pallas call).
    forward, example_args = _build_flagship(mesh=mesh, gated=gated,
                                            num_coarse=num_coarse,
                                            num_fine=flags.fine)
    (nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T, front, left,
     right, style) = example_args

    # Per-frame varying inputs (conditions + head pose), pre-staged on device.
    # The frame loop runs INSIDE one jitted program (lax.map over frames) so
    # we measure device throughput — in production the conditions stream in
    # via async host->device copies that overlap compute; this environment's
    # per-call tunnel RPC (~seconds) would otherwise swamp the measurement.
    n_frames = flags.frames
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    fronts = jax.random.uniform(k1, (n_frames,) + front.shape)
    lefts = jax.random.uniform(k2, (n_frames,) + left.shape)
    rights = jax.random.uniform(k3, (n_frames,) + right.shape)

    def run_all(nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T,
                style, fronts, lefts, rights):
        def one(c):
            f, l, r = c
            img = forward(nerf_vars, sr_params, skin_vol, rays, bg, latent,
                          inv_T, f, l, r, style)
            # reduce each frame to a checksum: on this environment's tunnel
            # backend block_until_ready returns early for large device
            # buffers, so honest timing requires a small output (measured:
            # a 13-TFLOP chain "completed" in 0.1 ms when returning a
            # [8192,8192] array, 683 ms when returning its scalar sum)
            return jnp.mean(img.astype(jnp.float32))
        return jax.lax.map(one, (fronts, lefts, rights))

    fn = jax.jit(run_all)
    args = (nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T, style,
            fronts, lefts, rights)
    out = fn(*args)          # compile + warm up
    np.asarray(out)

    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    dt = time.perf_counter() - t0

    fps = n_frames / dt
    n_dev = jax.device_count() if mesh is not None else 1
    mode = (f"occupancy-gated {num_coarse}+{flags.fine}" if gated
            else f"blind {num_coarse}+{flags.fine}")
    label = (f"512^2 self-reenactment throughput (1 chip, {mode})"
             if n_dev == 1
             else f"512^2 self-reenactment throughput ({n_dev} chips, "
                  f"{mode}, ray-sharded fused march via shard_map)")
    print(json.dumps({
        "metric": label,
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
