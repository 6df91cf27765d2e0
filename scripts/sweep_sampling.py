"""Sampling-schedule sweep for the flagship inference bench: fps per
(gated, num_coarse, num_fine) configuration in ONE process (serial, the
chip fits one job). Fidelity (dB) for these configs is measured by
tests/test_torch_checkpoint_files.py::test_stage2_checkpoint_file_gated_fidelity
and recorded in docs/PERF.md round 5."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run_config(gated, nc, nf, frames=30):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship

    forward, example_args = _build_flagship(gated=gated, num_coarse=nc,
                                            num_fine=nf)
    (nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T, front, left,
     right, style) = example_args
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    fronts = jax.random.uniform(k1, (frames,) + front.shape)
    lefts = jax.random.uniform(k2, (frames,) + left.shape)
    rights = jax.random.uniform(k3, (frames,) + right.shape)

    def run_all(nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T,
                style, fronts, lefts, rights):
        def one(c):
            f, l, r = c
            img = forward(nerf_vars, sr_params, skin_vol, rays, bg, latent,
                          inv_T, f, l, r, style)
            return jnp.mean(img.astype(jnp.float32))
        return jax.lax.map(one, (fronts, lefts, rights))

    fn = jax.jit(run_all)
    args = (nerf_vars, sr_params, skin_vol, rays, bg, latent, inv_T, style,
            fronts, lefts, rights)
    t0 = time.time()
    out = fn(*args)
    np.asarray(out)
    print(f"  compile+warm {time.time()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(out)
    dt = time.perf_counter() - t0
    print(json.dumps({"gated": gated, "nc": nc, "nf": nf,
                      "fps": round(frames / dt, 2)}), flush=True)


CONFIGS = [(True, 32, 16), (True, 32, 8), (True, 24, 16), (True, 24, 12),
           (True, 16, 16), (False, 64, 16)]
if len(sys.argv) > 1:
    CONFIGS = [tuple(c) for c in json.loads(sys.argv[1])]

for (g, nc, nf) in CONFIGS:
    print(f"=== gated={g} {nc}+{nf} {time.strftime('%H:%M:%S')}", flush=True)
    try:
        run_config(bool(g), nc, nf)
    except Exception as e:
        print("FAIL", repr(e), flush=True)
