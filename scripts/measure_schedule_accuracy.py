"""Accuracy of each sampling schedule against a DENSE ground truth.

The fidelity harnesses score agreement with the reference's blind 64+16
march — but on scenes with structure finer than the blind spacing that
comparison is ill-posed (the gated schedules sample DENSER than blind
64+16 inside the box: blind-64 spacing over the [0.5, 6] slack is 0.086
vs gated-32's 0.088 and gated-16's 0.175 over the ~2.8 box chord; a
disagreement can mean the gated render is MORE accurate). This script
scores every schedule, blind included, against a quasi-exact blind
2003+16 render of the same scene, on two constructed-density scenes:

  * blob  — the box-contained step scene of
            tests/test_gated_sampling.py (hard edges at the box faces);
  * slabs — thin half-wave density slabs (~0.14 world units, from a
            posenc z-harmonic gated to the box interior), THINNER than
            every schedule's coarse spacing: the worst case for coarse
            PDF discovery that a trained 128-res plane field could
            plausibly represent.

Runs on CPU in ~2 min. Results recorded in docs/PERF.md round 5.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from havatar_tpu.models import AvatarRenderer  # noqa: E402
from havatar_tpu.models.renderer import AvatarRenderer as AR  # noqa: E402
from havatar_tpu.ops import tighten_ray_near_far  # noqa: E402


def build_scene(slabs: bool):
    """The renderer + surgically-densified params of the gated render test
    (tests/test_gated_sampling.py docstring documents the construction);
    ``slabs=True`` additionally rewires hidden unit 1 to
    relu(sin(32·z_warped) + boxfeat − 1) — half-wave density slabs that
    exist ONLY inside the box (outside, boxfeat=0 makes the preactivation
    ≤ 0) — and adds it to sigma."""
    renderer = AvatarRenderer(latent_code_dim=8, plane_feat_dim=16,
                              plane_res=16, cond_res=32, plane_middle_size=4,
                              feat_dim=16, render_size=16, skin_vol_res=8)
    B, R = 1, 256
    rng = jax.random.PRNGKey(7)
    d = jax.random.normal(rng, (B, R, 3)) * 0.05 + jnp.asarray([0., 0., -1.])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate([
        jnp.zeros((B, R, 2)), jnp.full((B, R, 1), 3.0), d,
        jnp.full((B, R, 1), 0.5), jnp.full((B, R, 1), 6.0)], -1)
    inv_T = jnp.broadcast_to(
        jnp.concatenate([jnp.eye(3), jnp.zeros((1, 3))], 0), (B, 4, 3))
    bg = jax.random.uniform(jax.random.PRNGKey(3), (B, R, 3))
    lat = jnp.zeros((B, 8))
    conds = [jax.random.uniform(jax.random.PRNGKey(11 + i), (B, 32, 32, 7))
             for i in range(3)]
    nv = renderer.init(jax.random.PRNGKey(0), rays, bg, lat, inv_T, *conds,
                       num_coarse=4, num_fine=2, perturb=False)
    p = jax.tree_util.tree_map(lambda x: x, nv)
    f = p["params"]["field"]
    C = renderer.plane_feat_dim
    yz = f["YZ_gen"]
    yz["conv_out"] = {**yz["conv_out"],
                      "act_bias": yz["conv_out"]["act_bias"] * 0.0 + 1.0}
    k0 = f["layer0"]["kernel"]
    col_box = jnp.zeros((k0.shape[0],)).at[1:2 * C:2].set(1.0 / C)
    k0 = k0.at[:, 0].set(col_box)
    b0 = f["layer0"]["bias"].at[0].set(0.0)
    if slabs:
        # layer0 input = [2C interleaved plane feats, posenc(48)];
        # posenc col (f, sin, z) = 2C + f*6 + 2 -> sin(2^5 · z_warped)
        col_slab = col_box.at[2 * C + 5 * 6 + 2].set(1.0)
        k0 = k0.at[:, 1].set(col_slab)
        b0 = b0.at[1].set(-1.0)     # relu(sin + boxfeat - 1)
    f["layer0"]["kernel"] = k0
    f["layer0"]["bias"] = b0
    k1 = f["layer1"]["kernel"].at[:, 0].set(0.0).at[0, 0].set(1.0)
    b1 = f["layer1"]["bias"].at[0].set(0.0)
    if slabs:
        k1 = k1.at[:, 1].set(0.0).at[1, 1].set(1.0)
        b1 = b1.at[1].set(0.0)
    f["layer1"]["kernel"] = k1
    f["layer1"]["bias"] = b1
    ka = f["fc_alpha"]["kernel"] * 0.0
    if slabs:
        # sigma = 12·slab − 0.5: opaque thin slabs, near-empty in between
        ka = ka.at[1, 0].set(12.0)
    else:
        ka = ka.at[0, 0].set(2.0)
    f["fc_alpha"]["kernel"] = ka
    f["fc_alpha"]["bias"] = f["fc_alpha"]["bias"] * 0.0 - 0.5
    return renderer, p, rays, bg, lat, inv_T, conds


def render(renderer, p, rays, bg, lat, inv_T, conds, nc, nf):
    out = renderer.apply(p, rays, bg, lat, inv_T, *conds,
                         num_coarse=nc, num_fine=nf, perturb=False)
    return np.asarray(out["rgb_fine"][..., :3]), np.asarray(out["acc_fine"])


def psnr(a, b):
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-20))


def main():
    for scene in ("blob", "slabs"):
        renderer, p, rays, bg, lat, inv_T, conds = build_scene(
            slabs=scene == "slabs")
        gated = tighten_ray_near_far(rays, renderer.gate_aabb, inv_T)
        gt, acc = render(renderer, p, rays, bg, lat, inv_T, conds, 2003, 16)
        print(f"# scene={scene} gt acc={acc.mean():.3f}", flush=True)
        rows = [("blind", rays, 64, 16), ("gated", gated, 32, 16),
                ("gated", gated, 24, 16), ("gated", gated, 16, 16)]
        for kind, r, nc, nf in rows:
            img, _ = render(renderer, p, r, bg, lat, inv_T, conds, nc, nf)
            print(json.dumps({"scene": scene, "mode": kind, "nc": nc,
                              "nf": nf,
                              "psnr_vs_gt_db": round(psnr(img, gt), 2)}),
                  flush=True)


if __name__ == "__main__":
    main()
