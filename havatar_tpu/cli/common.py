"""Shared CLI plumbing: config loading, seeding, checkpoint resolution."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from havatar_tpu.utils.cfgnode import CfgNode, load_config

_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "config")


def resolve_config(path_or_name: str) -> CfgNode:
    if os.path.exists(path_or_name):
        return load_config(path_or_name)
    builtin = os.path.join(_CONFIG_DIR, path_or_name)
    if os.path.exists(builtin):
        return load_config(builtin)
    raise FileNotFoundError(f"config not found: {path_or_name}")


def apply_platform_override() -> None:
    """HAVATAR_PLATFORM=cpu forces the CPU backend (useful for smoke runs —
    this image's sitecustomize pins the TPU platform regardless of
    JAX_PLATFORMS). Must run before the first device use: if the pinned
    TPU backend is unreachable, ANY jax device use before the override
    raises 'Unable to initialize backend'."""
    platform = os.environ.get("HAVATAR_PLATFORM")
    if platform:
        try:
            jax.config.update("jax_platforms", platform)
        except Exception:
            pass


def seed_everything(seed: int) -> jax.Array:
    apply_platform_override()
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def to_device_batch(batch, mesh=None):
    """Host batch -> device arrays (sharded over the mesh batch axis when a
    mesh is given)."""
    import jax.numpy as jnp

    keep = {"mv_rays", "gt_color", "gt_hr_img", "gt_lr_mask", "inv_head_T",
            "front_render_cond", "left_render_cond", "right_render_cond",
            "dataset_idx"}
    out = {}
    for k, v in batch.items():
        if k not in keep:
            out[k] = v
            continue
        arr = jnp.asarray(v)
        if mesh is not None:
            from havatar_tpu.parallel import batch_sharding

            arr = jax.device_put(arr, batch_sharding(mesh))
        out[k] = arr
    return out
