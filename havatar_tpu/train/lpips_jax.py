"""LPIPS perceptual loss (VGG16 backbone), TPU-native.

Behavioral spec: the reference uses the ``lpips`` pip package
(train_avatar.py:24-29, 54-57): inputs scaled to [-1, 1], VGG16 features at
relu1_2/2_2/3_3/4_3/5_3, unit-normalized per channel, squared difference
through learned 1x1 "lin" heads, spatially averaged and summed over layers.

Pretrained weights are not bundled (zero-egress build environment). Use
``convert_torch_lpips`` to import weights from a torchvision VGG16
state_dict + lpips lin weights; until then, callers should gate the
perceptual term (the trainers do this automatically).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# VGG16 conv plan: (out_channels, layers_per_block) with maxpool between blocks
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# LPIPS input normalization (the lpips package's scaling layer)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def init_lpips_params(rng: jax.Array) -> Dict[str, Any]:
    """Random-init LPIPS params (structure only — see module docstring)."""
    params: Dict[str, Any] = {"conv": {}, "lin": {}}
    in_ch = 3
    keys = jax.random.split(rng, 32)
    k = 0
    for bi, (out_ch, n) in enumerate(_VGG_PLAN):
        for li in range(n):
            w = jax.random.normal(keys[k], (3, 3, in_ch, out_ch)) * 0.05
            b = jnp.zeros((out_ch,))
            params["conv"][f"b{bi}_c{li}"] = {"weight": w, "bias": b}
            in_ch = out_ch
            k += 1
        params["lin"][f"l{bi}"] = jnp.abs(
            jax.random.normal(keys[k], (1, 1, out_ch, 1))) * 0.01
        k += 1
    return params


def _vgg_features(params: Dict[str, Any], x: jnp.ndarray) -> List[jnp.ndarray]:
    feats = []
    h = x
    for bi, (out_ch, n) in enumerate(_VGG_PLAN):
        for li in range(n):
            p = params["conv"][f"b{bi}_c{li}"]
            h = lax.conv_general_dilated(
                h, p["weight"], (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]
            h = jax.nn.relu(h)
        feats.append(h)
        if bi < len(_VGG_PLAN) - 1:
            h = lax.reduce_window(h, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
    return feats


def lpips(params: Dict[str, Any], img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """img0/img1: [B, H, W, 3] in [-1, 1]. Returns scalar mean distance."""
    def norm_input(x):
        return (x - _SHIFT) / _SCALE

    f0 = _vgg_features(params, norm_input(img0))
    f1 = _vgg_features(params, norm_input(img1))
    total = 0.0
    for bi, (a, b) in enumerate(zip(f0, f1)):
        a = a * lax.rsqrt(jnp.sum(jnp.square(a), -1, keepdims=True) + 1e-10)
        b = b * lax.rsqrt(jnp.sum(jnp.square(b), -1, keepdims=True) + 1e-10)
        d = jnp.square(a - b)
        w = params["lin"][f"l{bi}"]
        d = lax.conv_general_dilated(d, w, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(d, axis=(1, 2, 3))
    return jnp.mean(total)


def lpips_loss(params, img0_01: jnp.ndarray, img1_01: jnp.ndarray) -> jnp.ndarray:
    """[0,1]-ranged NHWC images (spec: train_avatar.py:24-29 scales by 2x-1)."""
    return lpips(params, img0_01 * 2.0 - 1.0, img1_01 * 2.0 - 1.0)


def save_lpips_file(params: Dict[str, Any], path: str) -> None:
    np.savez(path, params=np.asarray(
        jax.tree_util.tree_map(lambda x: np.asarray(x), params),
        dtype=object))


def load_lpips_file(path: str) -> Optional[Dict[str, Any]]:
    """Load converted LPIPS weights (.npz written by save_lpips_file), or
    None if the file is absent — callers gate the perceptual term on this."""
    if not path or not os.path.exists(path):
        return None
    data = np.load(path, allow_pickle=True)
    return jax.tree_util.tree_map(jnp.asarray, data["params"].item())


def convert_torch_lpips(vgg_state_dict, lin_state_dict) -> Dict[str, Any]:
    """torchvision vgg16.features + lpips lin heads -> params pytree.

    vgg16.features indices: convs at [0,2, 5,7, 10,12,14, 17,19,21, 24,26,28].
    lpips lin weights: ``lin{i}.model.1.weight`` [1, C, 1, 1].
    """
    idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    params: Dict[str, Any] = {"conv": {}, "lin": {}}

    def npy(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    for bi, block in enumerate(idx):
        for li, layer in enumerate(block):
            w = npy(vgg_state_dict[f"features.{layer}.weight"]).transpose(2, 3, 1, 0)
            b = npy(vgg_state_dict[f"features.{layer}.bias"])
            params["conv"][f"b{bi}_c{li}"] = {"weight": jnp.asarray(w),
                                              "bias": jnp.asarray(b)}
        lw = npy(lin_state_dict[f"lin{bi}.model.1.weight"])  # [1, C, 1, 1]
        params["lin"][f"l{bi}"] = jnp.asarray(lw.transpose(2, 3, 1, 0))
    return params
