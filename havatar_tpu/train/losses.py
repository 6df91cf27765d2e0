"""Training losses: NeRF reconstruction terms + GAN objectives.

Behavioral specs: stage-1 loss assembly (train_avatar.py:131-148 — coarse/fine
MSE + BCE mask on acc + latent reg + skin-weight TV + 0.05·patch-LPIPS),
GAN losses (utils/styleUnet_util.py:65-111 — logistic D loss, R1 penalty,
non-saturating G loss, path-length regularization) and ``mse2psnr``
(utils/training_util.py:24).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def mse2psnr(mse) -> jnp.ndarray:
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def binary_cross_entropy(pred: jnp.ndarray, target: jnp.ndarray,
                         clip: Tuple[float, float] = (1e-3, 1.0 - 1e-3)) -> jnp.ndarray:
    p = jnp.clip(pred, *clip)
    return -jnp.mean(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))


def skin_weight_tv_loss(weight_volume: jnp.ndarray) -> jnp.ndarray:
    """Mean |center - 6-neighborhood| total-variation on the head-follow
    weight channel (spec: train_avatar.py:124-129).

    weight_volume: [D, H, W] (channel 1 of the canonical volume).
    """
    v = weight_volume
    core = v[1:-1, 1:-1, 1:-1]
    neighbors = (
        v[:-2, 1:-1, 1:-1], v[2:, 1:-1, 1:-1],
        v[1:-1, 2:, 1:-1], v[1:-1, :-2, 1:-1],
        v[1:-1, 1:-1, 2:], v[1:-1, 1:-1, :-2],
    )
    grad = sum(jnp.abs(core - n) for n in neighbors) / 6.0
    return jnp.mean(grad)


# ---- GAN objectives (spec: utils/styleUnet_util.py:65-111) ---------------

def d_logistic_loss(real_pred: jnp.ndarray, fake_pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.softplus(-fake_pred))


def d_r1_penalty(d_apply, d_params, real_img: jnp.ndarray) -> jnp.ndarray:
    """R1 = E[||∇_x D(x)||²]. The reference needs conv2d_gradfix for this
    second-order gradient (utils/styleUnet_util.py:72-79); `jax.grad`
    composes natively."""
    def score(img):
        return jnp.sum(d_apply(d_params, img))

    grads = jax.grad(score)(real_img)
    return jnp.sum(jnp.square(grads)) / real_img.shape[0]


def g_path_regularize(fake_img: jnp.ndarray, latent_grads: jnp.ndarray,
                      mean_path_length: jnp.ndarray,
                      decay: float = 0.01):
    """Path-length regularization (spec: utils/styleUnet_util.py:88-110).
    ``latent_grads`` are d(sum noise*img)/d(latents). NOTE: disabled in the
    reference training loop (`if False`, train_avatarHD.py:285); provided for
    capability parity."""
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(latent_grads), axis=2), axis=1))
    new_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean(jnp.square(path_lengths - new_mean))
    return penalty, jax.lax.stop_gradient(new_mean), path_lengths


def gan_loss_weight(step: jnp.ndarray) -> jnp.ndarray:
    """Ramped adversarial weight min(1e-3 · 1.1^(i//500), 0.1)
    (spec: train_avatarHD.py:205-206)."""
    return jnp.minimum(1e-3 * 1.1 ** (step // 500), 0.1)


def stage1_lr(step, base_lr: float, decay_factor: float = 0.1,
              decay_kilosteps: int = 250, floor: float = 5e-5):
    """Exponential decay with floor (spec: train_avatar.py:154-158)."""
    lr = base_lr * decay_factor ** (step / (decay_kilosteps * 1000.0))
    return jnp.maximum(lr, floor)


def downsample_bilinear(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) equivalent
    for NHWC images (used for the stage-2 low-res RGB target,
    train_avatarHD.py:202-204)."""
    B, H, W, C = img.shape
    # align_corners=True sampling positions
    ys = jnp.linspace(0.0, H - 1.0, size)
    xs = jnp.linspace(0.0, W - 1.0, size)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: img[:, yi][:, :, xi]
    out = (g(y0, x0) * (1 - wy) * (1 - wx) + g(y0, x1) * (1 - wy) * wx
           + g(y1, x0) * wy * (1 - wx) + g(y1, x1) * wy * wx)
    return out
