"""Per-frame FaceVerse coefficient fitting — a jitted optax Adam loop.

Behavioral spec: data_preprocessing/fit_video.py:185-235 — Adam over
(exp, eye, rot, trans [, id, scale]) with lr 1e-1/β(0.8,0.95) on frame 0 and
1e-2/β(0.5,0.9) afterwards (switching to lr 1e-3 after 60% of iterations on
non-first frames), loss = eye-weighted mediapipe landmark loss
(core/losses.py:16-23, weights core/utils.py:49-72) + id/exp L2 regs +
rot/trans smoothness vs the previous frame; negative expressions clamped to 0
after each step (:232-233).

TPU design: the reference steps Python-side per iteration; here the whole
N-iteration fit is ONE `lax.scan` inside jit (the landmark forward is pure
math), and `jax.vmap` over frames gives the batch-fitting mode of
fit_videos_mp.py for dataset-scale preprocessing.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from havatar_tpu.preprocess import faceverse as fv

# mediapipe landmark weighting (spec: core/utils.py:49-72)
_LIPS = [61, 146, 91, 181, 84, 17, 314, 405, 321, 375, 61, 185, 40, 39, 37, 0,
         267, 269, 270, 409, 78, 95, 88, 178, 87, 14, 317, 402, 318, 324, 78,
         191, 80, 81, 82, 13, 312, 311, 310, 415]
_L_EYE = [263, 249, 390, 373, 374, 380, 381, 382, 263, 466, 388, 387, 386,
          385, 384, 398]
_L_BROW = [276, 283, 282, 295, 300, 293, 334, 296]
_R_EYE = [33, 7, 163, 144, 145, 153, 154, 155, 33, 246, 161, 160, 159, 158,
          157, 173]
_R_BROW = [46, 53, 52, 65, 70, 63, 105, 66]


def mediapipe_lm_weights() -> np.ndarray:
    w = np.ones(478, np.float32)
    w[_LIPS] = 5
    w[_L_EYE] = 50
    w[_R_EYE] = 50
    w[_L_BROW] = 5
    w[_R_BROW] = 5
    w[468:] = 5
    return w / w.sum()


def lm_loss(pred_lms, gt_lms, weights, img_size: int):
    d = jnp.sum(jnp.square(pred_lms / img_size - gt_lms / img_size), axis=-1)
    return jnp.mean(jnp.sum(d * weights.reshape(1, -1), axis=1))


class FitConfig(NamedTuple):
    img_size: int = 512
    lm_loss_w: float = 1e3
    id_reg_w: float = 3e-3
    exp_reg_w: float = 1e-3
    rt_reg_w: float = 0.1
    cam_dist: float = 10.0


class FitState(NamedTuple):
    """Per-video running coefficients (the reference keeps them as torch
    tensors on the model object)."""

    id_c: jnp.ndarray      # [1, 150]
    exp_c: jnp.ndarray     # [1, E]
    tex_c: jnp.ndarray     # [1, 251]
    rot: jnp.ndarray       # [1, 3]
    gamma: jnp.ndarray     # [1, 27]
    trans: jnp.ndarray     # [1, 3]
    eye: jnp.ndarray       # [1, 4]
    scale: jnp.ndarray     # [1, 1]


def init_fit_state(exp_dims: int) -> FitState:
    return FitState(
        id_c=jnp.zeros((1, fv.ID_DIMS)), exp_c=jnp.zeros((1, exp_dims)),
        tex_c=jnp.zeros((1, fv.TEX_DIMS)), rot=jnp.zeros((1, 3)),
        gamma=jnp.zeros((1, 27)), trans=jnp.zeros((1, 3)),
        eye=jnp.zeros((1, 4)), scale=jnp.ones((1, 1)))


def pack(state: FitState) -> jnp.ndarray:
    return fv.merge_coeffs(state.id_c, state.exp_c, state.tex_c, state.rot,
                           state.gamma, state.trans, state.eye, state.scale)


def make_fit_frame(model: fv.FaceVerseModel, intr4, cfg: FitConfig,
                   num_iters: int, first_frame: bool,
                   fit_id: bool, fit_scale: bool = False):
    """Builds a jitted fit(state, gt_lms [478,2], prev_rt) -> (state, loss).

    ``first_frame`` selects the reference's frame-0 optimizer settings; the
    trainables are (exp, eye, rot, trans) plus (id[, scale]) when fit_id.
    """
    fx, fy, cx, cy = [float(v) for v in intr4]
    weights = jnp.asarray(mediapipe_lm_weights())

    lr0, b1_0, b2_0 = (1e-1, 0.8, 0.95) if first_frame else (1e-2, 0.5, 0.9)
    fine_start = int(num_iters * 0.6)

    opt = optax.adam(lr0, b1=b1_0, b2=b2_0)
    opt_fine = optax.adam(1e-3, b1=0.5, b2=0.9)

    def trainables(state: FitState):
        t = {"exp_c": state.exp_c, "eye": state.eye, "rot": state.rot,
             "trans": state.trans}
        if fit_id:
            t["id_c"] = state.id_c
            if fit_scale:
                t["scale"] = state.scale
        return t

    def with_trainables(state: FitState, t) -> FitState:
        return state._replace(**t)

    def loss_fn(t, state, gt_lms, prev_rot, prev_trans):
        s = with_trainables(state, t)
        coeffs = pack(s)
        lms_proj, _ = fv.forward_landmarks(model, coeffs, fx, fy, cx, cy,
                                           cfg.cam_dist)
        loss = cfg.lm_loss_w * lm_loss(lms_proj, gt_lms[None], weights,
                                       cfg.img_size)
        loss = loss + cfg.exp_reg_w * jnp.sum(jnp.square(s.exp_c))
        loss = loss + cfg.id_reg_w * jnp.sum(jnp.square(s.id_c))
        if not first_frame:
            loss = loss + cfg.rt_reg_w * (
                jnp.sum(jnp.square(s.rot - prev_rot))
                + jnp.sum(jnp.square(s.trans - prev_trans)))
        return loss

    @jax.jit
    def fit(state: FitState, gt_lms, prev_rot, prev_trans):
        t0 = trainables(state)
        opt_state = opt.init(t0)
        opt_fine_state = opt_fine.init(t0)

        def step(carry, i):
            t, os, ofs = carry
            loss, grads = jax.value_and_grad(loss_fn)(t, state, gt_lms,
                                                      prev_rot, prev_trans)
            use_fine = jnp.logical_and(not first_frame, i > fine_start)

            up_c, os_new = opt.update(grads, os, t)
            up_f, ofs_new = opt_fine.update(grads, ofs, t)
            ups = jax.tree_util.tree_map(
                lambda a, b: jnp.where(use_fine, b, a), up_c, up_f)
            os = jax.tree_util.tree_map(
                lambda a, b: jnp.where(use_fine, a, b), os, os_new)
            ofs = jax.tree_util.tree_map(
                lambda a, b: jnp.where(use_fine, b, a), ofs, ofs_new)
            t = optax.apply_updates(t, ups)
            # clamp negative expressions (spec: fit_video.py:232-233)
            t = dict(t)
            t["exp_c"] = jnp.maximum(t["exp_c"], 0.0)
            return (t, os, ofs), loss

        (t, _, _), losses = jax.lax.scan(
            step, (t0, opt_state, opt_fine_state), jnp.arange(num_iters))
        return with_trainables(state, t), losses[-1]

    return fit


def head_transform_matrix(state: FitState, no_scale: bool = True) -> jnp.ndarray:
    """4x4 head transform P·T of the fitted frame (spec: make_rotMat usage
    for metaFace_extr, fit_video.py:269-292)."""
    return fv.make_rot_mat(state.rot, state.trans, state.scale,
                           no_scale=no_scale)
