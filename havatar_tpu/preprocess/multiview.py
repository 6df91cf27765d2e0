"""Calibrated multi-view FaceVerse fitting (capability parity with the
reference's ``data_preprocessing/fit_video_mv.py``; SURVEY.md §2.5).

Pieces: intrinsic adjustment for pad/crop/resize (spec: make_calib,
fit_video_mv.py:627-669), per-view camera transforms applied inside the
coefficient forward (spec: FaceVerseModel.forward's camT path,
FaceVerseModel_v3.py:266-276), and a joint landmark loss summed over valid
views. The fitting loop is jitted with a static valid-view mask folded in
as weights (no data-dependent control flow).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from havatar_tpu.preprocess import faceverse as fv
from havatar_tpu.preprocess import fitting


def adjust_intrinsic(cam_K: np.ndarray, mode: str, param) -> np.ndarray:
    """'resize' (fx, fy scale), 'crop' (left, top), 'padding' (left, top)
    (spec: fit_video_mv.py:628-643)."""
    K = cam_K.copy()
    if mode == "resize":
        K[0] *= param[0]
        K[1] *= param[1]
    elif mode == "crop":
        K[0, 2] -= param[0]
        K[1, 2] -= param[1]
    elif mode == "padding":
        K[0, 2] += param[0]
        K[1, 2] += param[1]
    else:
        raise ValueError(mode)
    return K


def make_calib(calib_file: str, base_dir: str, crop_params: Dict,
               dst_resolution: int) -> Dict:
    """Re-derive per-camera intrinsics after the pad->crop->resize chain and
    write calib_{res}.json (spec: fit_video_mv.py:627-669)."""
    calib = json.loads(open(calib_file).read())
    out = {"img_res": dst_resolution, "intrinsics": {}}
    for cam, (top, left, resolution, pad) in crop_params.items():
        K = np.asarray(calib[cam]["K"], np.float32).reshape(3, 3)
        K = adjust_intrinsic(K, "padding", (pad, pad))
        K = adjust_intrinsic(K, "crop", (left, top))
        s = dst_resolution / resolution
        K = adjust_intrinsic(K, "resize", (s, s))
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(calib[cam]["R"], np.float32).reshape(3, 3)
        T[:3, 3:] = np.asarray(calib[cam]["T"], np.float32).reshape(3, 1)
        out["intrinsics"][cam] = {"cam_K": K.reshape(-1).tolist(),
                                  "cam_T": T.reshape(-1).tolist()}
    path = os.path.join(base_dir, f"calib_{dst_resolution}.json")
    with open(path, "w") as f:
        f.write(json.dumps(out, indent=4))
    return out


def forward_landmarks_view(model: fv.FaceVerseModel, coeffs, cam_T,
                           fx, fy, cx, cy, cam_dist: float = 10.0):
    """Landmark forward with an extra camera transform (spec: the camT branch
    of FaceVerseModel.forward, FaceVerseModel_v3.py:266-276: rotation
    composed right-multiplied, translation transformed + added)."""
    import jax.numpy as jnp

    id_c, exp_c, _, angles, _, trans, eye_c, scale = fv.split_coeffs(
        coeffs, model.exp_dims)
    rot = fv.euler_rotation(angles)
    rot2 = cam_T[:3, :3].T[None]
    trans2 = cam_T[:3, 3:].T[None]
    rot = jnp.matmul(rot, rot2)
    trans = jnp.matmul(trans[:, None, :], rot2)[:, 0] + trans2[:, 0]
    vs = fv.get_vs(model, id_c, exp_c, eye_c)
    vs_t = fv.rigid_transform(vs, rot, trans, jnp.abs(scale))
    lms_t = vs_t[:, model.kp_inds]
    return fv.project_points(lms_t, fx, fy, cx, cy, cam_dist)


def make_fit_frame_mv(model: fv.FaceVerseModel, cam_Ks: np.ndarray,
                      cam_Ts: np.ndarray, cfg: fitting.FitConfig,
                      num_iters: int, first_frame: bool, fit_id: bool,
                      fit_scale: bool = True):
    """Multi-view joint fit: loss averaged over valid views
    (spec: fit_video_mv.py's per-view loop == fit_video.py:205-213 with
    v_num normalization). ``valid`` is a [V] float mask at call time."""
    import jax
    import jax.numpy as jnp
    import optax

    V = cam_Ks.shape[0]
    weights = jnp.asarray(fitting.mediapipe_lm_weights())
    cam_Ks = jnp.asarray(cam_Ks)
    cam_Ts = jnp.asarray(cam_Ts)

    lr0, b1, b2 = (1e-1, 0.8, 0.95) if first_frame else (1e-2, 0.5, 0.9)
    opt = optax.adam(lr0, b1=b1, b2=b2)

    def trainables(state):
        t = {"exp_c": state.exp_c, "eye": state.eye, "rot": state.rot,
             "trans": state.trans}
        if fit_id:
            t["id_c"] = state.id_c
            if fit_scale:
                t["scale"] = state.scale
        return t

    def loss_fn(t, state, gt_lms, valid, prev_rot, prev_trans):
        s = state._replace(**t)
        coeffs = fitting.pack(s)
        total = 0.0
        for v in range(V):
            lms = forward_landmarks_view(
                model, coeffs, cam_Ts[v],
                cam_Ks[v, 0, 0], cam_Ks[v, 1, 1],
                cam_Ks[v, 0, 2], cam_Ks[v, 1, 2], cfg.cam_dist)
            total = total + valid[v] * cfg.lm_loss_w * fitting.lm_loss(
                lms, gt_lms[v][None], weights, cfg.img_size)
        total = total / jnp.maximum(jnp.sum(valid), 1.0)
        total = total + cfg.exp_reg_w * jnp.sum(jnp.square(s.exp_c))
        total = total + cfg.id_reg_w * jnp.sum(jnp.square(s.id_c))
        if not first_frame:
            total = total + cfg.rt_reg_w * (
                jnp.sum(jnp.square(s.rot - prev_rot))
                + jnp.sum(jnp.square(s.trans - prev_trans)))
        return total

    @jax.jit
    def fit(state, gt_lms, valid, prev_rot, prev_trans):
        t0 = trainables(state)
        opt_state = opt.init(t0)

        def step(carry, _):
            t, os = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                t, state, gt_lms, valid, prev_rot, prev_trans)
            ups, os = opt.update(grads, os, t)
            t = optax.apply_updates(t, ups)
            t = dict(t)
            t["exp_c"] = jnp.maximum(t["exp_c"], 0.0)
            return (t, os), loss

        (t, _), losses = jax.lax.scan(step, (t0, opt_state),
                                      jnp.arange(num_iters))
        return state._replace(**t), losses[-1]

    return fit
