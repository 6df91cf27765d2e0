"""FaceVerse v3.1 3DMM as pure JAX functions.

Behavioral spec: reference data_preprocessing/core/FaceVerseModel_v3.py —
PCA shape/texture model (id 150, exp 52/171, tex 251), euler rotations
(:415-445), per-eye rotations (:384-411), SH illumination (:448-478), rigid
transform P·(scale·R) + t (:480-483), vertex normals via face accumulation
(:350-363), pinhole projection (:365-370), and the 610-d packed coefficient
vector layout of ``split_coeffs`` (:219-229).

The model asset (``faceverse_v3_1.npy``) is a download in the reference too
(README.md:27); ``load_model_dict`` applies the same load-time normalization
(y/z flip, 0.1 scale, +1 y-shift: :117-133).

TPU design: everything here is pure math — einsums and elementwise ops — so
the per-frame fitting loop jits into a single compiled Adam program and
``vmap`` batches frames (the reference fits one frame per Python loop
iteration on GPU; see fitting.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ID_DIMS = 150
TEX_DIMS = 251


class FaceVerseModel(NamedTuple):
    """Static model tensors (host-loaded once, device-resident)."""

    meanshape: jnp.ndarray      # [1, 3V]
    meantex: jnp.ndarray        # [1, 3V]
    id_base: jnp.ndarray        # [3V, 150]
    exp_base: jnp.ndarray       # [3V, E] (E = 52 or 171)
    tex_base: jnp.ndarray       # [3V, 251]
    tri: jnp.ndarray            # [F, 3] int32
    point_buf: jnp.ndarray      # [V, K] faces adjacent to each vertex
    kp_inds: jnp.ndarray        # [478] mediapipe keypoint vertex ids
    ver_inds: Tuple[int, int, int]   # eyeball vertex ranges
    uv: Optional[jnp.ndarray] = None

    @property
    def num_vertex(self) -> int:
        return self.meanshape.shape[1] // 3

    @property
    def exp_dims(self) -> int:
        return self.exp_base.shape[1]


def load_model_dict(model_dict: Dict[str, Any],
                    exp_base_52: Optional[np.ndarray] = None) -> FaceVerseModel:
    """Build the JAX model from the reference's .npy dict, applying the same
    load-time normalization (FaceVerseModel_v3.py:117-133)."""
    meanshape = np.asarray(model_dict["meanshape"], np.float32).reshape(-1, 3).copy()
    meanshape[:, [1, 2]] *= -1
    meanshape = meanshape * 0.1
    meanshape[:, 1] += 1

    id_base = np.asarray(model_dict["idBase"], np.float32).reshape(-1, 3, ID_DIMS).copy()
    id_base[:, [1, 2]] *= -1
    id_base = (id_base * 0.1).reshape(-1, ID_DIMS)

    if exp_base_52 is not None:
        exp_base = np.asarray(exp_base_52, np.float32).reshape(-1, 3, 52).copy()
    else:
        exp_base = np.asarray(model_dict["exBase"], np.float32).reshape(-1, 3, 171).copy()
    exp_base[:, [1, 2]] *= -1
    exp_base = (exp_base * 0.1).reshape(exp_base.shape[0] * 3, -1)

    return FaceVerseModel(
        meanshape=jnp.asarray(meanshape.reshape(1, -1)),
        meantex=jnp.asarray(np.asarray(model_dict["meantex"], np.float32).reshape(1, -1)),
        id_base=jnp.asarray(id_base),
        exp_base=jnp.asarray(exp_base),
        tex_base=jnp.asarray(np.asarray(model_dict["texBase"], np.float32)),
        tri=jnp.asarray(np.asarray(model_dict["tri"], np.int64).astype(np.int32)),
        point_buf=jnp.asarray(np.asarray(model_dict["point_buf"], np.int64).astype(np.int32)),
        kp_inds=jnp.asarray(np.asarray(model_dict["mediapipe_keypoints"]).reshape(-1).astype(np.int32)),
        ver_inds=tuple(int(v) for v in model_dict["ver_inds"]),
        uv=jnp.asarray(np.asarray(model_dict["uv"], np.float32)) if "uv" in model_dict else None,
    )


def load_model_file(path: str, exp_52_path: Optional[str] = None) -> FaceVerseModel:
    model_dict = np.load(path, allow_pickle=True).item()
    exp52 = np.load(exp_52_path) if exp_52_path else None
    return load_model_dict(model_dict, exp52)


# ---------------------------------------------------------------------------
# Coefficient packing (spec: split_coeffs, FaceVerseModel_v3.py:219-229)
# ---------------------------------------------------------------------------

def split_coeffs(coeffs: jnp.ndarray, exp_dims: int):
    """[B, 150+E+251+3+27+3+4(+1)] -> (id, exp, tex, angles, gamma, trans,
    eye, scale)."""
    all_dims = ID_DIMS + exp_dims + TEX_DIMS
    id_c = coeffs[:, :ID_DIMS]
    exp_c = coeffs[:, ID_DIMS:ID_DIMS + exp_dims]
    tex_c = coeffs[:, ID_DIMS + exp_dims:all_dims]
    angles = coeffs[:, all_dims:all_dims + 3]
    gamma = coeffs[:, all_dims + 3:all_dims + 30]
    trans = coeffs[:, all_dims + 30:all_dims + 33]
    eye = coeffs[:, all_dims + 33:all_dims + 37]
    if coeffs.shape[1] == all_dims + 38:
        scale = coeffs[:, -1:]
    else:
        scale = jnp.ones_like(coeffs[:, -1:])
    return id_c, exp_c, tex_c, angles, gamma, trans, eye, scale


def merge_coeffs(id_c, exp_c, tex_c, angles, gamma, trans, eye, scale):
    return jnp.concatenate([id_c, exp_c, tex_c, angles, gamma, trans, eye,
                            scale], axis=1)


# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------

def euler_rotation(angles: jnp.ndarray) -> jnp.ndarray:
    """[B, 3] XYZ euler angles -> [B, 3, 3] TRANSPOSED rotation (the
    reference returns Rz·Ry·Rx permuted (0,2,1) for right-multiplication,
    FaceVerseModel_v3.py:415-445)."""
    sx, sy, sz = (jnp.sin(angles[:, i]) for i in range(3))
    cx, cy, cz = (jnp.cos(angles[:, i]) for i in range(3))
    o, z = jnp.ones_like(sx), jnp.zeros_like(sx)
    rx = jnp.stack([o, z, z, z, cx, -sx, z, sx, cx], -1).reshape(-1, 3, 3)
    ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], -1).reshape(-1, 3, 3)
    rz = jnp.stack([cz, -sz, z, sz, cz, z, z, z, o], -1).reshape(-1, 3, 3)
    rot = rz @ ry @ rx
    return rot.transpose(0, 2, 1)


def eye_rotation(eye2: jnp.ndarray) -> jnp.ndarray:
    """[B, 2] (pitch, yaw) -> [B, 3, 3] transposed Ry·Rx
    (spec: compute_eye_rotation_matrix, :384-411)."""
    sx, sy = jnp.sin(eye2[:, 0]), jnp.sin(eye2[:, 1])
    cx, cy = jnp.cos(eye2[:, 0]), jnp.cos(eye2[:, 1])
    o, z = jnp.ones_like(sx), jnp.zeros_like(sx)
    rx = jnp.stack([o, z, z, z, cx, -sx, z, sx, cx], -1).reshape(-1, 3, 3)
    ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], -1).reshape(-1, 3, 3)
    return (ry @ rx).transpose(0, 2, 1)


def get_vs(model: FaceVerseModel, id_c, exp_c, eye_c: Optional[jnp.ndarray] = None):
    """PCA shape eval + optional eyeball rotations -> [B, V, 3]
    (spec: get_vs, :316-331)."""
    shape = (jnp.einsum("ij,aj->ai", model.id_base, id_c)
             + jnp.einsum("ij,aj->ai", model.exp_base, exp_c)
             + model.meanshape)
    vs = shape.reshape(id_c.shape[0], -1, 3)
    if eye_c is not None:
        v0, v1, v2 = model.ver_inds
        l_mat = eye_rotation(eye_c[:, :2])
        r_mat = eye_rotation(eye_c[:, 2:])
        l_mean = _eye_center(model, id_c, v0, v1)
        r_mean = _eye_center(model, id_c, v1, v2)
        l_part = jnp.matmul(vs[:, v0:v1] - l_mean, l_mat) + l_mean
        r_part = jnp.matmul(vs[:, v1:v2] - r_mean, r_mat) + r_mean
        vs = jnp.concatenate([vs[:, :v0], l_part, r_part, vs[:, v2:]], axis=1)
    return vs


def _eye_center(model, id_c, lo, hi):
    shape = jnp.einsum("ij,aj->ai", model.id_base, id_c) + model.meanshape
    eye = shape.reshape(id_c.shape[0], -1, 3)[:, lo:hi]
    eye = eye.at[:, :, 2].add(0.005)
    return jnp.mean(eye, axis=1, keepdims=True)


def get_color(model: FaceVerseModel, tex_c) -> jnp.ndarray:
    tex = jnp.einsum("ij,aj->ai", model.tex_base, tex_c) + model.meantex
    return tex.reshape(tex_c.shape[0], -1, 3)


def compute_normals(model: FaceVerseModel, vs: jnp.ndarray) -> jnp.ndarray:
    """Vertex normals by summing adjacent (unnormalized) face normals
    (spec: compute_norm, :350-363)."""
    tri = model.tri
    v1 = vs[:, tri[:, 0]]
    v2 = vs[:, tri[:, 1]]
    v3 = vs[:, tri[:, 2]]
    face_n = jnp.cross(v1 - v2, v2 - v3)
    vn = jnp.sum(face_n[:, model.point_buf], axis=2)
    return vn / (jnp.linalg.norm(vn, axis=2, keepdims=True) + 1e-9)


def rigid_transform(vs, rot, trans, scale):
    """P·(scale) · R + t (spec: rigid_transform, :480-483)."""
    return jnp.matmul(vs * scale[..., None], rot) + trans[:, None, :]


def sh_illumination(face_texture: jnp.ndarray, norm: jnp.ndarray,
                    gamma: jnp.ndarray) -> jnp.ndarray:
    """2nd-order SH lighting (spec: add_illumination, :448-478)."""
    B, V = face_texture.shape[:2]
    g = gamma.reshape(-1, 3, 9)
    g = g.at[:, :, 0].add(0.8)
    g = g.transpose(0, 2, 1)  # [B, 9, 3]

    a0, a1, a2 = np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0)
    c0 = 1 / np.sqrt(4 * np.pi)
    c1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
    c2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)
    d0 = 0.5 / np.sqrt(3.0)

    nx, ny, nz = norm[..., 0], norm[..., 1], norm[..., 2]
    H = jnp.stack([
        a0 * c0 * jnp.ones_like(nx),
        -a1 * c1 * ny,
        a1 * c1 * nz,
        -a1 * c1 * nx,
        a2 * c2 * nx * ny,
        -a2 * c2 * ny * nz,
        a2 * c2 * d0 * (3 * nz**2 - 1),
        -a2 * c2 * nx * nz,
        a2 * c2 * 0.5 * (nx**2 - ny**2),
    ], axis=-1)  # [B, V, 9]
    lighting = jnp.matmul(H, g)  # [B, V, 3]
    return face_texture * lighting


def project_points(vs: jnp.ndarray, fx, fy, cx, cy, cam_dist: float = 10.0):
    """Pinhole projection after the renderer's reverse_xz + camera shift
    (spec: ModelRenderer.project_vs / _get_reverse_xz, :604-617): the
    reference flips BOTH x and z before the camera-distance shift, so
    image x = cx - fx*x/(cam_dist - z). Oracle: test_faceverse_oracle.py."""
    v = vs * jnp.asarray([-1.0, 1.0, -1.0]) + jnp.asarray([0.0, 0.0, cam_dist])
    x = fx * v[..., 0] / v[..., 2] + cx
    y = fy * v[..., 1] / v[..., 2] + cy
    return jnp.stack([x, y], axis=-1)


def forward_landmarks(model: FaceVerseModel, coeffs: jnp.ndarray,
                      fx, fy, cx, cy, cam_dist: float = 10.0):
    """coeffs -> projected mediapipe landmarks [B, 478, 2] + world lms
    (the render=False fitting path, spec: forward, :293-297)."""
    id_c, exp_c, _, angles, _, trans, eye_c, scale = split_coeffs(
        coeffs, model.exp_dims)
    rot = euler_rotation(angles)
    vs = get_vs(model, id_c, exp_c, eye_c)
    vs_t = rigid_transform(vs, rot, trans, jnp.abs(scale))
    lms_t = vs_t[:, model.kp_inds]
    return project_points(lms_t, fx, fy, cx, cy, cam_dist), lms_t


def make_rot_mat(angles, translation, scale, no_scale: bool = False):
    """4x4 row-vector transform P·T (spec: make_rotMat, :372-381)."""
    rot = euler_rotation(angles)[0]
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(rot if no_scale else jnp.abs(scale[0]) * rot)
    T = T.at[3, :3].set(translation[0])
    return T
