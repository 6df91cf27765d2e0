"""FaceVerse 3DMM math oracle: preprocess/faceverse.py vs the reference's
own FaceVerseModel_v3 (data_preprocessing/core/FaceVerseModel_v3.py),
executed on CPU torch with a synthetic model dict.

The reference model's renderer-free paths (get_vs / get_vs_lms / get_color /
compute_norm / add_illumination / rigid_transform / project_vs / the
render=False landmark forward, FaceVerseModel_v3.py:266-331) are plain torch
math, so they run without pytorch3d or the FaceVerse asset download: pytorch3d
is stubbed at import (its names are only touched by the render=True path) and
the model dict is random with the production layout (171-dim exp, i.e. the
``expr_52=False`` branch that ``get_recon_model`` uses, core/__init__.py:8).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from havatar_tpu.preprocess import faceverse as fv

REF_DP = "/root/reference/data_preprocessing"

V = 560                      # synthetic vertex count
VER_INDS = (500, 530, 560)   # left-eye / right-eye vertex ranges
N_TRI = 300
EXP_DIMS = 171
ALL = fv.ID_DIMS + EXP_DIMS + fv.TEX_DIMS   # 572
COEFF_DIM = ALL + 38                        # + 3 ang, 27 gamma, 3 t, 4 eye, 1 s


def _stub_pytorch3d():
    if "pytorch3d" in sys.modules:
        return

    class _Stub:
        def __init__(self, *a, **k):
            pass

    p3 = types.ModuleType("pytorch3d")
    tr = types.ModuleType("pytorch3d.transforms")
    tr.axis_angle_to_matrix = None          # only the axis_angle=True path
    st = types.ModuleType("pytorch3d.structures")
    st.Meshes = _Stub
    rd = types.ModuleType("pytorch3d.renderer")
    rd.look_at_view_transform = (
        lambda *a, **k: (torch.eye(3)[None], torch.zeros(1, 3)))
    for name in ("PerspectiveCameras", "OrthographicCameras", "PointLights",
                 "RasterizationSettings", "MeshRasterizer", "SoftPhongShader",
                 "TexturesVertex"):
        setattr(rd, name, _Stub)

    class _MeshRenderer:
        def __init__(self, rasterizer=None, shader=None):
            pass

    rd.MeshRenderer = _MeshRenderer
    bl = types.ModuleType("pytorch3d.renderer.blending")
    bl.BlendParams = _Stub
    rd.blending = bl
    ls = types.ModuleType("pytorch3d.loss")
    ls.mesh_laplacian_smoothing = None
    sys.modules.update({
        "pytorch3d": p3, "pytorch3d.transforms": tr,
        "pytorch3d.structures": st, "pytorch3d.renderer": rd,
        "pytorch3d.renderer.blending": bl, "pytorch3d.loss": ls,
    })
    p3.transforms, p3.structures, p3.renderer, p3.loss = tr, st, rd, ls


def _model_dict(rng: np.random.RandomState) -> dict:
    # mediapipe keypoints with the production eyeball structure: landmark
    # slots 473:478 live on the left eyeball, 468:473 on the right (the
    # reference's get_vs_lms rotates exactly those slots,
    # FaceVerseModel_v3.py:329-330)
    kp = rng.randint(0, VER_INDS[0], size=478)
    kp[473:478] = rng.choice(
        np.arange(VER_INDS[0], VER_INDS[1]), size=5, replace=False)
    kp[468:473] = rng.choice(
        np.arange(VER_INDS[1], VER_INDS[2]), size=5, replace=False)
    tri = rng.randint(0, V, size=(N_TRI, 3)).astype(np.int64)
    return {
        "meanshape": rng.randn(V * 3).astype(np.float32),
        "meantex": rng.rand(V * 3).astype(np.float32),
        "idBase": (rng.randn(V * 3, fv.ID_DIMS) * 0.01).astype(np.float32),
        "exBase": (rng.randn(V * 3, EXP_DIMS) * 0.01).astype(np.float32),
        "texBase": (rng.randn(V * 3, fv.TEX_DIMS) * 0.01).astype(np.float32),
        "tri": tri,
        "tri_uv": tri.copy(),
        "uv": rng.rand(V, 2).astype(np.float32),
        "point_buf": rng.randint(0, N_TRI, size=(V, 8)).astype(np.int64),
        "mediapipe_keypoints": kp.astype(np.int64),
        "ver_inds": np.asarray(VER_INDS, np.int64),
        "tri_inds": np.asarray([0, N_TRI // 2], np.int64),
        "left_eye_exp": rng.rand(10).astype(np.float32),
        "right_eye_exp": rng.rand(10).astype(np.float32),
    }


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    """(reference torch model, our JAX model, the shared model dict)."""
    _stub_pytorch3d()
    if REF_DP not in sys.path:
        sys.path.insert(0, REF_DP)
    import importlib

    # core/__init__.py rebinds the name FaceVerseModel_v3 to the CLASS;
    # import the submodule explicitly
    ref_mod = importlib.import_module("core.FaceVerseModel_v3")

    rng = np.random.RandomState(0)
    md = _model_dict(rng)

    # the constructor np.load()s a relative metamodel path for the vertex
    # mask (FaceVerseModel_v3.py:138) — provide it in a scratch cwd
    tmp = tmp_path_factory.mktemp("fv_assets")
    (tmp / "metamodel" / "v3").mkdir(parents=True)
    np.save(tmp / "metamodel" / "v3" / "v31_face_mask_new.npy",
            np.zeros(V, np.float32))
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        ref = ref_mod.FaceVerseModel(dict(md), batch_size=1, device="cpu",
                                     expr_52=False)
    finally:
        os.chdir(cwd)
    ours = fv.load_model_dict(md)
    assert ours.exp_dims == EXP_DIMS == ref.exp_dims
    return ref, ours, md


def _coeffs(seed, scale_col=True):
    rng = np.random.RandomState(seed)
    c = (rng.randn(1, COEFF_DIM) * 0.3).astype(np.float32)
    if not scale_col:
        c = c[:, :-1]
    else:
        c[:, -1] = 1.0 + 0.1 * rng.randn()
    return c


def test_split_coeffs_layout(models):
    ref, ours, _ = models
    c = _coeffs(1)
    got = fv.split_coeffs(jnp.asarray(c), EXP_DIMS)
    want = ref.split_coeffs(torch.from_numpy(c))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w.numpy())


def test_rotation_matrices(models):
    ref, _, _ = models
    ang = np.asarray([[0.3, -0.7, 1.2]], np.float32)
    np.testing.assert_allclose(
        np.asarray(fv.euler_rotation(jnp.asarray(ang))),
        ref.compute_rotation_matrix(torch.from_numpy(ang)).numpy(),
        atol=1e-6)
    eye = np.asarray([[0.2, -0.4]], np.float32)
    np.testing.assert_allclose(
        np.asarray(fv.eye_rotation(jnp.asarray(eye))),
        ref.compute_eye_rotation_matrix(torch.from_numpy(eye)).numpy(),
        atol=1e-6)


def test_get_vs_with_eyeballs(models):
    ref, ours, _ = models
    c = _coeffs(2)
    id_t = torch.from_numpy(c[:, :fv.ID_DIMS])
    exp_t = torch.from_numpy(c[:, fv.ID_DIMS:fv.ID_DIMS + EXP_DIMS])
    eye_t = torch.from_numpy(c[:, ALL + 33:ALL + 37])
    l_mat = ref.compute_eye_rotation_matrix(eye_t[:, :2])
    r_mat = ref.compute_eye_rotation_matrix(eye_t[:, 2:])
    l_mean = ref.get_l_eye_center(id_t)
    r_mean = ref.get_r_eye_center(id_t)
    want = ref.get_vs(id_t, exp_t, l_mat, r_mat, l_mean, r_mean).numpy()
    got = fv.get_vs(ours, jnp.asarray(np.asarray(id_t)),
                    jnp.asarray(np.asarray(exp_t)),
                    jnp.asarray(np.asarray(eye_t)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_color_normals_illumination(models):
    ref, ours, _ = models
    c = _coeffs(3)
    tex_t = torch.from_numpy(c[:, fv.ID_DIMS + EXP_DIMS:ALL])
    gamma_t = torch.from_numpy(c[:, ALL + 3:ALL + 30])
    want_tex = ref.get_color(tex_t).numpy()
    got_tex = fv.get_color(ours, jnp.asarray(np.asarray(tex_t)))
    np.testing.assert_allclose(np.asarray(got_tex), want_tex, atol=2e-5)

    id_t = torch.from_numpy(c[:, :fv.ID_DIMS])
    exp_t = torch.from_numpy(c[:, fv.ID_DIMS:fv.ID_DIMS + EXP_DIMS])
    vs_t = ref.get_vs(id_t, exp_t)
    want_n = ref.compute_norm(vs_t, ref.tri, ref.point_buf).numpy()
    got_n = fv.compute_normals(ours, jnp.asarray(vs_t.numpy()))
    np.testing.assert_allclose(np.asarray(got_n), want_n, atol=1e-5)

    want_col = ref.add_illumination(
        torch.from_numpy(want_tex), torch.from_numpy(want_n), gamma_t).numpy()
    got_col = fv.sh_illumination(jnp.asarray(want_tex), jnp.asarray(want_n),
                                 jnp.asarray(np.asarray(gamma_t)))
    np.testing.assert_allclose(np.asarray(got_col), want_col,
                               atol=1e-5, rtol=1e-5)


def test_rigid_transform_and_projection(models):
    ref, ours, _ = models
    rng = np.random.RandomState(4)
    vs = rng.randn(1, 64, 3).astype(np.float32)
    rot = ref.compute_rotation_matrix(
        torch.from_numpy(np.asarray([[0.1, 0.5, -0.2]], np.float32)))
    trans = np.asarray([[0.2, -0.1, 0.3]], np.float32)
    scale = np.asarray([[1.07]], np.float32)
    want = ref.rigid_transform(torch.from_numpy(vs), rot,
                               torch.from_numpy(trans),
                               torch.from_numpy(scale)).numpy()
    got = fv.rigid_transform(jnp.asarray(vs), jnp.asarray(rot.numpy()),
                             jnp.asarray(trans), jnp.asarray(scale))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)

    # pinhole projection: the production intrinsics (fit_video.py:31-33)
    # through the reference renderer's reverse_xz + cam-shift chain
    # (FaceVerseModel_v3.py:609-617)
    want_p = ref.renderer.project_vs(torch.from_numpy(want)).numpy()
    fx = fy = 1315.0
    cx = cy = 128.0      # ModelRenderer default: img_size 256 // 2
    got_p = fv.project_points(jnp.asarray(want), fx, fy, cx, cy,
                              cam_dist=10.0)
    np.testing.assert_allclose(np.asarray(got_p), want_p, atol=1e-3)


@pytest.mark.parametrize("with_scale_col", [True, False])
def test_forward_landmarks_full(models, with_scale_col):
    """The fitting-path forward (render=False): packed coeffs -> projected
    mediapipe landmarks + world landmarks (FaceVerseModel_v3.py:309-314)."""
    ref, ours, _ = models
    c = _coeffs(5, scale_col=with_scale_col)
    out = ref.forward(torch.from_numpy(c), render=False)
    got_proj, got_t = fv.forward_landmarks(
        ours, jnp.asarray(c), 1315.0, 1315.0, 128.0, 128.0, cam_dist=10.0)
    np.testing.assert_allclose(np.asarray(got_t), out["lms_t"].numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_proj),
                               out["lms_proj"].numpy(), atol=2e-3)


def test_make_rot_mat(models):
    ref, _, _ = models
    ang = torch.from_numpy(np.asarray([[0.3, -0.2, 0.9]], np.float32))
    trans = torch.from_numpy(np.asarray([[0.5, 0.1, -0.4]], np.float32))
    scale = torch.from_numpy(np.asarray([[1.2]], np.float32))
    want = ref.make_rotMat(angle=ang, translation=trans, scale=scale).numpy()
    got = fv.make_rot_mat(jnp.asarray(ang.numpy()),
                          jnp.asarray(trans.numpy()),
                          jnp.asarray(scale.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    want_ns = ref.make_rotMat(angle=ang, translation=trans, scale=scale,
                              no_scale=True).numpy()
    got_ns = fv.make_rot_mat(jnp.asarray(ang.numpy()),
                             jnp.asarray(trans.numpy()),
                             jnp.asarray(scale.numpy()), no_scale=True)
    np.testing.assert_allclose(np.asarray(got_ns), want_ns, atol=1e-6)
