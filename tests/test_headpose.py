"""PnP head-pose stage (preprocess/headpose.py) vs the reference tracker's
own methods (executed on stub objects — the reference Tracker itself needs
onnxruntime sessions, but estimate_depth / normalize_pts3d / adjust_3d are
plain math over attributes)."""

import copy
import re
import sys
import types

import numpy as np
import pytest

from havatar_tpu.preprocess.headpose import (
    CONTOUR_PTS,
    FACE_3D,
    HeadPoseEstimator,
    matrix_to_quaternion,
)

REF_TRACKER = "/root/reference/data_preprocessing/OpenSeeFace/tracker.py"


@pytest.fixture(scope="module")
def ref_mod():
    sys.modules.setdefault("onnxruntime", types.ModuleType("onnxruntime"))
    path = "/root/reference/data_preprocessing"
    if path not in sys.path:
        sys.path.insert(0, path)
    if not hasattr(np, "float"):          # removed alias the reference uses
        np.float = float
    import OpenSeeFace.tracker as ref

    return ref


@pytest.fixture()
def legacy_solvepnp(monkeypatch):
    """Restore the OLD cv2 useExtrinsicGuess contract the reference depends
    on: rvec/tvec come back as flat (3,) arrays (modern cv2 returns (3, 1),
    which crashes the reference's own pupil-lifting broadcast,
    tracker.py:833)."""
    import cv2

    orig = cv2.solvePnP

    def wrapped(*args, **kw):
        ok, r, t = orig(*args, **kw)
        return ok, np.asarray(r).reshape(3), np.asarray(t).reshape(3)

    monkeypatch.setattr(cv2, "solvePnP", wrapped)
    return wrapped


def test_face_3d_table_matches_reference_source():
    """The transcribed canonical face equals the literal in the reference
    source (read as text; the class can't be constructed without onnx)."""
    src = open(REF_TRACKER).read()
    m = re.search(r"self\.face_3d = np\.array\(\[(.*?)\], np\.float32\)",
                  src, re.S)
    assert m
    body = re.sub(r"#[^\n]*", "", m.group(1))
    rows = eval(f"[{body}]")  # noqa: S307 - literal list of floats
    want = np.asarray(rows, np.float32)
    np.testing.assert_array_equal(FACE_3D, want)


def test_matrix_to_quaternion_matches_reference(ref_mod):
    import cv2

    rng = np.random.RandomState(0)
    for _ in range(20):
        rvec = rng.randn(3)
        m, _ = cv2.Rodrigues(rvec)
        np.testing.assert_allclose(matrix_to_quaternion(m),
                                   ref_mod.matrix_to_quaternion(m),
                                   atol=1e-12)


def _synth_observation(rng, width=224, height=224):
    """Project the canonical face through a known pose to make consistent
    landmark observations."""
    import cv2

    rvec = np.array([0.1, -0.2, 0.05])
    tvec = np.array([0.05, -0.1, 2.5])
    camera = np.array([[width, 0, width / 2], [0, width, height / 2],
                       [0, 0, 1]], np.float64)
    proj, _ = cv2.projectPoints(FACE_3D[:66].astype(np.float64), rvec, tvec,
                                camera, np.zeros((4, 1)))
    lms = np.zeros((66, 3))
    lms[:, 0:2] = proj[:, 0, :] + rng.randn(66, 2) * 0.5
    lms[:, 2] = 0.6 + 0.3 * rng.rand(66)
    eye_state = np.array([[1.0, lms[37, 0], lms[37, 1], 0.8],
                          [1.0, lms[43, 0], lms[43, 1], 0.8]])
    return lms, eye_state


class _Stub:
    pass


def _ref_tracker_stub(width=224, height=224):
    t = _Stub()
    t.camera = np.array([[width, 0, width / 2], [0, width, height / 2],
                         [0, 0, 1]], np.float32)
    t.inverse_camera = np.linalg.inv(t.camera)
    t.dist_coeffs = np.zeros((4, 1))
    t.face_3d = FACE_3D.copy()
    t.silent = True
    t.model_type = 3
    t.static_model = False
    return t


def _ref_face_stub(tracker):
    f = _Stub()
    f.contour_pts = list(CONTOUR_PTS)
    f.face_3d = FACE_3D.copy()
    f.contour = f.face_3d[f.contour_pts].astype(np.float64)
    f.rotation = None
    f.translation = np.array([0.0, 0.0, 0.0], np.float32)
    f.fail_count = 0
    f.update_counts = np.zeros((66, 2))
    f.update_count_delta = 75.0
    f.update_count_max = 7500.0
    f.limit_3d_adjustment = True
    f.tracker = tracker
    f.base_scale_v = FACE_3D[27:30, 1] - FACE_3D[28:31, 1]
    f.base_scale_h = np.abs(FACE_3D[[0, 36, 42], 0]
                            - FACE_3D[[16, 39, 45], 0])

    def update_contour():
        f.contour = np.array(f.face_3d[f.contour_pts], dtype=np.float64)

    f.update_contour = update_contour
    f.normalize_pts3d = lambda p: ref_mod_normalize(f, p)
    return f


def ref_mod_normalize(f, p):
    import OpenSeeFace.tracker as ref

    return ref.FaceInfo.normalize_pts3d(f, p)


def test_estimate_matches_reference_estimate_depth(ref_mod, legacy_solvepnp):
    rng = np.random.RandomState(1)
    lms, eye_state = _synth_observation(rng)

    ours = HeadPoseEstimator(224, 224)
    ok, quat, euler, err, pts_3d, lms70 = ours.estimate(lms, eye_state)
    assert ok

    t = _ref_tracker_stub()
    f = _ref_face_stub(t)
    f.lms = lms
    f.eye_state = eye_state
    ok_r, quat_r, euler_r, err_r, pts_r, lms_r = ref_mod.Tracker.estimate_depth(
        t, f)
    assert ok_r
    np.testing.assert_allclose(quat, quat_r, atol=1e-7)
    np.testing.assert_allclose(np.asarray(euler), np.asarray(euler_r),
                               atol=1e-6)
    np.testing.assert_allclose(err, err_r, atol=1e-8)
    np.testing.assert_allclose(pts_3d, pts_r, atol=1e-5)
    np.testing.assert_allclose(ours.rotation, f.rotation, atol=1e-8)
    np.testing.assert_allclose(ours.translation, f.translation, atol=1e-8)

    # second frame reuses the previous pose as the PnP guess
    lms2 = lms + rng.randn(66, 3) * np.array([1.0, 1.0, 0.0])
    ok2, _, _, _, pts2, _ = ours.estimate(lms2, eye_state)
    f.lms = lms2
    ok2r, _, _, _, pts2r, _ = ref_mod.Tracker.estimate_depth(t, f)
    assert ok2 == ok2r
    np.testing.assert_allclose(pts2, pts2r, atol=1e-5)

    # normalize_pts3d parity (FaceInfo method on the stub)
    want_norm = ref_mod.FaceInfo.normalize_pts3d(f, pts2r.copy())
    got_norm = ours.normalize_pts3d(pts2)
    np.testing.assert_allclose(got_norm, want_norm, atol=1e-5)


def test_adjust_matches_reference_adjust_3d(ref_mod, legacy_solvepnp):
    rng = np.random.RandomState(2)
    lms, eye_state = _synth_observation(rng)

    ours = HeadPoseEstimator(224, 224)
    ok, quat, euler, err, pts_3d, _ = ours.estimate(lms, eye_state)
    assert ok

    t = _ref_tracker_stub()
    f = _ref_face_stub(t)
    f.lms = lms
    f.eye_state = eye_state
    ref_mod.Tracker.estimate_depth(t, f)

    # pose gates: euler[0] outside (-165, 145) and euler[1] in (-10, 20)
    forced_euler = np.array([179.0, 0.0, 90.0])
    f.conf = 0.9
    f.pnp_error = float(err)
    f.euler = forced_euler
    f.pts_3d = pts_3d.copy()
    t.feature_level = 0     # skip the features part of the ref method

    np.random.seed(42)
    ref_mod.FaceInfo.adjust_3d(f)
    want_face = f.face_3d.copy()

    np.random.seed(42)
    ours.adjust(lms, 0.9, forced_euler, float(err))
    np.testing.assert_allclose(ours.face_3d, want_face, atol=1e-7)
    assert not np.allclose(ours.face_3d, FACE_3D)   # it actually adapted
    np.testing.assert_array_equal(ours.update_counts, f.update_counts)


def test_tracker_predict_with_pose():
    """JaxTracker(estimate_pose=True) returns pose fields and 3D-normalized
    features + eye_blink."""
    from havatar_tpu.preprocess.tracker import JaxTracker

    import cv2

    rvec = np.array([0.05, 0.1, 0.0])
    tvec = np.array([0.0, 0.0, 2.5])
    camera = np.array([[224, 0, 112], [0, 224, 112], [0, 0, 1]], np.float64)
    proj, _ = cv2.projectPoints(FACE_3D[:66].astype(np.float64), rvec, tvec,
                                camera, np.zeros((4, 1)))

    def lm_fn(crop):
        # heatmaps whose decode lands near the projected canonical face
        hm = np.zeros((28, 28, 198), np.float32)
        for i in range(66):
            y = int(np.clip(proj[i, 0, 0] / 8, 0, 27))
            x = int(np.clip(proj[i, 0, 1] / 8, 0, 27))
            hm[y, x, i] = 8.0
            hm[y, x, 66 + i] = 0.5
            hm[y, x, 132 + i] = 0.5
        return hm

    tr = JaxTracker(width=224, height=224,
                    detect_fn=lambda im: (None, None), lm_fn=lm_fn,
                    estimate_pose=True, extract_features=True)
    frame = np.full((224, 224, 3), 128, np.uint8)
    res = tr.predict(frame)
    assert len(res) == 1
    r = res[0]
    assert r.quaternion is not None and r.euler is not None
    assert r.pts_3d is not None and r.pts_3d.shape == (70, 3)
    assert r.pnp_error is not None and np.isfinite(r.pnp_error)
    assert r.features is not None and len(r.features) == 14
    assert r.eye_blink is not None and len(r.eye_blink) == 2
