"""Tracker periphery parity: Remedian / Feature / FeatureExtractor smoothing
against the reference OpenSeeFace modules (executed read-only as oracles,
with onnxruntime stubbed out), the gaze-net converter/forward, and the
eye-state decode geometry."""

import math
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from havatar_tpu.preprocess import landmark_net as L
from havatar_tpu.preprocess import tracker as T
from havatar_tpu.preprocess.tracker_features import (
    Feature,
    FeatureExtractor,
    Remedian,
)


@pytest.fixture(scope="module")
def ref_tracker_mod():
    """Import the reference OpenSeeFace.tracker with onnxruntime stubbed."""
    sys.modules.setdefault("onnxruntime", types.ModuleType("onnxruntime"))
    path = "/root/reference/data_preprocessing"
    if path not in sys.path:
        sys.path.insert(0, path)
    import OpenSeeFace.tracker as ref

    return ref


def test_remedian_matches_reference(ref_tracker_mod):
    from OpenSeeFace.remedian import remedian as RefRemedian

    rng = np.random.RandomState(0)
    xs = rng.randn(1500) * 3 + 1
    ours, ref = Remedian(), RefRemedian()
    for i, x in enumerate(xs):
        ours.add(float(x))
        ref + float(x)
        if i % 97 == 0 and i > 0:
            np.testing.assert_allclose(ours.median(), ref.median(), rtol=0,
                                       atol=0)


def test_feature_matches_reference(ref_tracker_mod):
    rng = np.random.RandomState(1)
    for threshold, seed in ((0.15, 2), (0.05, 3), (0.02, 4)):
        ours = Feature(threshold=threshold)
        ref = ref_tracker_mod.Feature(threshold=threshold)
        # drifting signal with spikes — exercises calibration, min/max
        # expansion, hard-limit decay, and the EMA
        xs = (np.sin(np.linspace(0, 20, 400)) * 0.5 + 1.0
              + rng.randn(400) * 0.05)
        xs[50] = 3.0
        xs[200] = -0.5
        for x in xs:
            a = ours.update(float(x))
            b = ref.update(float(x))
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_feature_extractor_matches_reference(ref_tracker_mod):
    rng = np.random.RandomState(5)
    base = np.stack([rng.rand(66) * 200 + 20, rng.rand(66) * 200 + 20], -1)
    ours = FeatureExtractor()
    ref = ref_tracker_mod.FeatureExtractor()
    for t in range(40):
        pts = base + np.sin(t / 3.0) * 4.0 + rng.randn(66, 2) * 0.8
        a = ours.update(pts)
        b = ref.update(pts)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-9, atol=1e-9,
                                       err_msg=f"feature {k} frame {t}")


# ---------------------------------------------------------------------------
# Gaze net
# ---------------------------------------------------------------------------

def bn_dict(bn, prefix):
    return {f"{prefix}.weight": bn.weight.detach().numpy(),
            f"{prefix}.bias": bn.bias.detach().numpy(),
            f"{prefix}.running_mean": bn.running_mean.numpy(),
            f"{prefix}.running_var": bn.running_var.numpy()}


def rand_bn(ch):
    bn = nn.BatchNorm2d(ch).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.rand(ch) + 0.5)
        bn.bias.copy_(torch.randn(ch) * 0.1)
        bn.running_mean.copy_(torch.randn(ch) * 0.1)
        bn.running_var.copy_(torch.rand(ch) + 0.5)
    return bn


def _gaze_state_dict(seed=6):
    """Synthetic geffnet-layout state_dict for OpenSeeFaceGaze
    (mnv3-small backbone + old=2 heads, model.py:144-153)."""
    torch.manual_seed(seed)
    sd = {}
    sd["conv_stem.weight"] = torch.randn(16, 3, 3, 3).numpy() * 0.1
    sd.update(bn_dict(rand_bn(16), "bn1"))
    cin = 16
    stage_out = []
    for si, stage in enumerate(L._SMALL):
        for bi, spec in enumerate(stage):
            btype, k, stride, e, cch, has_se, _ = spec
            cout = L.round_channels(cch, 1.0)
            pre = f"blocks.{si}.{bi}"
            if btype == "cn":
                sd[f"{pre}.conv.weight"] = torch.randn(cout, cin, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn1"))
            elif btype == "ds":
                sd[f"{pre}.conv_dw.weight"] = torch.randn(cin, 1, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cin), f"{pre}.bn1"))
                if has_se:
                    rd = L.make_divisible(cin * 0.25)
                    sd[f"{pre}.se.conv_reduce.weight"] = torch.randn(rd, cin, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_reduce.bias"] = torch.randn(rd).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.weight"] = torch.randn(cin, rd, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.bias"] = torch.randn(cin).numpy() * 0.1
                sd[f"{pre}.conv_pw.weight"] = torch.randn(cout, cin, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn2"))
            else:
                mid = L.make_divisible(cin * e)
                sd[f"{pre}.conv_pw.weight"] = torch.randn(mid, cin, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(mid), f"{pre}.bn1"))
                sd[f"{pre}.conv_dw.weight"] = torch.randn(mid, 1, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(mid), f"{pre}.bn2"))
                if has_se:
                    rd = L.make_divisible(mid * 0.25)
                    sd[f"{pre}.se.conv_reduce.weight"] = torch.randn(rd, mid, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_reduce.bias"] = torch.randn(rd).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.weight"] = torch.randn(mid, rd, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.bias"] = torch.randn(mid).numpy() * 0.1
                sd[f"{pre}.conv_pwl.weight"] = torch.randn(cout, mid, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn3"))
            cin = cout
        stage_out.append(cin)

    def head_old2(prefix, hin, hout, kpl=1, groups=1):
        sd[f"{prefix}.0.weight"] = torch.randn(hin * kpl, 1, 3, 3).numpy() * 0.1
        sd[f"{prefix}.0.bias"] = torch.randn(hin * kpl).numpy() * 0.1
        sd[f"{prefix}.1.weight"] = torch.randn(
            hout, hin * kpl // groups, 1, 1).numpy() * 0.1
        sd[f"{prefix}.1.bias"] = torch.randn(hout).numpy() * 0.1

    # taps: r1 = stage 0 (16), r2 = stage 1 (24), r3 = stage 3 (48)
    head_old2("up1.conv.conv", stage_out[-1] + stage_out[3], 64)
    head_old2("up2.conv.conv", 64 + stage_out[1], 32)
    head_old2("up3.conv.conv", 32 + stage_out[0], 15)
    head_old2("group.conv", 15, 3, kpl=4, groups=3)
    return sd


def test_gaze_converter_roundtrip_and_forward():
    sd = _gaze_state_dict()
    params = L.convert_torch_gaze_model(sd)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3)
                    .astype(np.float32))
    maps = L.apply_gaze_net(params, x)
    assert maps.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(maps)).all()


def test_ds_head_old2_matches_torch():
    """old=2 DSConv2d: dw3x3(+bias) -> grouped pw1x1(+bias), NO activation
    (model.py:106-110)."""
    torch.manual_seed(7)
    cin, kpl, cout, groups = 15, 4, 3, 3
    dw = nn.Conv2d(cin, cin * kpl, 3, padding=1, groups=cin)
    pw = nn.Conv2d(cin * kpl, cout, 1, groups=groups)
    x = torch.randn(1, cin, 8, 8)
    with torch.no_grad():
        want = pw(dw(x)).permute(0, 2, 3, 1).numpy()

    p = {"dw_w": dw.weight.detach().numpy().transpose(2, 3, 1, 0),
         "dw_b": dw.bias.detach().numpy(),
         "pw_w": pw.weight.detach().numpy().transpose(2, 3, 1, 0),
         "pw_b": pw.bias.detach().numpy()}
    got = np.asarray(L.ds_head_old2(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), p, groups_pw=groups))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# Eye-state decode geometry
# ---------------------------------------------------------------------------

def test_get_eye_state_decodes_synthetic_peak():
    """A mocked gaze net with a known peak + neutral offsets must map the
    pupil back to the eye-box location implied by the decode chain
    (crop-local grid coords -> flip -> scale -> rotation -> offsets)."""
    H = W = 128
    frame = np.zeros((H, W, 3), np.uint8)
    rng = np.random.RandomState(8)
    lms = np.zeros((66, 3), np.float32)
    # spread landmarks so the face box covers most of the frame
    lms[:, 0] = rng.rand(66) * 60 + 30       # y
    lms[:, 1] = rng.rand(66) * 60 + 30       # x
    # horizontal eyes: corners at fixed y so roll compensation is identity
    lms[36] = [50, 40, 1]; lms[39] = [50, 56, 1]    # right eye (y, x)
    lms[42] = [50, 70, 1]; lms[45] = [50, 86, 1]    # left eye

    peak = (3, 4)  # grid coords in the 8x8 map

    def gaze_fn(crops):
        assert crops.shape == (2, 32, 32, 3)
        maps = np.zeros((2, 8, 8, 3), np.float32)
        maps[:, :, :, 1:] = 0.5              # logit(0.5) = 0 -> no offset
        maps[:, peak[0], peak[1], 0] = 0.9
        return maps

    out = T.get_eye_state(frame, lms, gaze_fn)
    assert out.shape == (2, 4)
    # conf decoded from the peak
    np.testing.assert_allclose(out[:, 3], 0.9, atol=1e-6)
    # reconstruct the expected mapping for the RIGHT eye (no flip):
    face, local, offset = T._extract_face(frame, lms)
    (x1, y1), (x2, y2), ref, a = T._corners_to_eye(
        local[36].astype(np.float64), local[39].astype(np.float64),
        face.shape[1], face.shape[0])
    assert abs(a) < 1e-6                       # horizontal corners -> no roll
    sx, sy = (x2 - x1) / 32.0, (y2 - y1) / 32.0
    want_x = x1 + sx * (32.0 * peak[0] / 8.0) + offset[0]
    want_y = y1 + sy * (32.0 * peak[1] / 8.0) + offset[1]
    np.testing.assert_allclose(out[0, 2], want_x, atol=1e-4)
    np.testing.assert_allclose(out[0, 1], want_y, atol=1e-4)
    # left eye was mirrored before the net: x decodes reflected
    (x1l, y1l), (x2l, y2l), _, al = T._corners_to_eye(
        local[42].astype(np.float64), local[45].astype(np.float64),
        face.shape[1], face.shape[0])
    assert abs(al) < 1e-6
    sxl = (x2l - x1l) / 32.0
    want_xl = x1l + sxl * (32.0 - 32.0 * peak[0] / 8.0) + offset[0]
    np.testing.assert_allclose(out[1, 2], want_xl, atol=1e-4)


def test_tracker_predict_returns_eye_state_and_features():
    """JaxTracker.predict wires gaze + feature smoothing through to the
    FaceResult (verdict item: tracker completeness)."""
    H = W = 128
    rng = np.random.RandomState(9)

    def lm_fn(crop):
        # analytic heatmaps with confident peaks -> a stable landmark set
        hm = np.zeros((28, 28, 198), np.float32)
        for i in range(66):
            y, x = 6 + (i * 5) % 16, 6 + (i * 7) % 16
            hm[y, x, i] = 8.0
            hm[y, x, 66 + i] = 0.5
            hm[y, x, 132 + i] = 0.5
        return hm

    def gaze_fn(crops):
        maps = np.zeros((2, 8, 8, 3), np.float32)
        maps[:, :, :, 1:] = 0.5
        maps[:, 4, 4, 0] = 0.8
        return maps

    tr = T.JaxTracker(width=W, height=H, detect_fn=lambda im: (None, None),
                      lm_fn=lm_fn, gaze_fn=gaze_fn, extract_features=True)
    frame = (rng.rand(H, W, 3) * 255).astype(np.uint8)
    res = tr.predict(frame)
    assert len(res) == 1
    assert res[0].eye_state is not None and res[0].eye_state.shape == (2, 4)
    assert res[0].features is not None and len(res[0].features) == 14
    res2 = tr.predict(frame)          # smoothing state carries across frames
    assert len(res2) == 1 and len(res2[0].features) == 14


def test_multi_face_tracking_with_stable_slots():
    """max_faces=2: two synthetic faces tracked simultaneously with stable
    slot identity across frames (the reference fans crops over threads;
    here the landmark net is batched over the crop axis)."""
    H = W = 256

    # two face regions; the fake landmark net reads WHICH crop it got from
    # the crop's mean brightness and emits a distinct landmark cluster
    def make_lm_hm(cx, cy):
        hm = np.zeros((28, 28, 198), np.float32)
        for i in range(66):
            y = int(np.clip(cy + (i % 8) - 4, 0, 27))
            x = int(np.clip(cx + (i // 8) - 4, 0, 27))
            hm[y, x, i] = 8.0
            hm[y, x, 66 + i] = 0.5
            hm[y, x, 132 + i] = 0.5
        return hm

    def lm_fn(crop):
        bright = crop[0].mean() > 0.0
        return make_lm_hm(14, 14) if bright else make_lm_hm(10, 10)

    def detect_fn(im):
        # two confident, separated peaks in the 56x56 detection map
        maps = np.zeros((56, 56, 2), np.float32)
        for (y, x) in ((14, 14), (38, 38)):
            maps[y, x, 0] = 0.95
            maps[y, x, 1] = 0.18          # radius channel
        mp = maps.copy()
        return maps, mp

    tr = T.JaxTracker(width=W, height=H, detect_fn=detect_fn, lm_fn=lm_fn,
                      max_faces=2, threshold=None, extract_features=True)
    rng = np.random.RandomState(3)
    frame = (rng.rand(H, W, 3) * 40).astype(np.uint8)
    frame[140:220, 140:220] = 220        # brighter second face

    res1 = tr.predict(frame)
    assert len(res1) == 2
    assert all(r.lms.shape == (66, 3) for r in res1)
    assert all(r.features is not None for r in res1)
    # distinct faces: landmark centroids differ
    c0 = res1[0].lms[:66, :2].mean(0)
    c1 = res1[1].lms[:66, :2].mean(0)
    assert np.linalg.norm(c0 - c1) > 5

    # second frame: same faces -> same slot order (stable identity)
    res2 = tr.predict(frame)
    assert len(res2) == 2
    d00 = np.linalg.norm(res2[0].lms[:66, :2].mean(0) - c0)
    d01 = np.linalg.norm(res2[0].lms[:66, :2].mean(0) - c1)
    assert d00 < d01          # slot 0 stayed on face 0


def test_multi_face_merges_overlapping_candidates():
    """Overlapping candidate crops that decode to the same face collapse
    into one result (group_rects semantics, tracker.py:1150-1167)."""
    H = W = 128

    def lm_fn(crop):
        hm = np.zeros((28, 28, 198), np.float32)
        for i in range(66):
            y, x = 10 + (i % 8), 10 + (i // 8)
            hm[y, x, i] = 8.0
            hm[y, x, 66 + i] = 0.5
            hm[y, x, 132 + i] = 0.5
        return hm

    def detect_fn(im):
        maps = np.zeros((56, 56, 2), np.float32)
        # two overlapping detections of one face (1 cell apart -> the
        # decoded landmark bboxes overlap well past the 0.3 merge cut)
        for (y, x) in ((20, 20), (21, 20)):
            maps[y, x, 0] = 0.9
            maps[y, x, 1] = 0.2
        return maps, maps.copy()

    tr = T.JaxTracker(width=W, height=H, detect_fn=detect_fn, lm_fn=lm_fn,
                      max_faces=2, threshold=None)
    frame = np.full((H, W, 3), 128, np.uint8)
    res = tr.predict(frame)
    assert len(res) == 1          # merged, not duplicated
