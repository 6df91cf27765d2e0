"""JaxTracker driver state machine: detect -> track -> miss -> re-detect
(spec: reference OpenSeeFace/tracker.py:1034-1215, single-face role)."""

from __future__ import annotations

import numpy as np
import pytest

from havatar_tpu.preprocess.tracker import FaceResult, JaxTracker
from havatar_tpu.preprocess.landmark_net import logit_arr


W, H = 640, 480


def make_lm_heatmap(cells, conf=0.9):
    """[28, 28, 198] heatmaps whose 66 peaks sit at grid ``cells`` (gy, gx)
    with offset-channel value 0.5 (=> zero sub-cell offset)."""
    hm = np.zeros((28, 28, 198), np.float32)
    hm[:, :, 66:] = 0.5
    for l, (gy, gx) in enumerate(cells):
        hm[gy, gx, l] = conf
    return hm


class CountingNets:
    """detect_fn / lm_fn stand-ins that count invocations."""

    def __init__(self, face_box_cells, lm_conf=0.9):
        self.detect_calls = 0
        self.lm_calls = 0
        self.face_box_cells = face_box_cells
        self.lm_conf = lm_conf

    def detect_fn(self, im):
        self.detect_calls += 1
        maps = np.zeros((56, 56, 2), np.float32)
        maps[28, 28, 0] = 0.9          # peak at frame center
        maps[28, 28, 1] = 40.0 / 112.  # radius -> 80px box at 224 scale
        return maps, maps.copy()

    def lm_fn(self, crop):
        self.lm_calls += 1
        return make_lm_heatmap(self.face_box_cells, self.lm_conf)


@pytest.fixture
def nets():
    # 66 landmarks spread over grid cells [8..19]² (center of the crop)
    cells = [(8 + (i % 12), 8 + (i // 12)) for i in range(66)]
    return CountingNets(cells)


def test_detect_then_track(nets):
    tr = JaxTracker(width=W, height=H, detect_fn=nets.detect_fn,
                    lm_fn=nets.lm_fn)
    frame = np.zeros((H, W, 3), np.uint8)

    out = tr.predict(frame)
    assert len(out) == 1 and isinstance(out[0], FaceResult)
    assert nets.detect_calls == 1
    assert out[0].conf == pytest.approx(0.9, abs=1e-6)
    assert out[0].lms.shape == (66, 3)

    # second frame: tracked bbox reused, no re-detection
    out2 = tr.predict(frame)
    assert len(out2) == 1
    assert nets.detect_calls == 1
    assert nets.lm_calls == 2


def test_lms_within_crop_and_bbox_layout(nets):
    tr = JaxTracker(width=W, height=H, detect_fn=nets.detect_fn,
                    lm_fn=nets.lm_fn)
    out = tr.predict(np.zeros((H, W, 3), np.uint8))[0]
    y1, x1, h, w = out.bbox              # (y1, x1, h, w) — tracker.py:1148
    assert h > 0 and w > 0
    lms = out.lms
    assert np.all(lms[:, 0] >= y1 - 1e-3) and np.all(lms[:, 0] <= y1 + h + 1e-3)
    assert np.all(lms[:, 1] >= x1 - 1e-3) and np.all(lms[:, 1] <= x1 + w + 1e-3)
    # internal face box stored as (x, y, w, h)
    assert tr.faces[0][0] == pytest.approx(x1)
    assert tr.faces[0][1] == pytest.approx(y1)


def test_miss_discard_then_redetect(nets):
    tr = JaxTracker(width=W, height=H, detect_fn=nets.detect_fn,
                    lm_fn=nets.lm_fn, threshold=0.5, discard_after=2)
    frame = np.zeros((H, W, 3), np.uint8)
    assert len(tr.predict(frame)) == 1
    assert nets.detect_calls == 1

    nets.lm_conf = 0.1                   # face "lost"
    for i in range(2):                   # misses within discard_after
        assert tr.predict(frame) == []
        assert tr.faces, "box kept during the discard window"
    assert tr.predict(frame) == []       # third miss: box dropped
    assert tr.faces == []

    nets.lm_conf = 0.9                   # face back: re-detection path
    out = tr.predict(frame)
    assert len(out) == 1
    assert nets.detect_calls >= 2


def test_decode_offsets_shift_landmarks():
    """Non-0.5 offset channels move landmarks by res*logit (tracker.py:746)."""
    cells = [(14, 14)] * 66
    hm = make_lm_heatmap(cells)
    hm[14, 14, 66:132] = 0.6             # y-offset channel (t_off_x in ref)
    tr = JaxTracker(width=W, height=H,
                    detect_fn=lambda im: (None, None),
                    lm_fn=lambda crop: hm)
    out = tr.predict(np.zeros((H, W, 3), np.uint8))[0]
    base = make_lm_heatmap(cells)
    tr2 = JaxTracker(width=W, height=H,
                     detect_fn=lambda im: (None, None),
                     lm_fn=lambda crop: base)
    out2 = tr2.predict(np.zeros((H, W, 3), np.uint8))[0]
    # full-frame fallback crop clamps to H-1 (clamp_to_im), so scale_y is
    # (H-1)/224
    expected_shift = 223.0 * logit_arr(np.float32(0.6), 16.0) * ((H - 1) / 224.0)
    np.testing.assert_allclose(
        out.lms[:, 0] - out2.lms[:, 0], expected_shift, rtol=1e-4)


def test_full_frame_fallback_without_detector():
    cells = [(8 + (i % 12), 8 + (i // 12)) for i in range(66)]
    tr = JaxTracker(width=W, height=H,
                    detect_fn=lambda im: (None, None),
                    lm_fn=lambda crop: make_lm_heatmap(cells))
    out = tr.predict(np.zeros((H, W, 3), np.uint8))
    assert len(out) == 1
