"""Single-face tracking driver over the JAX OpenSeeFace nets.

Behavioral spec: ``Tracker.predict`` (reference
data_preprocessing/OpenSeeFace/tracker.py:1034-1215) in the role the havatar
pipeline uses it for (fit_video.py:585-595 initial crop;
fit_videos_mp.py:142-145 per-frame face presence): detect a face with the
detection net when nothing is tracked, crop with the reference's margins
(tracker.py:1084-1087), run the landmark net, and on success carry the
landmark bounding box forward as the next frame's crop — re-detecting after
``discard_after`` consecutive misses (tracker.py:1188-1204).

Single face only: the pipeline constructs ``Tracker(max_faces=1..4)`` but
consumes exactly ``preds[0]`` (fit_video.py:595, fit_videos_mp.py:143), so
the multi-face thread pool and crop-group merging (tracker.py:1123-1166) are
out of scope — documented, not rebuilt.

The two nets are injected as callables so the driver is testable without
weights; ``JaxTracker.from_weights`` wires the jitted JAX nets
(preprocess/landmark_net.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

import numpy as np

from havatar_tpu.preprocess import landmark_net as L


@dataclass
class FaceResult:
    """What the pipeline reads from a tracked face: ``lms`` rows are
    (y, x, conf) — the reference's layout (tracker.py:757; consumers swap to
    (x, y) themselves, fit_video.py:595)."""

    conf: float
    lms: np.ndarray                       # [66, 3] (y, x, conf)
    bbox: Tuple[float, float, float, float]  # (y1, x1, h, w) — tracker.py:1148
    success: bool = True


def _clamp_to_im(x: float, y: float, w: int, h: int) -> Tuple[int, int]:
    """spec: tracker.py clamp_to_im — clamp a point into the image."""
    return int(min(max(x, 0), w - 1)), int(min(max(y, 0), h - 1))


@dataclass
class JaxTracker:
    """detect_fn: [224,224,3] RGB float (normalized) -> ([56,56,2] maps,
    [56,56,2] maxpool). lm_fn: [1,224,224,3] normalized crop ->
    [28,28,198] heatmaps. Both numpy-in/numpy-out."""

    width: int
    height: int
    detect_fn: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray]]
    lm_fn: Callable[[np.ndarray], np.ndarray]
    # None accepts any confidence (the pipeline passes threshold=None,
    # fit_video.py:585 — "no gating"; the reference would compare a float
    # against None, a py2 leftover)
    threshold: Optional[float] = None
    detection_threshold: float = 0.6
    discard_after: int = 5
    bbox_growth: float = 0.0
    model_type: int = 3

    faces: List[Tuple[float, float, float, float]] = field(default_factory=list)
    discard: int = 0
    frame_count: int = 0

    @classmethod
    def from_weights(cls, width: int, height: int, lm_weights: str,
                     detect_weights: Optional[str] = None,
                     model_type: int = 3, **kw) -> "JaxTracker":
        import jax

        lm_params = L.load_landmark_weights(lm_weights, model_type)
        lm_apply = jax.jit(lambda x: L.apply_landmark_net(
            lm_params, x, model_type))

        def lm_fn(crop):
            return np.asarray(lm_apply(crop)[0])

        if detect_weights is not None:
            import torch

            det_params = L.convert_torch_detection_model(
                torch.load(detect_weights, map_location="cpu"))
            det_apply = jax.jit(
                lambda x: L.apply_detection_net(det_params, x))

            def detect_fn(im):
                maps, mp = det_apply(im[None])
                return np.asarray(maps[0]), np.asarray(mp[0])
        else:
            def detect_fn(im):  # no detector: full-frame fallback crop
                return None, None

        return cls(width=width, height=height, detect_fn=detect_fn,
                   lm_fn=lm_fn, model_type=model_type, **kw)

    # ---- internals --------------------------------------------------------

    def _detect_faces(self, frame_rgb: np.ndarray) -> np.ndarray:
        """Run the 224² detection net; (x, y, w, h) boxes in frame pixels
        (spec: tracker.py:705-729). Falls back to a whole-frame box when no
        detector is wired (the landmark net's conf then gates it)."""
        im = L.preprocess_crop(frame_rgb, res=224)[0]
        maps, mp = self.detect_fn(im)
        if maps is None:
            return np.array(
                [[0.0, 0.0, self.width, self.height]], np.float32)
        return L.decode_detections(
            maps, mp, (self.height, self.width), max_faces=1,
            threshold=self.detection_threshold)

    def _crop_region(self, box) -> Optional[Tuple[int, int, int, int]]:
        """Expand a face box by the reference margins (tracker.py:1084-1091)
        and clamp; None if degenerate."""
        x, y, w, h = box
        x1 = x - int(w * 0.1)
        y1 = y - int(h * 0.125)
        x2 = x + w + int(w * 0.1)
        y2 = y + h + int(h * 0.125)
        x1, y1 = _clamp_to_im(x1, y1, self.width, self.height)
        x2, y2 = _clamp_to_im(x2, y2, self.width, self.height)
        if x2 - x1 < 4 or y2 - y1 < 4:
            return None
        return x1, y1, x2, y2

    # ---- main API ---------------------------------------------------------

    def predict(self, frame_rgb: np.ndarray) -> List[FaceResult]:
        """[H, W, 3] uint8 RGB -> tracked faces (0 or 1)."""
        self.frame_count += 1
        candidates = list(self.faces)
        if not candidates:
            candidates = [tuple(b) for b in self._detect_faces(frame_rgb)]

        best: Optional[FaceResult] = None
        for box in candidates:
            region = self._crop_region(box)
            if region is None:
                continue
            x1, y1, x2, y2 = region
            crop = L.preprocess_crop(frame_rgb[y1:y2, x1:x2], res=224)
            hm = self.lm_fn(crop)
            conf, lms = L.decode_landmarks(
                hm, crop_info=(x1, y1, (x2 - x1) / 224.0, (y2 - y1) / 224.0))
            if self.threshold is not None and conf <= self.threshold:
                continue
            if best is None or conf > best.conf:
                # landmark-extent bbox carried to the next frame
                # (tracker.py:1144-1149)
                ymin, xmin = lms[:66, 0].min(), lms[:66, 1].min()
                ymax, xmax = lms[:66, 0].max(), lms[:66, 1].max()
                best = FaceResult(conf=float(conf), lms=lms,
                                  bbox=(ymin, xmin, ymax - ymin, xmax - xmin))

        if best is not None:
            y1b, x1b, hb, wb = best.bbox
            self.faces = [(x1b, y1b, wb, hb)]
            self.discard = 0
            return [best]

        # miss: keep (optionally grown) box for a few frames, then re-detect
        # (tracker.py:1188-1204)
        self.discard += 1
        if self.discard > self.discard_after:
            self.faces = []
        elif self.bbox_growth > 0 and self.faces:
            x, y, w, h = self.faces[0]
            g = self.bbox_growth
            self.faces = [(x - w * g, y - h * g,
                           w + 2 * w * g, h + 2 * h * g)]
        return []
