"""Pluggable face-landmark backends for the fitting pipeline.

The reference chains OpenSeeFace (ONNX RetinaFace + MobileNetV3 heatmap
models, OpenSeeFace/tracker.py:498-560,731-761) for detection/crop and
MediaPipe FaceMesh for the precise 478 landmarks (fit_video.py:49-50,163-171).
Both depend on downloadable model assets and runtimes (onnxruntime,
mediapipe) that are optional here; the fitting math only needs a
``[478, 2]`` pixel-landmark array per frame, so backends are pluggable:

* ``MediapipeBackend`` — used when the ``mediapipe`` package is installed
  (exact parity with the reference's landmark source).
* ``PrecomputedBackend`` — reads ``{frame}.npy`` landmark files (produced by
  any external tracker) — the zero-dependency path.

A torch port of the OpenSeeFace landmark heads (the reference ships one as
a blueprint, tracker_pytorch.py / models_pytorch/model.py:144-330) can be
added as a third backend when its weights are available.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class LandmarkBackend:
    def detect(self, frame_rgb: np.ndarray) -> Optional[np.ndarray]:
        """[H, W, 3] uint8 -> [478, 2] pixel landmarks or None (no face)."""
        raise NotImplementedError


class MediapipeBackend(LandmarkBackend):
    def __init__(self):
        import mediapipe as mp  # optional dependency

        self._mesh = mp.solutions.face_mesh.FaceMesh(
            max_num_faces=1, refine_landmarks=True,
            min_detection_confidence=0.5, min_tracking_confidence=0.5)

    def detect(self, frame_rgb: np.ndarray) -> Optional[np.ndarray]:
        res = self._mesh.process(frame_rgb)
        if not res.multi_face_landmarks:
            return None
        h, w = frame_rgb.shape[:2]
        lms = res.multi_face_landmarks[0].landmark
        return np.asarray([[p.x * w, p.y * h] for p in lms], np.float32)


class PrecomputedBackend(LandmarkBackend):
    """Reads per-frame landmark .npy files: ``{lms_dir}/{name}.npy``."""

    def __init__(self, lms_dir: str):
        self.lms_dir = lms_dir
        self._current: Optional[str] = None

    def set_frame(self, name: str) -> None:
        self._current = name

    def detect(self, frame_rgb: np.ndarray) -> Optional[np.ndarray]:
        assert self._current is not None, "call set_frame(name) first"
        path = os.path.join(self.lms_dir, f"{self._current}.npy")
        if not os.path.exists(path):
            return None
        return np.load(path).astype(np.float32)


def get_backend(name: str = "auto", **kwargs) -> LandmarkBackend:
    if name in ("auto", "mediapipe"):
        try:
            return MediapipeBackend()
        except Exception:
            if name == "mediapipe":
                raise
    if name in ("auto", "precomputed"):
        if "lms_dir" in kwargs:
            return PrecomputedBackend(kwargs["lms_dir"])
    raise RuntimeError(
        "no landmark backend available: install mediapipe or provide "
        "precomputed landmarks via lms_dir=")
