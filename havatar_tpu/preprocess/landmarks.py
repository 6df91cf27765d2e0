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

* ``JaxOpenSeeFaceBackend`` — the OpenSeeFace landmark heads rebuilt in JAX
  (preprocess/landmark_net.py, blueprint models_pytorch/model.py:144-330,
  decode tracker.py:731-761); given a converted weights file, preprocessing
  runs with ZERO non-JAX ML dependencies. Produces 66 (x, y) landmarks —
  enough for the crop/presence role OpenSeeFace plays in the reference
  (fit_video.py:534-638); pair with video.crop_params_from_landmarks.
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


class JaxOpenSeeFaceBackend(LandmarkBackend):
    """66-point OpenSeeFace landmark heads in JAX (landmark_net.py).

    ``detect`` runs the full frame as the crop (the reference's initial
    whole-frame detection role); returns [66, 2] (x, y) pixel landmarks or
    None below ``conf_threshold``.
    """

    def __init__(self, weights_path: str, model_type: int = 3,
                 conf_threshold: float = 0.2):
        import jax

        from havatar_tpu.preprocess import landmark_net as L

        self._L = L
        self.model_type = model_type
        self.conf_threshold = conf_threshold
        self.params = L.load_landmark_weights(weights_path, model_type)
        self._apply = jax.jit(
            lambda p, x: L.apply_landmark_net(p, x, model_type))

    def detect(self, frame_rgb: np.ndarray) -> Optional[np.ndarray]:
        h, w = frame_rgb.shape[:2]
        inp = self._L.preprocess_crop(frame_rgb)
        hm = np.asarray(self._apply(self.params, inp)[0])
        conf, lms_yx = self._L.decode_landmarks(
            hm, crop_info=(0.0, 0.0, w / 224.0, h / 224.0))
        if conf < self.conf_threshold:
            return None
        return lms_yx[:, [1, 0]].astype(np.float32)  # (y,x,conf) -> (x,y)


def get_backend(name: str = "auto", **kwargs) -> LandmarkBackend:
    if name in ("auto", "mediapipe"):
        try:
            return MediapipeBackend()
        except Exception:
            if name == "mediapipe":
                raise
    if name in ("auto", "openseeface"):
        path = kwargs.get("lm_weights")
        if path and os.path.exists(path):
            return JaxOpenSeeFaceBackend(
                path, model_type=kwargs.get("model_type", 3))
        if name == "openseeface":
            raise RuntimeError(f"landmark weights not found: {path}")
    if name in ("auto", "precomputed"):
        if "lms_dir" in kwargs:
            return PrecomputedBackend(kwargs["lms_dir"])
    raise RuntimeError(
        "no landmark backend available: install mediapipe, provide "
        "converted OpenSeeFace weights via lm_weights=, or precomputed "
        "landmarks via lms_dir=")
