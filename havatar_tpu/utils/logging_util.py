"""Metrics/observability: TensorBoard writer + code snapshots.

Spec analogues: SummaryWriter usage (train_avatar.py:78,168-179),
``create_code_snapshot`` tarballs (utils/training_util.py:142-159),
config dump into the logdir (train_avatar.py:81-82).
"""

from __future__ import annotations

import datetime
import os
import tarfile
from typing import Optional

import numpy as np


class MetricsWriter:
    """Thin TensorBoard wrapper (falls back to JSONL if TB is unavailable)."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir)
        except Exception:
            self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value, step: int) -> None:
        value = float(value)
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        else:
            import json

            self._jsonl.write(json.dumps({"tag": tag, "value": value,
                                          "step": step}) + "\n")
            self._jsonl.flush()

    def image(self, tag: str, img_hwc: np.ndarray, step: int) -> None:
        if self._tb is not None:
            self._tb.add_image(tag, np.asarray(img_hwc), step,
                               dataformats="HWC")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()


def create_code_snapshot(src_dir: str, out_path: str) -> None:
    """Tar up the framework source next to the run logs
    (spec analogue: utils/training_util.py:142-159)."""
    def _filter(ti: tarfile.TarInfo):
        name = ti.name
        if any(part in name for part in
               (".git", "__pycache__", ".pyc", "logs", "renders")):
            return None
        return ti

    with tarfile.open(out_path, "w:gz") as tar:
        tar.add(src_dir, arcname=os.path.basename(src_dir), filter=_filter)


def timestamp() -> str:
    return datetime.datetime.now().strftime("%Y_%m_%d_%H_%M_%S")
