"""Checkpoint save/restore with orbax — async, preemption-safe.

The reference saves torch dicts every N iters (train_avatar.py:303-315,
train_avatarHD.py:347-377) with manual `--ckpt` resume and no preemption
handling (SURVEY.md §5). Here: an orbax ``CheckpointManager`` with async
writes and latest-step auto-restore, which is the TPU-VM-preemption story.

Checkpoint *semantics* parity: the saved tree carries the same top-level key
names as the reference ({iter, trainer_state, optimizer_state} stage 1;
{iter, nerf_render, g, d, g_ema, latent_codes, ...} stage 2), and
``checkpoints.convert`` imports the reference's torch files.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=True,
        )
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, step: int, tree: Any, force: bool = False) -> bool:
        return self._mgr.save(step, args=ocp.args.StandardSave(tree),
                              force=force)

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
