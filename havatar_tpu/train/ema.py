"""Parameter EMA (spec: ``accumulate``, utils/styleUnet_util.py:51-56;
used with decay 0.5^(32/10k) at train_avatarHD.py:162,303)."""

from __future__ import annotations

import jax


def ema_update(ema_params, params, decay: float):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)
