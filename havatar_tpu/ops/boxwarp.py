"""Uniform box warps: map a world-space AABB to the [-1, 1]^3 sampling cube.

Specs: ``get_box_warp_param`` (reference utils/util.py:179-186),
``UniformBoxWarp`` (utils/util.py:195-211, note the extra 2x in forward) and
``UniformBoxWarp_new`` (utils/util.py:214-236). Pure functions of static
parameters — they trace into jit with zero overhead.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def get_box_warp_param(
    x_bound: Sequence[float], y_bound: Sequence[float], z_bound: Sequence[float]
) -> Tuple[Tuple[float, float, float], Tuple[float, float, float]]:
    """scales/trans such that scale*x + trans maps each bound to [-1, 1]."""
    out_s, out_t = [], []
    for lo, hi in (x_bound, y_bound, z_bound):
        f = 2.0 / (hi - lo)
        c = f * (lo + hi) * 0.5
        out_s.append(float(f))
        out_t.append(float(-c))
    return tuple(out_s), tuple(out_t)


class BoxWarp:
    """coordinates * scale + trans (reference UniformBoxWarp_new.forward)."""

    def __init__(self, scales, trans):
        self.scale = jnp.asarray(scales, dtype=jnp.float32).reshape(1, 3)
        self.trans = jnp.asarray(trans, dtype=jnp.float32).reshape(1, 3)

    @classmethod
    def from_bounds(cls, xyz_bounding) -> "BoxWarp":
        scales, trans = get_box_warp_param(*xyz_bounding)
        return cls(scales, trans)

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        return coords * self.scale + self.trans

    def inv(self, coords) -> jnp.ndarray:
        if isinstance(coords, np.ndarray):
            return (coords - np.asarray(self.trans)) / np.asarray(self.scale)
        return (coords - self.trans) / self.scale


class BoxWarpLegacy(BoxWarp):
    """2 * (coordinates * scale + trans) — the older variant used by the
    skinning field (reference UniformBoxWarp.forward, utils/util.py:207-211,
    constructed with scales=(1/2.5, 1/2.5, 1/2.0), trans=(0, 0, -0.2) at
    model/Skinning_Field.py:49)."""

    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        return 2.0 * (coords * self.scale + self.trans)

    def inv(self, coords) -> jnp.ndarray:
        if isinstance(coords, np.ndarray):
            return (coords * 0.5 - np.asarray(self.trans)) / np.asarray(self.scale)
        return (coords * 0.5 - self.trans) / self.scale
