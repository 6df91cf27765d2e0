"""Minimal OBJ mesh IO + debug dumps.

Spec analogues: save_obj_data / load_obj_data (reference utils/util.py:35-176)
and the skinning-volume OBJ visualization
(model/Skinning_Field.py:127-132, train_avatar.py:96-98).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def save_obj(path: str, v: np.ndarray, f: Optional[np.ndarray] = None,
             vc: Optional[np.ndarray] = None) -> None:
    """Write vertices (optionally with per-vertex colors) and 1-based faces."""
    v = np.asarray(v)
    with open(path, "w") as fh:
        for i in range(v.shape[0]):
            if vc is not None:
                fh.write("v %f %f %f %f %f %f\n" % (*v[i], *np.asarray(vc)[i]))
            else:
                fh.write("v %f %f %f\n" % tuple(v[i]))
        if f is not None:
            for tri in np.asarray(f):
                fh.write("f %d %d %d\n" % tuple(tri))


def load_obj(path: str) -> Dict[str, np.ndarray]:
    verts, colors, faces = [], [], []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                vals = [float(x) for x in parts[1:]]
                verts.append(vals[:3])
                if len(vals) >= 6:
                    colors.append(vals[3:6])
            elif parts[0] == "f":
                faces.append([int(x.split("/")[0]) for x in parts[1:4]])
    out = {"v": np.asarray(verts, np.float32)}
    if colors:
        out["vc"] = np.asarray(colors, np.float32)
    if faces:
        out["f"] = np.asarray(faces, np.int32)
    return out


def visualize_skin_volume(model, params, buffers, path: str,
                          steps: int = 20) -> None:
    """Dump the head-follow weight channel as a colored point cloud OBJ
    (spec: visualize_motion_weight_vol, model/Skinning_Field.py:127-132)."""
    import jax.numpy as jnp

    from havatar_tpu.models.renderer import AvatarRenderer
    from havatar_tpu.models.skinning import make_volume_pts
    from havatar_tpu.ops import BoxWarp, get_box_warp_param, grid_sample_3d

    xb, yb, zb = [list(b) for b in model.xyz_bounding]
    yb[0] = 0.3 * yb[1]
    warp = BoxWarp(*get_box_warp_param(xb, yb, zb))
    pts = make_volume_pts(steps=steps, warp=warp)
    vol = model.apply({"params": params, "buffers": buffers},
                      method=AvatarRenderer.skin_volume)
    w = grid_sample_3d(vol[..., 1:2], warp(pts)[None], "border")[0]
    vc = np.asarray(w) * np.ones((1, 3), np.float32)
    save_obj(path, np.asarray(pts), vc=vc)
