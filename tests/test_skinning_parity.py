"""Oracle parity: SkinningField vs the reference Deformation_Field_new with
converted weights (full deformation path: dual inverse transforms, trilinear
weight lookup, normalized blend of points and view dirs)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests import torch_oracle

torch_oracle.install()

from havatar_tpu.checkpoints import convert as C  # noqa: E402
from havatar_tpu.models.skinning import SkinningField  # noqa: E402
from havatar_tpu.ops import get_box_warp_param  # noqa: E402


def test_skinning_field_parity():
    from model.Skinning_Field import Deformation_Field_new
    from utils.util import UniformBoxWarp_new

    torch.manual_seed(0)
    bounds = {"X": np.asarray([-1.5, 1.5]), "Y": np.asarray([0.42, 1.4]),
              "Z": np.asarray([-1.6, 1.2])}
    from utils.util import get_box_warp_param as ref_warp_param

    scales_t, trans_t = ref_warp_param(bounds["X"], bounds["Y"], bounds["Z"])
    ref = Deformation_Field_new(
        gridwarper=UniformBoxWarp_new(scales=scales_t, trans=trans_t)).eval()

    B, N = 2, 57
    pts = torch.randn(B, N, 3) * 0.8
    dirs = torch.randn(B, N, 3)
    dirs = dirs / dirs.norm(dim=-1, keepdim=True)
    rot = torch.eye(3) + 0.1 * torch.randn(3, 3)
    inv_T = torch.cat([torch.linalg.inv(rot), 0.05 * torch.randn(1, 3)], 0)
    inv_T = inv_T.unsqueeze(0).expand(B, -1, -1)

    with torch.no_grad():
        want_pts, want_dirs = ref(pts, dirs, inv_T)

    scales, trans = get_box_warp_param(bounds["X"], bounds["Y"], bounds["Z"])
    mine = SkinningField(scales=scales, trans=trans, vol_res=64)
    vd = C.convert_volume_decoder(ref.state_dict(), "canonical_Wvolume",
                                  final_res=64)
    variables = {"params": {"canonical_volume": vd["params"]},
                 "buffers": {"canonical_volume": vd["buffers"]}}
    got_pts, got_dirs = mine.apply(
        variables, jnp.asarray(pts.numpy()), jnp.asarray(dirs.numpy()),
        jnp.asarray(inv_T.numpy()))

    np.testing.assert_allclose(np.asarray(got_pts), want_pts.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_dirs), want_dirs.numpy(),
                               atol=2e-4, rtol=1e-3)
