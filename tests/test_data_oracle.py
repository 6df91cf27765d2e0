"""Data-layer oracle test: the reference ``MultiView_ImgDataset``
(/root/reference/dataloader/dataloader.py:36-218) executed on a synthetic
split must produce element-wise identical tensors to our ``AvatarDataset``.

Run in ``val`` mode (full-coordinate selection, dataloader.py:166-167) so no
sampling RNG is involved — this pins the 12-channel ray layout
(o, d, near, far, bg, mask — dataloader.py:179-180), the near/far derived
from ``transform_matrix_ori`` (:174-177), ray generation (K⁻¹ convention,
data_util.py:28-56), the white-bg GT compositing (:196-199), the 7-channel
condition layout (:220-230), and the inv_head_T math (:215-216) against the
reference implementation itself.
"""

from __future__ import annotations

import numpy as np
import pytest

from havatar_tpu.utils.cfgnode import CfgNode
from tests.make_synthetic_dataset import make_dataset
from tests import torch_oracle


def _cfg():
    return CfgNode({
        "experiment": {"patch_rgb": False},
        "dataset": {"near": -1.6, "far": 1.0, "length": 1.0,
                    "num_random_rays": 64, "cond_render_res": 64},
    })


@pytest.fixture(scope="module")
def split(tmp_path_factory):
    root = tmp_path_factory.mktemp("oracle_data")
    return make_dataset(str(root), num_frames=3, img_res=32, cond_res=64)


@pytest.fixture(scope="module")
def ref_dataset_cls():
    torch_oracle.install()
    from dataloader.dataloader import MultiView_ImgDataset

    return MultiView_ImgDataset


@pytest.mark.parametrize("down_sample", [1.0, 0.5])
def test_val_mode_tensors_match_reference(split, ref_dataset_cls, down_sample):
    from havatar_tpu.data import AvatarDataset

    cfg = _cfg()
    ref_ds = ref_dataset_cls(split, "val", cfg, down_sample=down_sample)
    ours = AvatarDataset(split, "val", cfg, down_sample=down_sample)

    assert len(ref_ds) == len(ours)
    for idx in range(len(ours)):
        _, ref = ref_ds[idx]
        mine = ours.load_item(idx)

        ref_rays = ref["mv_rays"].numpy()
        assert mine["mv_rays"].shape == ref_rays.shape  # [R, 12]
        np.testing.assert_allclose(mine["mv_rays"], ref_rays,
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(mine["gt_color"],
                                   ref["mv_rays_gt_color"].numpy(),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(mine["inv_head_T"],
                                   ref["inv_head_T"].numpy(),
                                   atol=1e-5, rtol=1e-5)
        for key in ("front_render_cond", "left_render_cond",
                    "right_render_cond"):
            np.testing.assert_allclose(mine[key], ref[key].numpy(),
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=key)


def test_test_mode_rays_match_reference(split, ref_dataset_cls):
    """test mode: no mask channel (11-ch rays), no GT."""
    from havatar_tpu.data import AvatarDataset

    cfg = _cfg()
    ref_ds = ref_dataset_cls(split, "test", cfg, down_sample=1.0)
    ours = AvatarDataset(split, "test", cfg, down_sample=1.0, full_image=True)
    _, ref = ref_ds[0]
    mine = ours.load_item(0)
    np.testing.assert_allclose(mine["mv_rays"], ref["mv_rays"].numpy(),
                               atol=1e-5, rtol=1e-5)


def test_per_view_mask_thresh(split):
    """dict-valued mask_thresh selects per view_name
    (spec: dataloader.py:156)."""
    from havatar_tpu.data import AvatarDataset

    cfg = _cfg()
    cfg.dataset.mask_thresh = {"0": 254.0}
    strict = AvatarDataset(split, "val", cfg, down_sample=1.0)
    cfg2 = _cfg()
    lax_ds = AvatarDataset(split, "val", cfg2, down_sample=1.0)
    m_strict = strict.load_item(0)["mv_rays"][:, -1]
    m_lax = lax_ds.load_item(0)["mv_rays"][:, -1]
    # threshold 254 on a 255-valued mask still passes; on blended edge
    # pixels it must be no LESS strict than 127.5
    assert m_strict.sum() <= m_lax.sum()
    assert m_strict.sum() > 0
