"""RetinaFace detector variant: anchor/decode/NMS parity against the
reference module (and its shipped priorbox json), and the NHWC net against a
hand-built torch chain in the standard PyTorch_Retinaface layout."""

import json
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from havatar_tpu.preprocess import retinaface as R

PRIORBOX_JSON = ("/root/reference/data_preprocessing/OpenSeeFace/models/"
                 "priorbox_640x640.json")


@pytest.fixture(scope="module")
def ref_mod():
    sys.modules.setdefault("onnxruntime", types.ModuleType("onnxruntime"))
    path = "/root/reference/data_preprocessing"
    if path not in sys.path:
        sys.path.insert(0, path)
    import OpenSeeFace.retinaface as ref

    return ref


def test_priorbox_matches_shipped_json():
    with open(PRIORBOX_JSON) as f:
        want = np.asarray(json.load(f), np.float32)
    got = R.make_priorbox((640, 640))
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_decode_matches_reference(ref_mod):
    rng = np.random.RandomState(0)
    priors = R.make_priorbox((640, 640))[:500]
    loc = rng.randn(500, 4).astype(np.float32) * 0.5
    want = ref_mod.decode(loc.copy(), priors.copy(), [0.1, 0.2])
    got = R.decode_boxes(loc.copy(), priors.copy())
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_nms_matches_reference(ref_mod):
    rng = np.random.RandomState(1)
    n = 200
    xy = rng.rand(n, 2) * 400
    wh = rng.rand(n, 2) * 120 + 10
    dets = np.hstack([xy, xy + wh, rng.rand(n, 1)]).astype(np.float32)
    want = ref_mod.py_cpu_nms(dets.copy(), 0.4)
    got = R.nms(dets.copy(), 0.4)
    assert got == list(want)


def _torch_retinaface_tiny():
    """Standard-layout torch RetinaFace (mobilenet0.25-shaped, tiny dims)
    — the oracle chain for apply_retinaface + convert_torch_retinaface."""
    torch.manual_seed(0)

    def conv_bn(i, o, s, k=3):
        return nn.Sequential(nn.Conv2d(i, o, k, s, k // 2, bias=False),
                             nn.BatchNorm2d(o), nn.LeakyReLU(0.1))

    def conv_dw(i, o, s):
        return nn.Sequential(
            nn.Conv2d(i, i, 3, s, 1, groups=i, bias=False),
            nn.BatchNorm2d(i), nn.LeakyReLU(0.1),
            nn.Conv2d(i, o, 1, bias=False), nn.BatchNorm2d(o),
            nn.LeakyReLU(0.1))

    class Model(nn.Module):
        def __init__(self, c=8, fp=16):
            super().__init__()
            self.c, self.fp = c, fp
            body = nn.Module()
            body.stage1 = nn.Sequential(
                conv_bn(3, c, 2), conv_dw(c, c * 2, 1), conv_dw(c * 2, c * 4, 2),
                conv_dw(c * 4, c * 4, 1), conv_dw(c * 4, c * 8, 2),
                conv_dw(c * 8, c * 8, 1))
            body.stage2 = nn.Sequential(*(
                [conv_dw(c * 8, c * 16, 2)]
                + [conv_dw(c * 16, c * 16, 1) for _ in range(5)]))
            body.stage3 = nn.Sequential(
                conv_dw(c * 16, c * 32, 2), conv_dw(c * 32, c * 32, 1))
            self.body = body
            fpn = nn.Module()
            fpn.output1 = conv_bn(c * 8, fp, 1, k=1)
            fpn.output2 = conv_bn(c * 16, fp, 1, k=1)
            fpn.output3 = conv_bn(c * 32, fp, 1, k=1)
            fpn.merge1 = conv_bn(fp, fp, 1)
            fpn.merge2 = conv_bn(fp, fp, 1)
            self.fpn = fpn

            def conv_no_act(i, o, k=3):
                return nn.Sequential(nn.Conv2d(i, o, k, 1, k // 2, bias=False),
                                     nn.BatchNorm2d(o))

            for k in (1, 2, 3):
                ssh = nn.Module()
                ssh.conv3X3 = conv_no_act(fp, fp // 2)
                ssh.conv5X5_1 = conv_bn(fp, fp // 4, 1)
                ssh.conv5X5_2 = conv_no_act(fp // 4, fp // 4)
                ssh.conv7X7_2 = conv_bn(fp // 4, fp // 4, 1)
                ssh.conv7X7_3 = conv_no_act(fp // 4, fp // 4)
                setattr(self, f"ssh{k}", ssh)
            self.ClassHead = nn.ModuleList(
                [nn.Module() for _ in range(3)])
            self.BboxHead = nn.ModuleList(
                [nn.Module() for _ in range(3)])
            for k in range(3):
                self.ClassHead[k].conv1x1 = nn.Conv2d(fp, 2 * 2, 1)
                self.BboxHead[k].conv1x1 = nn.Conv2d(fp, 2 * 4, 1)

        def _ssh(self, mod, x):
            c3 = mod.conv3X3(x)
            c5_1 = mod.conv5X5_1(x)
            c5 = mod.conv5X5_2(c5_1)
            c7 = mod.conv7X7_3(mod.conv7X7_2(c5_1))
            return F.relu(torch.cat([c3, c5, c7], dim=1))

        def forward(self, x):
            h = x
            for m in self.body.stage1:
                h = m(h)
            s1 = h
            for m in self.body.stage2:
                h = m(h)
            s2 = h
            for m in self.body.stage3:
                h = m(h)
            s3 = h
            o1, o2, o3 = (self.fpn.output1(s1), self.fpn.output2(s2),
                          self.fpn.output3(s3))
            o2 = o2 + F.interpolate(o3, size=o2.shape[2:], mode="nearest")
            o2 = self.fpn.merge2(o2)
            o1 = o1 + F.interpolate(o2, size=o1.shape[2:], mode="nearest")
            o1 = self.fpn.merge1(o1)
            feats = [self._ssh(self.ssh1, o1), self._ssh(self.ssh2, o2),
                     self._ssh(self.ssh3, o3)]
            locs, confs = [], []
            for k, f in enumerate(feats):
                loc = self.BboxHead[k].conv1x1(f)
                conf = self.ClassHead[k].conv1x1(f)
                locs.append(loc.permute(0, 2, 3, 1).reshape(1, -1, 4))
                confs.append(conf.permute(0, 2, 3, 1).reshape(1, -1, 2))
            return (torch.cat(locs, 1),
                    F.softmax(torch.cat(confs, 1), dim=-1))

    return Model().eval()


def test_net_matches_torch_chain():
    m = _torch_retinaface_tiny()
    # randomize BN stats so folding is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.copy_(torch.randn_like(mod.running_mean) * 0.1)
                mod.running_var.copy_(torch.rand_like(mod.running_var) + 0.5)
                mod.weight.copy_(torch.rand_like(mod.weight) + 0.5)
                mod.bias.copy_(torch.randn_like(mod.bias) * 0.1)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        want_loc, want_conf = m(x)

    params = R.convert_torch_retinaface(m.state_dict())
    got_loc, got_conf = R.apply_retinaface(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got_loc), want_loc.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_conf), want_conf.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_detector_driver_decodes_peak():
    """End-to-end driver on a mocked net: a single confident anchor decodes
    to the margin-expanded (x, y, w, h) box the reference math implies."""
    priors = R.make_priorbox((640, 640))
    idx = 5000

    class FakeDetector(R.JaxRetinaFaceDetector):
        def __init__(self):
            self.res_w = self.res_h = 640
            self.priorbox = priors
            self.min_conf, self.nms_threshold, self.top_k = 0.4, 0.4, 1

            def apply(x):
                loc = jnp.zeros((1, priors.shape[0], 4))
                conf = jnp.full((1, priors.shape[0], 2), 0.01)
                conf = conf.at[0, idx, 1].set(0.95)
                return loc, conf

            self._apply = apply

    det = FakeDetector()
    frame = np.zeros((480, 640, 3), np.uint8)
    out = det.detect(frame)
    assert len(out) == 1
    x, y, w, h = out[0]
    cx, cy, pw, ph = priors[idx]
    bw, bh = pw * 640, ph * 480
    exp_w = bw * (1 + 2 * 0.15)
    exp_h = bh * (1 + 2 * 0.2)
    np.testing.assert_allclose(w, exp_w, rtol=1e-5)
    np.testing.assert_allclose(h, exp_h, rtol=1e-5)
    np.testing.assert_allclose(x, cx * 640 - bw / 2 - 0.15 * bw, rtol=1e-4)
    np.testing.assert_allclose(y, cy * 480 - bh / 2 - 0.2 * bh, rtol=1e-4)
