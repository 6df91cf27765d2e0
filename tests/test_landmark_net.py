"""Tests for the JAX OpenSeeFace landmark net (preprocess/landmark_net.py).

The geffnet-based torch port in the reference can't run here (geffnet is not
installed), so each building block is oracle-tested against a hand-built
torch chain with the SAME parameters (Conv2d/BatchNorm2d/activations), and
the converter is exercised on synthetic state_dicts in the exact geffnet
naming layout. The decode is checked against an analytic heatmap.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from havatar_tpu.preprocess import landmark_net as L


def nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def bn_dict(bn, prefix):
    return {f"{prefix}.weight": bn.weight.detach().numpy(),
            f"{prefix}.bias": bn.bias.detach().numpy(),
            f"{prefix}.running_mean": bn.running_mean.numpy(),
            f"{prefix}.running_var": bn.running_var.numpy()}


def rand_bn(ch):
    bn = nn.BatchNorm2d(ch).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.rand(ch) + 0.5)
        bn.bias.copy_(torch.randn(ch) * 0.1)
        bn.running_mean.copy_(torch.randn(ch) * 0.1)
        bn.running_var.copy_(torch.rand(ch) + 0.5)
    return bn


def hard_swish_t(x):
    return x * F.relu6(x + 3.0) / 6.0


def test_inverted_residual_se_block_matches_torch():
    """IR block w/ SE: pw-expand -> dw -> SE -> pw-linear (+residual),
    BN folded by the converter; torch chain is the oracle."""
    torch.manual_seed(0)
    cin, mid, cout, k, stride = 24, 72, 24, 5, 1
    conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
    bn1 = rand_bn(mid)
    conv_dw = nn.Conv2d(mid, mid, k, stride, k // 2, groups=mid, bias=False)
    bn2 = rand_bn(mid)
    rd = L.make_divisible(mid * 0.25)
    conv_reduce = nn.Conv2d(mid, rd, 1)
    conv_expand = nn.Conv2d(rd, mid, 1)
    conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
    bn3 = rand_bn(cout)

    x = torch.randn(2, cin, 14, 14)
    with torch.no_grad():
        h = F.relu(bn1(conv_pw(x)))
        h = F.relu(bn2(conv_dw(h)))
        s = h.mean((2, 3), keepdim=True)
        s = F.relu(conv_reduce(s))
        s = F.relu6(conv_expand(s) + 3.0) / 6.0
        h = h * s
        h = bn3(conv_pwl(h))
        want = (h + x).numpy().transpose(0, 2, 3, 1)

    sd = {"blocks.0.0.conv_pw.weight": conv_pw.weight.detach().numpy(),
          "blocks.0.0.conv_dw.weight": conv_dw.weight.detach().numpy(),
          "blocks.0.0.conv_pwl.weight": conv_pwl.weight.detach().numpy(),
          "blocks.0.0.se.conv_reduce.weight": conv_reduce.weight.detach().numpy(),
          "blocks.0.0.se.conv_reduce.bias": conv_reduce.bias.detach().numpy(),
          "blocks.0.0.se.conv_expand.weight": conv_expand.weight.detach().numpy(),
          "blocks.0.0.se.conv_expand.bias": conv_expand.bias.detach().numpy()}
    sd.update(bn_dict(bn1, "blocks.0.0.bn1"))
    sd.update(bn_dict(bn2, "blocks.0.0.bn2"))
    sd.update(bn_dict(bn3, "blocks.0.0.bn3"))

    p = {}
    p["pw_w"], p["pw_b"] = L._fold_bn(sd["blocks.0.0.conv_pw.weight"],
                                      L._bn(sd, "blocks.0.0.bn1"))
    p["dw_w"], p["dw_b"] = L._fold_bn(sd["blocks.0.0.conv_dw.weight"],
                                      L._bn(sd, "blocks.0.0.bn2"))
    p["se"] = L._se(sd, "blocks.0.0.se")
    p["pwl_w"], p["pwl_b"] = L._fold_bn(sd["blocks.0.0.conv_pwl.weight"],
                                        L._bn(sd, "blocks.0.0.bn3"))
    spec = ("ir", k, stride, 3.0, cout, True, "relu")
    got = L._block(nhwc(x), p, spec)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_ds_head_and_unet_up_match_torch():
    """DSConv2d(old=0) + UNetUp upsample(align_corners=True)."""
    torch.manual_seed(1)
    cin, res_ch, cout = 32, 16, 24
    dsin = cin + res_ch
    conv_dw = nn.Conv2d(dsin, dsin, 3, 1, 1, groups=dsin, bias=False)
    bn1 = rand_bn(dsin)
    conv_pw = nn.Conv2d(dsin, cout, 1, bias=False)
    bn2 = rand_bn(cout)

    x1 = torch.randn(1, cin, 7, 7)     # to be upsampled to 14x14
    x2 = torch.randn(1, res_ch, 14, 14)
    with torch.no_grad():
        up = F.interpolate(x1, size=(14, 14), mode="bilinear",
                           align_corners=True)
        h = torch.cat([x2, up], dim=1)
        h = F.relu6(bn1(conv_dw(h)))
        want = F.relu6(bn2(conv_pw(h))).numpy().transpose(0, 2, 3, 1)

    sd = {"up1.conv.conv.0.weight": conv_dw.weight.detach().numpy(),
          "up1.conv.conv.3.weight": conv_pw.weight.detach().numpy()}
    sd.update(bn_dict(bn1, "up1.conv.conv.1"))
    sd.update(bn_dict(bn2, "up1.conv.conv.4"))
    p = L._ds_head_params(sd, "up1.conv.conv")

    got = L.unet_up(nhwc(x1), nhwc(x2), p, (14, 14))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_grouped_head_matches_torch():
    """The final DSConv2d(198 -> 198, kernels_per_layer=4, groups=3)."""
    torch.manual_seed(2)
    cin, kpl, groups = 198, 4, 3
    conv_dw = nn.Conv2d(cin, cin * kpl, 3, 1, 1, groups=cin, bias=False)
    bn1 = rand_bn(cin * kpl)
    conv_pw = nn.Conv2d(cin * kpl, cin, 1, groups=groups, bias=False)
    bn2 = rand_bn(cin)

    x = torch.randn(1, cin, 7, 7)
    with torch.no_grad():
        h = F.relu6(bn1(conv_dw(x)))
        want = F.relu6(bn2(conv_pw(h))).numpy().transpose(0, 2, 3, 1)

    sd = {"group.conv.0.weight": conv_dw.weight.detach().numpy(),
          "group.conv.3.weight": conv_pw.weight.detach().numpy()}
    sd.update(bn_dict(bn1, "group.conv.1"))
    sd.update(bn_dict(bn2, "group.conv.4"))
    p = L._ds_head_params(sd, "group.conv")
    got = L.ds_head(nhwc(x), p, groups_pw=groups)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_ds_block_stride2_and_stem_padding():
    """DepthwiseSeparable stride-2 + SE with relu (small stage 0), and the
    stride-2 stem with torch k//2 padding on even inputs."""
    torch.manual_seed(3)
    cin = 16
    conv_dw = nn.Conv2d(cin, cin, 3, 2, 1, groups=cin, bias=False)
    bn1 = rand_bn(cin)
    rd = L.make_divisible(cin * 0.25)
    conv_reduce, conv_expand = nn.Conv2d(cin, rd, 1), nn.Conv2d(rd, cin, 1)
    conv_pw = nn.Conv2d(cin, cin, 1, bias=False)
    bn2 = rand_bn(cin)

    x = torch.randn(1, cin, 56, 56)
    with torch.no_grad():
        h = F.relu(bn1(conv_dw(x)))
        s = h.mean((2, 3), keepdim=True)
        s = F.relu6(conv_expand(F.relu(conv_reduce(s))) + 3.0) / 6.0
        h = h * s
        want = bn2(conv_pw(h)).numpy().transpose(0, 2, 3, 1)
        # stride-2, same in/out ch but stride != 1 -> NO residual

    sd = {"b.conv_dw.weight": conv_dw.weight.detach().numpy(),
          "b.conv_pw.weight": conv_pw.weight.detach().numpy(),
          "b.se.conv_reduce.weight": conv_reduce.weight.detach().numpy(),
          "b.se.conv_reduce.bias": conv_reduce.bias.detach().numpy(),
          "b.se.conv_expand.weight": conv_expand.weight.detach().numpy(),
          "b.se.conv_expand.bias": conv_expand.bias.detach().numpy()}
    sd.update(bn_dict(bn1, "b.bn1"))
    sd.update(bn_dict(bn2, "b.bn2"))
    p = {}
    p["dw_w"], p["dw_b"] = L._fold_bn(sd["b.conv_dw.weight"], L._bn(sd, "b.bn1"))
    p["se"] = L._se(sd, "b.se")
    p["pw_w"], p["pw_b"] = L._fold_bn(sd["b.conv_pw.weight"], L._bn(sd, "b.bn2"))
    got = L._block(nhwc(x), p, ("ds", 3, 2, 1.0, cin, True, "relu"))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("model_type", [0, 1, 2, 3])
def test_full_net_shapes(model_type):
    rng = np.random.RandomState(0)
    params = L.init_landmark_params(rng, model_type)
    x = jnp.asarray(rng.randn(1, 224, 224, 3).astype(np.float32))
    hm = L.apply_landmark_net(params, x, model_type)
    assert hm.shape == (1, 28, 28, 198)
    assert np.isfinite(np.asarray(hm)).all()


def test_decode_analytic_heatmap():
    """Peak at heatmap cell (r, c) with known offset logits decodes to the
    exact pixel position (spec: tracker.py:731-761)."""
    r, c = 10, 20
    factor = 16.0
    off_frac_x, off_frac_y = 0.25, -0.1   # in pixels/223
    hm = np.zeros((28, 28, 198), np.float32)
    hm[..., 0:66] = 0.1
    hm[r, c, 0:66] = 0.9
    # offsets stored as sigmoid(factor * offset/223)
    hm[r, c, 66:132] = 1.0 / (1.0 + np.exp(-factor * off_frac_x))
    hm[r, c, 132:198] = 1.0 / (1.0 + np.exp(-factor * off_frac_y))

    conf, lms = L.decode_landmarks(hm)
    assert abs(conf - 0.9) < 1e-6
    want_y = 223.0 * r / 27.0 + 223.0 * off_frac_x
    want_x = 223.0 * c / 27.0 + 223.0 * off_frac_y
    np.testing.assert_allclose(lms[:, 0], want_y, atol=1e-3)
    np.testing.assert_allclose(lms[:, 1], want_x, atol=1e-3)
    np.testing.assert_allclose(lms[:, 2], 0.9, atol=1e-6)


def test_ds_head_old1_matches_torch():
    """Detection-net DSConv2d old=1: dw -> BN -> pw -> BN -> relu6 (single
    trailing activation; model.py:110-116)."""
    torch.manual_seed(5)
    cin, cout = 24, 16
    conv_dw = nn.Conv2d(cin, cin * 4, 3, 1, 1, groups=cin, bias=False)
    bn1 = rand_bn(cin * 4)
    conv_pw = nn.Conv2d(cin * 4, cout, 1, groups=2, bias=False)
    bn2 = rand_bn(cout)
    x = torch.randn(1, cin, 14, 14)
    with torch.no_grad():
        h = bn1(conv_dw(x))             # NO activation after dw in old=1
        want = F.relu6(bn2(conv_pw(h))).numpy().transpose(0, 2, 3, 1)

    sd = {"group.conv.0.weight": conv_dw.weight.detach().numpy(),
          "group.conv.2.weight": conv_pw.weight.detach().numpy()}
    sd.update(bn_dict(bn1, "group.conv.1"))
    sd.update(bn_dict(bn2, "group.conv.3"))
    p = L._ds_head_old1_params(sd, "group.conv")
    got = L.ds_head_old1(nhwc(x), p, groups_pw=2)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_detection_decode_analytic():
    """A single confidence peak decodes to the reference's box arithmetic
    (tracker.py:713-729) with peak-NMS via maxpool equality."""
    maps = np.zeros((56, 56, 2), np.float32)
    y, x, c, r_norm = 20, 30, 0.9, 0.25
    maps[y, x, 0] = c
    maps[y - 1, x, 0] = 0.5       # non-peak neighbour must be NMS'd away
    maps[y, x, 1] = r_norm
    mp = np.zeros_like(maps)
    # maxpool: neighbourhood max
    for yy in range(56):
        for xx in range(56):
            mp[yy, xx, 0] = maps[max(0, yy - 1):yy + 2,
                                 max(0, xx - 1):xx + 2, 0].max()
    boxes = L.decode_detections(maps, mp, frame_hw=(448, 448), max_faces=4,
                                threshold=0.6)
    assert boxes.shape == (1, 4)
    r = r_norm * 112.0
    np.testing.assert_allclose(
        boxes[0], [(x * 4 - r) * 2, (y * 4 - r) * 2, 2 * r * 2, 2 * r * 2],
        rtol=1e-5)


def test_detection_net_converter_roundtrip():
    """Synthetic geffnet-layout OpenSeeFaceDetect state_dict (large, 0.1)
    converts and runs to [1, 56, 56, 2] + maxpool."""
    torch.manual_seed(6)
    table, cm, r1_i, r2_i, r3_i = L.detect_arch("large", 0.1)
    sd = {}
    stem = L.round_channels(16, cm)
    sd["conv_stem.weight"] = torch.randn(stem, 3, 3, 3).numpy() * 0.1
    sd.update(bn_dict(rand_bn(stem), "bn1"))
    cin = stem
    stage_out = []
    for si, stage in enumerate(table):
        for bi, spec in enumerate(stage):
            btype, k, stride, e, cch, has_se, _ = spec
            cout = L.round_channels(cch, cm)
            pre = f"blocks.{si}.{bi}"
            if btype == "cn":
                sd[f"{pre}.conv.weight"] = torch.randn(cout, cin, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn1"))
            elif btype == "ds":
                sd[f"{pre}.conv_dw.weight"] = torch.randn(cin, 1, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cin), f"{pre}.bn1"))
                if has_se:
                    rd = L.make_divisible(cin * 0.25)
                    sd[f"{pre}.se.conv_reduce.weight"] = torch.randn(rd, cin, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_reduce.bias"] = torch.randn(rd).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.weight"] = torch.randn(cin, rd, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.bias"] = torch.randn(cin).numpy() * 0.1
                sd[f"{pre}.conv_pw.weight"] = torch.randn(cout, cin, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn2"))
            else:
                mid = L.make_divisible(cin * e)
                sd[f"{pre}.conv_pw.weight"] = torch.randn(mid, cin, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(mid), f"{pre}.bn1"))
                sd[f"{pre}.conv_dw.weight"] = torch.randn(mid, 1, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(mid), f"{pre}.bn2"))
                if has_se:
                    rd = L.make_divisible(mid * 0.25)
                    sd[f"{pre}.se.conv_reduce.weight"] = torch.randn(rd, mid, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_reduce.bias"] = torch.randn(rd).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.weight"] = torch.randn(mid, rd, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.bias"] = torch.randn(mid).numpy() * 0.1
                sd[f"{pre}.conv_pwl.weight"] = torch.randn(cout, mid, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn3"))
            cin = cout
        stage_out.append(cin)

    def head_sd_old1(prefix, hin, hout, kpl=1, groups=1):
        sd[f"{prefix}.0.weight"] = torch.randn(hin * kpl, 1, 3, 3).numpy() * 0.1
        sd.update(bn_dict(rand_bn(hin * kpl), f"{prefix}.1"))
        sd[f"{prefix}.2.weight"] = torch.randn(
            hout, hin * kpl // groups, 1, 1).numpy() * 0.1
        sd.update(bn_dict(rand_bn(hout), f"{prefix}.3"))

    head_sd_old1("up1.conv.conv", cin + stage_out[r3_i], 256)
    head_sd_old1("up2.conv.conv", 256 + stage_out[r2_i], 128)
    head_sd_old1("up3.conv.conv", 128 + stage_out[r1_i], 64)
    head_sd_old1("group.conv", 64, 2, kpl=4, groups=2)

    params = L.convert_torch_detection_model(sd, "large", 0.1)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 224, 224, 3)
                    .astype(np.float32))
    maps, mp = L.apply_detection_net(params, x, "large", 0.1)
    assert maps.shape == (1, 56, 56, 2) and mp.shape == (1, 56, 56, 2)
    assert np.isfinite(np.asarray(maps)).all()
    # maxpool dominates the raw map pointwise
    assert float((np.asarray(mp) - np.asarray(maps)).min()) >= -1e-6


def test_converter_roundtrip_full_model():
    """A synthetic geffnet-layout state_dict for model_type=1 (small 1.0)
    converts without missing keys and the net runs."""
    torch.manual_seed(4)
    table, cm, _, _ = L.lm_arch(1)
    sd = {}
    stem = L.round_channels(16, cm)
    sd["conv_stem.weight"] = torch.randn(stem, 3, 3, 3).numpy() * 0.1
    sd.update(bn_dict(rand_bn(stem), "bn1"))
    cin = stem
    stage_out = []
    for si, stage in enumerate(table):
        for bi, spec in enumerate(stage):
            btype, k, stride, e, cch, has_se, _ = spec
            cout = L.round_channels(cch, cm)
            pre = f"blocks.{si}.{bi}"
            if btype == "cn":
                sd[f"{pre}.conv.weight"] = torch.randn(cout, cin, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn1"))
            elif btype == "ds":
                sd[f"{pre}.conv_dw.weight"] = torch.randn(cin, 1, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cin), f"{pre}.bn1"))
                if has_se:
                    rd = L.make_divisible(cin * 0.25)
                    sd[f"{pre}.se.conv_reduce.weight"] = torch.randn(rd, cin, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_reduce.bias"] = torch.randn(rd).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.weight"] = torch.randn(cin, rd, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.bias"] = torch.randn(cin).numpy() * 0.1
                sd[f"{pre}.conv_pw.weight"] = torch.randn(cout, cin, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn2"))
            else:
                mid = L.make_divisible(cin * e)
                sd[f"{pre}.conv_pw.weight"] = torch.randn(mid, cin, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(mid), f"{pre}.bn1"))
                sd[f"{pre}.conv_dw.weight"] = torch.randn(mid, 1, k, k).numpy() * 0.1
                sd.update(bn_dict(rand_bn(mid), f"{pre}.bn2"))
                if has_se:
                    rd = L.make_divisible(mid * 0.25)
                    sd[f"{pre}.se.conv_reduce.weight"] = torch.randn(rd, mid, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_reduce.bias"] = torch.randn(rd).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.weight"] = torch.randn(mid, rd, 1, 1).numpy() * 0.1
                    sd[f"{pre}.se.conv_expand.bias"] = torch.randn(mid).numpy() * 0.1
                sd[f"{pre}.conv_pwl.weight"] = torch.randn(cout, mid, 1, 1).numpy() * 0.1
                sd.update(bn_dict(rand_bn(cout), f"{pre}.bn3"))
            cin = cout
        stage_out.append(cin)

    _, _, r2_i, r3_i = L.lm_arch(1)

    def head_sd(prefix, hin, hout, kpl=1, groups=1):
        sd[f"{prefix}.0.weight"] = torch.randn(hin * kpl, 1, 3, 3).numpy() * 0.1
        sd.update(bn_dict(rand_bn(hin * kpl), f"{prefix}.1"))
        sd[f"{prefix}.3.weight"] = torch.randn(
            hout, hin * kpl // groups, 1, 1).numpy() * 0.1
        sd.update(bn_dict(rand_bn(hout), f"{prefix}.4"))

    head_sd("up1.conv.conv", cin + stage_out[r3_i], 256)
    head_sd("up2.conv.conv", 256 + stage_out[r2_i], 198)
    head_sd("group.conv", 198, 198, kpl=4, groups=3)

    params = L.convert_torch_landmark_model(sd, model_type=1)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 224, 224, 3)
                    .astype(np.float32))
    hm = L.apply_landmark_net(params, x, 1)
    assert hm.shape == (1, 28, 28, 198)
    assert np.isfinite(np.asarray(hm)).all()
