"""RetinaFace detector variant, TPU-native.

Behavioral spec: the reference's ``RetinaFaceDetector``
(data_preprocessing/OpenSeeFace/retinaface.py:61-124) — 640² BGR-mean
preprocessing, an ONNX RetinaFace net producing (loc [N, 4], conf [N, 2]),
priorbox decode with variances (0.1, 0.2), score threshold, NMS, top-k, and
the (0.15, 0.2) crop margin expansion. The decode / NMS / margin math here
is a transcription of those cited lines; they are oracle-tested against the
reference module directly (tests/test_retinaface.py).

The net itself ships as an ONNX blob in the reference; its architecture is
the standard RetinaFace-MobileNet(0.25) detector (Deng et al. 2019) that the
blob was exported from: MobileNetV1-0.25 backbone (stages at /8, /16, /32),
a 3-level FPN, SSH context modules, and per-level class/bbox heads with 2
anchors per cell. ``apply_retinaface`` is an NHWC JAX re-implementation;
``convert_torch_retinaface`` imports the standard torch layout
(body.stageN / fpn / sshN / ClassHead / BboxHead); ``make_priorbox``
generates the 640² anchor set the reference loads from priorbox_640x640.json
(min_sizes [[16,32],[64,128],[256,512]], steps [8,16,32]).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Anchor generation + decode + NMS (numpy; spec retinaface.py:11-57,96-119)
# ---------------------------------------------------------------------------

MIN_SIZES = ((16, 32), (64, 128), (256, 512))
STEPS = (8, 16, 32)
VARIANCES = (0.1, 0.2)


def make_priorbox(res: Tuple[int, int] = (640, 640)) -> np.ndarray:
    """[N, 4] (cx, cy, w, h) anchors, normalized — the content of the
    reference's priorbox_640x640.json."""
    w, h = res
    out = []
    for sizes, step in zip(MIN_SIZES, STEPS):
        fh, fw = math.ceil(h / step), math.ceil(w / step)
        for i in range(fh):
            for j in range(fw):
                for m in sizes:
                    out.append([(j + 0.5) * step / w, (i + 0.5) * step / h,
                                m / w, m / h])
    return np.asarray(out, np.float32)


def decode_boxes(loc: np.ndarray, priors: np.ndarray,
                 variances=VARIANCES) -> np.ndarray:
    """Anchor-relative regression -> (x1, y1, x2, y2)
    (spec: retinaface.py:45-53)."""
    centers = priors[:, :2] + loc[:, :2] * variances[0] * priors[:, 2:]
    sizes = priors[:, 2:] * np.exp(loc[:, 2:] * variances[1])
    boxes = np.concatenate([centers, sizes], 1)
    boxes[:, :2] -= boxes[:, 2:] / 2
    boxes[:, 2:] += boxes[:, :2]
    return boxes


def nms(dets: np.ndarray, thresh: float) -> List[int]:
    """Greedy IoU NMS with the reference's +1 box-area convention
    (spec: retinaface.py:11-43)."""
    x1, y1, x2, y2, scores = dets.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep: List[int] = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


# ---------------------------------------------------------------------------
# The net (NHWC; params are BN-folded by the converter)
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1, groups=1, leaky: Optional[float] = None):
    w = p["w"]
    k = w.shape[0]
    pad = k // 2
    out = lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups) + p["b"]
    if leaky is not None:
        out = jnp.where(out >= 0, out, leaky * out)
    return out


def _conv_dw(x, p, stride):
    """MobileNetV1 depthwise-separable block: dw3x3 + pw1x1, each
    BN-folded + leaky 0.1."""
    h = _conv(x, p["dw"], stride=stride, groups=x.shape[-1], leaky=0.1)
    return _conv(h, p["pw"], leaky=0.1)


def _upsample_nearest(x, size):
    B, H, W, C = x.shape
    oh, ow = size
    iy = (jnp.arange(oh) * H) // oh
    ix = (jnp.arange(ow) * W) // ow
    return x[:, iy][:, :, ix]


def _ssh(x, p):
    """SSH context module: 3x3 ++ (5x5 as two 3x3) ++ (7x7 as three 3x3),
    relu on the concat."""
    c3 = _conv(x, p["c3"])
    c5_1 = _conv(x, p["c5_1"], leaky=0.1)
    c5 = _conv(c5_1, p["c5"])
    c7_1 = _conv(c5_1, p["c7_1"], leaky=0.1)
    c7 = _conv(c7_1, p["c7"])
    return jax.nn.relu(jnp.concatenate([c3, c5, c7], axis=-1))


def apply_retinaface(params: Dict[str, Any], x: jnp.ndarray):
    """[B, H, W, 3] mean-subtracted BGR input -> (loc [B, N, 4],
    conf [B, N, 2] softmaxed) with N = anchors in level-major,
    cell-major, anchor-minor order (matching the priorbox layout)."""
    # MobileNetV1-0.25 backbone
    h = _conv(x, params["stem"], stride=2, leaky=0.1)
    for i, (p, s) in enumerate(zip(params["stage1"], (1, 2, 1, 2, 1))):
        h = _conv_dw(h, p, s)
    s1 = h                                             # [B, /8, /8, 64·¼]
    for p, s in zip(params["stage2"], (2, 1, 1, 1, 1, 1)):
        h = _conv_dw(h, p, s)
    s2 = h                                             # /16
    for p, s in zip(params["stage3"], (2, 1)):
        h = _conv_dw(h, p, s)
    s3 = h                                             # /32

    # FPN (out 64ch): 1x1 laterals, nearest-upsample + add, 3x3 merges
    o1 = _conv(s1, params["fpn"]["out1"], leaky=0.1)
    o2 = _conv(s2, params["fpn"]["out2"], leaky=0.1)
    o3 = _conv(s3, params["fpn"]["out3"], leaky=0.1)
    o2 = o2 + _upsample_nearest(o3, o2.shape[1:3])
    o2 = _conv(o2, params["fpn"]["merge2"], leaky=0.1)
    o1 = o1 + _upsample_nearest(o2, o1.shape[1:3])
    o1 = _conv(o1, params["fpn"]["merge1"], leaky=0.1)

    feats = [_ssh(o1, params["ssh1"]), _ssh(o2, params["ssh2"]),
             _ssh(o3, params["ssh3"])]

    locs, confs = [], []
    for k, f in enumerate(feats):
        B = f.shape[0]
        loc = _conv(f, params["bbox_head"][k])          # [B, h, w, 2*4]
        conf = _conv(f, params["class_head"][k])        # [B, h, w, 2*2]
        locs.append(loc.reshape(B, -1, 4))
        confs.append(conf.reshape(B, -1, 2))
    loc = jnp.concatenate(locs, axis=1)
    conf = jax.nn.softmax(jnp.concatenate(confs, axis=1), axis=-1)
    return loc, conf


# ---------------------------------------------------------------------------
# Detector driver (spec: retinaface.py:81-119)
# ---------------------------------------------------------------------------

class JaxRetinaFaceDetector:
    """Drop-in for the reference ``RetinaFaceDetector.detect_retina``:
    returns (x, y, w, h) margin-expanded face boxes in frame pixels."""

    def __init__(self, params: Dict[str, Any], res: Tuple[int, int] = (640, 640),
                 min_conf: float = 0.4, nms_threshold: float = 0.4,
                 top_k: int = 1):
        self.res_w, self.res_h = res
        self.priorbox = make_priorbox(res)
        self.min_conf = min_conf
        self.nms_threshold = nms_threshold
        self.top_k = top_k
        self._apply = jax.jit(lambda x: apply_retinaface(params, x))

    @classmethod
    def from_onnx(cls, path: str, **kw) -> "JaxRetinaFaceDetector":
        """Weight-exact construction from the reference's shipped
        retinaface_640x640_opt.onnx, executed by preprocess/onnx_rt.py
        (outputs: loc [1,N,4], conf [1,N,2], landms — the reference consumes
        the first two, retinaface.py:96-97)."""
        from havatar_tpu.preprocess.onnx_rt import OnnxModel

        model = OnnxModel(path)
        det = cls.__new__(cls)
        det.res_w, det.res_h = 640, 640
        det.priorbox = make_priorbox((640, 640))
        det.min_conf = kw.get("min_conf", 0.4)
        det.nms_threshold = kw.get("nms_threshold", 0.4)
        det.top_k = kw.get("top_k", 1)
        det._apply = jax.jit(lambda x: model(
            jnp.transpose(x, (0, 3, 1, 2)))[:2])
        return det

    def detect(self, frame_rgb: np.ndarray) -> List[Tuple[float, ...]]:
        import cv2

        h, w = frame_rgb.shape[:2]
        im = cv2.resize(frame_rgb, (self.res_w, self.res_h),
                        interpolation=cv2.INTER_LINEAR).astype(np.float32)
        # the reference feeds BGR minus the (104, 117, 123) BGR means
        im = im[:, :, ::-1] - np.array((104.0, 117.0, 123.0), np.float32)
        loc, conf = self._apply(jnp.asarray(im[None]))
        loc = np.asarray(loc)[0]
        scores = np.asarray(conf)[0][:, 1]

        boxes = decode_boxes(loc, self.priorbox)
        scale = np.array((w, h, w, h), np.float32)
        boxes = boxes * scale

        inds = np.where(scores > self.min_conf)[0]
        dets = np.hstack([boxes[inds], scores[inds, None]]).astype(np.float32)
        keep = nms(dets, self.nms_threshold)
        dets = dets[keep][: self.top_k, 0:4]
        dets[:, 2:4] = dets[:, 2:4] - dets[:, 0:2]
        upsize = dets[:, 2:4] * np.array([[0.15, 0.2]])
        dets[:, 0:2] -= upsize
        dets[:, 2:4] += upsize * 2
        return list(map(tuple, dets))


# ---------------------------------------------------------------------------
# Weight conversion (standard PyTorch_Retinaface mobilenet0.25 layout)
# ---------------------------------------------------------------------------

def _fold(sd, conv_key, bn_key, eps=1e-5):
    w = np.asarray(sd[f"{conv_key}.weight"])
    gamma = np.asarray(sd[f"{bn_key}.weight"])
    beta = np.asarray(sd[f"{bn_key}.bias"])
    mean = np.asarray(sd[f"{bn_key}.running_mean"])
    var = np.asarray(sd[f"{bn_key}.running_var"])
    scale = gamma / np.sqrt(var + eps)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    return {"w": w.transpose(2, 3, 1, 0).astype(np.float32),
            "b": b.astype(np.float32)}


def _head(sd, key):
    return {"w": np.asarray(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)
            .astype(np.float32),
            "b": np.asarray(sd[f"{key}.bias"]).astype(np.float32)}


def convert_torch_retinaface(state_dict) -> Dict[str, Any]:
    """PyTorch_Retinaface (mobilenet0.25) state_dict -> params pytree.

    Naming: body.stage{1,2,3}.{i}.{j} Sequentials of (conv, bn, leaky),
    fpn.output{1,2,3}/merge{1,2}.0/.1, ssh{k}.conv3X3/.conv5X5_{1,2}/
    .conv7X7_{2,3}.0/.1, ClassHead.{k}.conv1x1, BboxHead.{k}.conv1x1.
    """
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    params["stem"] = _fold(sd, "body.stage1.0.0", "body.stage1.0.1")

    def dw_block(prefix):
        return {"dw": _fold(sd, f"{prefix}.0", f"{prefix}.1"),
                "pw": _fold(sd, f"{prefix}.3", f"{prefix}.4")}

    params["stage1"] = [dw_block(f"body.stage1.{i}") for i in range(1, 6)]
    params["stage2"] = [dw_block(f"body.stage2.{i}") for i in range(6)]
    params["stage3"] = [dw_block(f"body.stage3.{i}") for i in range(2)]
    params["fpn"] = {
        "out1": _fold(sd, "fpn.output1.0", "fpn.output1.1"),
        "out2": _fold(sd, "fpn.output2.0", "fpn.output2.1"),
        "out3": _fold(sd, "fpn.output3.0", "fpn.output3.1"),
        "merge1": _fold(sd, "fpn.merge1.0", "fpn.merge1.1"),
        "merge2": _fold(sd, "fpn.merge2.0", "fpn.merge2.1"),
    }
    for k in (1, 2, 3):
        params[f"ssh{k}"] = {
            "c3": _fold(sd, f"ssh{k}.conv3X3.0", f"ssh{k}.conv3X3.1"),
            "c5_1": _fold(sd, f"ssh{k}.conv5X5_1.0", f"ssh{k}.conv5X5_1.1"),
            "c5": _fold(sd, f"ssh{k}.conv5X5_2.0", f"ssh{k}.conv5X5_2.1"),
            "c7_1": _fold(sd, f"ssh{k}.conv7X7_2.0", f"ssh{k}.conv7X7_2.1"),
            "c7": _fold(sd, f"ssh{k}.conv7X7_3.0", f"ssh{k}.conv7X7_3.1"),
        }
    params["class_head"] = [_head(sd, f"ClassHead.{k}.conv1x1")
                            for k in range(3)]
    params["bbox_head"] = [_head(sd, f"BboxHead.{k}.conv1x1")
                           for k in range(3)]
    return params
