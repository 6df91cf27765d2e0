"""Minimal ONNX runtime on JAX: protobuf wire-format parser + op executor.

Why this exists: the reference pipeline drives its face tracker through
onnxruntime sessions over shipped .onnx blobs (OpenSeeFace/tracker.py:
498-560, retinaface.py:61-80). This environment has no onnxruntime/onnx
packages — but ONNX is plain protobuf, and the model zoo here uses a small
mobile-net-era op set. This module parses ModelProto directly off the wire
(field numbers from the stable onnx.proto3 schema) and executes the graph
with jax/XLA ops, so the REAL reference models run on CPU or TPU with no
external dependency. The rebuilt native nets (landmark_net.py,
retinaface.py) remain the primary path; this is the weight-exact fallback
and the oracle source for them.

Scope: inference, static shapes, single output set; the op coverage is the
union of what the OpenSeeFace blobs use (Conv, BN-free folded convs,
Clip/Relu/LeakyRelu/Sigmoid/HardSigmoid/HardSwish, Add/Mul/Div/Sub,
GlobalAveragePool/AveragePool/MaxPool, Resize/Upsample, Concat, Reshape,
Transpose, Softmax, Gemm/MatMul, Flatten, ReduceMean, Exp, Slice, Split,
Shape/Gather/Unsqueeze/Cast/Constant for shape plumbing).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Protobuf wire parsing (only what ModelProto needs)
# ---------------------------------------------------------------------------


def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) triples; value is int for
    varint/fixed, memoryview for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32,
           7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64}


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = 1
    name = ""
    raw: Optional[bytes] = None
    float_data: List[float] = []
    int_data: List[int] = []
    for fnum, wtype, val in _fields(buf):
        if fnum == 1:
            dims.append(val)
        elif fnum == 2:
            dtype = val
        elif fnum == 4:      # packed float_data
            float_data.extend(np.frombuffer(bytes(val), "<f4"))
        elif fnum in (5, 7):  # packed int32/int64 varints
            p = 0
            mv = memoryview(val)
            while p < len(mv):
                v, p = _read_varint(mv, p)
                int_data.append(v)
        elif fnum == 8:
            name = bytes(val).decode()
        elif fnum == 9:
            raw = bytes(val)
    np_dt = _DTYPES[dtype]
    if raw is not None:
        arr = np.frombuffer(raw, np_dt)
    elif float_data:
        arr = np.asarray(float_data, np_dt)
    else:
        arr = np.asarray(int_data).astype(np_dt)
    return name, arr.reshape(dims) if dims else arr


@dataclass
class OnnxNode:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    attrs: Dict[str, Any]


@dataclass
class OnnxGraph:
    nodes: List[OnnxNode]
    initializers: Dict[str, np.ndarray]
    inputs: List[str]          # graph inputs that are NOT initializers
    outputs: List[str]
    input_shapes: Dict[str, List[int]] = field(default_factory=dict)


def _parse_attr(buf: memoryview) -> Tuple[str, Any]:
    name = ""
    val: Any = None
    ints: List[int] = []
    floats: List[float] = []
    for fnum, wtype, v in _fields(buf):
        if fnum == 1:
            name = bytes(v).decode()
        elif fnum == 2:
            val = struct.unpack("<f", struct.pack("<I", v))[0]
        elif fnum == 3:
            # varint is two's-complement-encoded for negative ints
            val = v - (1 << 64) if v >= (1 << 63) else v
        elif fnum == 4:
            val = bytes(v).decode(errors="replace")
        elif fnum == 5:
            val = _parse_tensor(v)[1]
        elif fnum == 7:
            if wtype == 2:   # packed
                floats.extend(np.frombuffer(bytes(v), "<f4"))
            else:
                floats.append(struct.unpack("<f", struct.pack("<I", v))[0])
        elif fnum == 8:
            if wtype == 2:   # packed varints
                p = 0
                mv = memoryview(v)
                while p < len(mv):
                    x, p = _read_varint(mv, p)
                    ints.append(x - (1 << 64) if x >= (1 << 63) else x)
            else:
                ints.append(v - (1 << 64) if v >= (1 << 63) else v)
    if ints:
        val = ints
    elif floats:
        val = floats
    return name, val


def _parse_node(buf: memoryview) -> OnnxNode:
    node = OnnxNode("", [], [], {})
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            node.inputs.append(bytes(val).decode())
        elif fnum == 2:
            node.outputs.append(bytes(val).decode())
        elif fnum == 4:
            node.op_type = bytes(val).decode()
        elif fnum == 5:
            k, v = _parse_attr(val)
            node.attrs[k] = v
    return node


def _parse_value_info(buf: memoryview) -> Tuple[str, List[int]]:
    name = ""
    dims: List[int] = []
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            name = bytes(val).decode()
        elif fnum == 2:          # TypeProto
            for f2, _, v2 in _fields(val):
                if f2 == 1:      # tensor_type
                    for f3, _, v3 in _fields(v2):
                        if f3 == 2:   # shape (TensorShapeProto)
                            for f4, _, v4 in _fields(v3):
                                if f4 == 1:   # dim
                                    dv = 0
                                    for f5, _, v5 in _fields(v4):
                                        if f5 == 1:
                                            dv = v5
                                    dims.append(dv)
    return name, dims


def parse_onnx(path: str) -> OnnxGraph:
    with open(path, "rb") as f:
        data = memoryview(f.read())
    graph_buf = None
    for fnum, _, val in _fields(data):
        if fnum == 7:
            graph_buf = val
    if graph_buf is None:
        raise ValueError("no GraphProto in model")
    nodes: List[OnnxNode] = []
    inits: Dict[str, np.ndarray] = {}
    g_inputs: List[Tuple[str, List[int]]] = []
    g_outputs: List[str] = []
    for fnum, _, val in _fields(graph_buf):
        if fnum == 1:
            nodes.append(_parse_node(val))
        elif fnum == 5:
            name, arr = _parse_tensor(val)
            inits[name] = arr
        elif fnum == 11:
            g_inputs.append(_parse_value_info(val))
        elif fnum == 12:
            g_outputs.append(_parse_value_info(val)[0])
    inputs = [n for n, _ in g_inputs if n not in inits]
    shapes = {n: d for n, d in g_inputs if n not in inits}
    return OnnxGraph(nodes, inits, inputs, g_outputs, shapes)


# ---------------------------------------------------------------------------
# Executor (NCHW semantics preserved; jax.jit-able)
# ---------------------------------------------------------------------------

def _auto_pad(attrs, kh, kw):
    pads = attrs.get("pads", [0, 0, 0, 0])
    ap = attrs.get("auto_pad", "NOTSET")
    if ap in ("SAME_UPPER", "SAME_LOWER"):
        # stride-1 SAME for the mobile nets here; general case unneeded
        ph, pw = (kh - 1), (kw - 1)
        lo_h, lo_w = ph // 2, pw // 2
        if ap == "SAME_LOWER":
            lo_h, lo_w = ph - ph // 2, pw - pw // 2
        return [(lo_h, ph - lo_h), (lo_w, pw - lo_w)]
    return [(pads[0], pads[2]), (pads[1], pads[3])]


def _np_like(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, list, tuple))


def _run_node(node: OnnxNode, vals: Dict[str, Any]):
    import jax
    import jax.numpy as jnp
    from jax import lax

    op = node.op_type
    a = node.attrs
    x = [vals[n] if n else None for n in node.inputs]
    # shape-plumbing stays in NUMPY: under jit, jnp ops are staged even on
    # concrete operands (jax>=0.8 traces everything), which would turn
    # static Shape->Slice->Concat chains into tracers and break the static
    # sizes that Conv/Resize/Reshape need
    all_np = all(v is None or _np_like(v) for v in x)

    def out(v):
        vals[node.outputs[0]] = v

    if op in ("Conv", "FusedConv"):
        w = x[1]
        kh, kw = w.shape[2], w.shape[3]
        groups = a.get("group", 1)
        strides = a.get("strides", [1, 1])
        pads = _auto_pad(a, kh, kw)
        y = lax.conv_general_dilated(
            x[0], w, tuple(strides), pads,
            rhs_dilation=tuple(a.get("dilations", [1, 1])),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups)
        if len(x) > 2 and x[2] is not None:
            y = y + x[2].reshape(1, -1, 1, 1)
        if op == "FusedConv":
            # onnxruntime's com.microsoft fusion: Conv + activation
            act = a.get("activation", "")
            ap = a.get("activation_params", [])
            if act == "Relu":
                y = jax.nn.relu(y)
            elif act == "LeakyRelu":
                alpha = ap[0] if ap else 0.01
                y = jnp.where(y >= 0, y, alpha * y)
            elif act == "Clip":
                y = jnp.clip(y, ap[0], ap[1])
            elif act == "Sigmoid":
                y = jax.nn.sigmoid(y)
            elif act == "Tanh":
                y = jnp.tanh(y)
            elif act == "HardSigmoid":
                al = ap[0] if ap else 0.2
                be = ap[1] if len(ap) > 1 else 0.5
                y = jnp.clip(al * y + be, 0.0, 1.0)
            elif act:
                raise NotImplementedError(f"FusedConv activation {act}")
        out(y)
    elif op in ("Relu",):
        out(jax.nn.relu(x[0]))
    elif op == "LeakyRelu":
        out(jnp.where(x[0] >= 0, x[0], a.get("alpha", 0.01) * x[0]))
    elif op == "Clip":
        lo = a.get("min", x[1] if len(x) > 1 and x[1] is not None else -jnp.inf)
        hi = a.get("max", x[2] if len(x) > 2 and x[2] is not None else jnp.inf)
        out(jnp.clip(x[0], lo, hi))
    elif op == "Sigmoid":
        out(jax.nn.sigmoid(x[0]))
    elif op == "HardSigmoid":
        al, be = a.get("alpha", 0.2), a.get("beta", 0.5)
        out(jnp.clip(al * x[0] + be, 0.0, 1.0))
    elif op == "HardSwish":
        out(x[0] * jnp.clip(x[0] / 6.0 + 0.5, 0.0, 1.0))
    elif op in ("Add", "Sum"):
        out(x[0] + x[1])  # np+np stays np; mixed promotes to jax
    elif op == "Sub":
        out(x[0] - x[1])
    elif op == "Mul":
        out(x[0] * x[1])
    elif op == "Div":
        out(x[0] / x[1])
    elif op == "Exp":
        out(jnp.exp(x[0]))
    elif op == "Sqrt":
        out(jnp.sqrt(x[0]))
    elif op == "GlobalAveragePool":
        out(jnp.mean(x[0], axis=(2, 3), keepdims=True))
    elif op == "ReduceMean":
        axes = tuple(a.get("axes", [2, 3]))
        out(jnp.mean(x[0], axis=axes, keepdims=bool(a.get("keepdims", 1))))
    elif op in ("AveragePool", "MaxPool"):
        kh, kw = a["kernel_shape"]
        strides = tuple(a.get("strides", [1, 1]))
        pads = _auto_pad(a, kh, kw)
        pad4 = [(0, 0), (0, 0)] + pads
        if op == "MaxPool":
            out(lax.reduce_window(x[0], -jnp.inf, lax.max,
                                  (1, 1, kh, kw), (1, 1) + strides, pad4))
        else:
            s = lax.reduce_window(x[0], 0.0, lax.add, (1, 1, kh, kw),
                                  (1, 1) + strides, pad4)
            cnt = lax.reduce_window(jnp.ones_like(x[0]), 0.0, lax.add,
                                    (1, 1, kh, kw), (1, 1) + strides, pad4)
            out(s / cnt)
    elif op in ("Resize", "Upsample"):
        xin = x[0]
        mode = a.get("mode", "nearest")
        if op == "Resize":
            sizes = x[3] if len(x) > 3 and x[3] is not None else None
            scales = x[2] if len(x) > 2 and x[2] is not None else None
        else:
            sizes, scales = None, x[1]
        if sizes is not None:
            oh, ow = int(sizes[2]), int(sizes[3])
        else:
            sc = np.asarray(scales)
            oh = int(round(xin.shape[2] * float(sc[2])))
            ow = int(round(xin.shape[3] * float(sc[3])))
        if mode.startswith("nearest"):
            iy = (jnp.arange(oh) * xin.shape[2]) // oh
            ix = (jnp.arange(ow) * xin.shape[3]) // ow
            out(xin[:, :, iy][:, :, :, ix])
        else:
            ct = a.get("coordinate_transformation_mode", "half_pixel")
            method = "linear"
            if ct == "align_corners":
                from havatar_tpu.preprocess.landmark_net import (
                    upsample_align_corners,
                )

                y = upsample_align_corners(
                    jnp.transpose(xin, (0, 2, 3, 1)), (oh, ow))
                out(jnp.transpose(y, (0, 3, 1, 2)))
            else:
                import jax.image

                out(jax.image.resize(
                    xin, (xin.shape[0], xin.shape[1], oh, ow), method))
    elif op == "Concat":
        if all_np:
            out(np.concatenate([np.asarray(v) for v in x], axis=a["axis"]))
        else:
            out(jnp.concatenate([jnp.asarray(v) for v in x],
                                axis=a["axis"]))
    elif op == "Reshape":
        shape = [int(s) for s in np.asarray(x[1])]
        cur = x[0]
        shape = [cur.shape[i] if s == 0 else s for i, s in enumerate(shape)]
        out(jnp.reshape(cur, shape))
    elif op == "Flatten":
        ax = a.get("axis", 1)
        out(jnp.reshape(x[0], (int(np.prod(x[0].shape[:ax])), -1)))
    elif op == "Transpose":
        out(jnp.transpose(x[0], a["perm"]))
    elif op == "Softmax":
        out(jax.nn.softmax(x[0], axis=a.get("axis", -1)))
    elif op == "Gemm":
        y = x[0]
        w = x[1]
        if a.get("transB", 0):
            w = w.T
        if a.get("transA", 0):
            y = y.T
        y = y @ w
        if len(x) > 2 and x[2] is not None:
            y = y + x[2]
        out(y)
    elif op == "MatMul":
        out(x[0] @ x[1])
    elif op == "Slice":
        if "starts" in a:
            starts, ends = a["starts"], a["ends"]
            axes = a.get("axes", list(range(len(starts))))
            steps = [1] * len(starts)
        else:
            starts = [int(v) for v in np.asarray(x[1])]
            ends = [int(v) for v in np.asarray(x[2])]
            axes = ([int(v) for v in np.asarray(x[3])]
                    if len(x) > 3 and x[3] is not None else list(range(len(starts))))
            steps = ([int(v) for v in np.asarray(x[4])]
                     if len(x) > 4 and x[4] is not None else [1] * len(starts))
        sl = [slice(None)] * x[0].ndim
        for s, e, ax, st in zip(starts, ends, axes, steps):
            sl[ax] = slice(s, None if e >= (1 << 62) else e, st)
        out(x[0][tuple(sl)])
    elif op == "Split":
        ax = a.get("axis", 0)
        if "split" in a:
            sizes = a["split"]
        elif len(x) > 1 and x[1] is not None:
            sizes = [int(v) for v in np.asarray(x[1])]
        else:
            n = len(node.outputs)
            sizes = [x[0].shape[ax] // n] * n
        off = 0
        for o, s in zip(node.outputs, sizes):
            sl = [slice(None)] * x[0].ndim
            sl[ax] = slice(off, off + s)
            vals[o] = x[0][tuple(sl)]
            off += s
    elif op == "Shape":
        out(np.asarray(x[0].shape, np.int64))
    elif op == "Gather":
        if all_np:
            out(np.take(np.asarray(x[0]), np.asarray(x[1]),
                        axis=a.get("axis", 0)))
        else:
            out(jnp.take(jnp.asarray(x[0]), jnp.asarray(np.asarray(x[1])),
                         axis=a.get("axis", 0)))
    elif op == "Unsqueeze":
        axes = a.get("axes") or [int(v) for v in np.asarray(x[1])]
        y = x[0]
        expand = np.expand_dims if all_np else jnp.expand_dims
        for ax in sorted(axes):
            y = expand(y, ax)
        out(y)
    elif op == "Squeeze":
        axes = a.get("axes") or ([int(v) for v in np.asarray(x[1])]
                                 if len(x) > 1 and x[1] is not None else None)
        out(jnp.squeeze(x[0], axis=tuple(axes) if axes else None))
    elif op == "Cast":
        onnx_to = {1: np.float32, 6: np.int32, 7: np.int64,
                   10: np.float16, 11: np.float64}[a["to"]]
        if all_np:
            out(np.asarray(x[0]).astype(onnx_to))
        else:
            out(jnp.asarray(x[0]).astype(onnx_to))
    elif op == "Constant":
        out(a["value"])
    elif op == "Identity":
        out(x[0])
    elif op == "BatchNormalization":
        scale, b, mean, var = x[1], x[2], x[3], x[4]
        eps = a.get("epsilon", 1e-5)
        inv = scale / np.sqrt(var + eps)
        out(x[0] * inv.reshape(1, -1, 1, 1)
            + (b - mean * inv).reshape(1, -1, 1, 1))
    elif op == "Pad":
        mode = a.get("mode", "constant")
        pads = a.get("pads") or [int(v) for v in np.asarray(x[1])]
        nd = x[0].ndim
        cfg = [(pads[i], pads[i + nd]) for i in range(nd)]
        out(jnp.pad(x[0], cfg,
                    mode="constant" if mode == "constant" else "edge"))
    elif op == "PRelu":
        slope = jnp.asarray(x[1])
        if slope.ndim == 3:      # [C, 1, 1] per-channel
            slope = slope.reshape(1, -1, 1, 1)
        out(jnp.where(x[0] >= 0, x[0], slope * x[0]))
    else:
        raise NotImplementedError(f"ONNX op {op}")


class OnnxModel:
    """Parsed + executable model. ``__call__(*inputs)`` returns the graph
    outputs (tuple if several). Wrap in jax.jit for compiled execution."""

    def __init__(self, path: str):
        self.graph = parse_onnx(path)

    @property
    def input_names(self):
        return self.graph.inputs

    def __call__(self, *inputs):
        import jax.numpy as jnp

        g = self.graph
        vals: Dict[str, Any] = {}
        for name, arr in g.initializers.items():
            vals[name] = arr
        if len(inputs) != len(g.inputs):
            raise ValueError(f"expected {len(g.inputs)} inputs {g.inputs}")
        for name, v in zip(g.inputs, inputs):
            vals[name] = jnp.asarray(v)
        for node in g.nodes:
            _run_node(node, vals)
        outs = tuple(vals[n] for n in g.outputs)
        return outs if len(outs) > 1 else outs[0]

    def ops_used(self):
        return sorted({n.op_type for n in self.graph.nodes})
