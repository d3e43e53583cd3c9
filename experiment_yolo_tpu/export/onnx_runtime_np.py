"""Pure-numpy ONNX graph executor for the op subset our exporter emits.

No onnxruntime exists in this environment, so output-equality tests for the
ONNX export run the serialized graph with THIS independent interpreter
(numpy only — conv via im2col, no jax anywhere) and compare against the
jax forward. It is a validation tool, not a deployment runtime.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from experiment_yolo_tpu.export import onnx_proto as P


def _conv2d(x, w, strides, pads, dilations, group):
    """x (N,C,H,W), w (O, C/g, kH, kW) -> (N,O,H',W') via im2col."""
    n, c, h, wd = x.shape
    o, cg, kh, kw = w.shape
    sh, sw = strides
    dh, dw = dilations
    ph0, pw0, ph1, pw1 = pads  # [h_begin, w_begin, h_end, w_end]
    xp = np.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)))
    eh = (kh - 1) * dh + 1
    ew = (kw - 1) * dw + 1
    oh = (xp.shape[2] - eh) // sh + 1
    ow = (xp.shape[3] - ew) // sw + 1
    out = np.zeros((n, o, oh, ow), np.float32)
    og = o // group
    for g in range(group):
        xg = xp[:, g * cg : (g + 1) * cg]
        wg = w[g * og : (g + 1) * og].reshape(og, -1)  # (og, cg*kh*kw)
        cols = np.empty((n, cg * kh * kw, oh * ow), np.float32)
        idx = 0
        for ci in range(cg):
            for ki in range(kh):
                for kj in range(kw):
                    patch = xg[:, ci, ki * dh : ki * dh + oh * sh : sh, kj * dw : kj * dw + ow * sw : sw]
                    cols[:, idx] = patch.reshape(n, -1)
                    idx += 1
        out[:, g * og : (g + 1) * og] = (wg @ cols).reshape(n, og, oh, ow)
    return out


def _maxpool2d(x, kernel, strides, pads):
    n, c, h, w = x.shape
    kh, kw = kernel
    sh, sw = strides
    ph0, pw0, ph1, pw1 = pads
    xp = np.pad(x, ((0, 0), (0, 0), (ph0, ph1), (pw0, pw1)), constant_values=-np.inf)
    oh = (xp.shape[2] - kh) // sh + 1
    ow = (xp.shape[3] - kw) // sw + 1
    out = np.full((n, c, oh, ow), -np.inf, np.float32)
    for ki in range(kh):
        for kj in range(kw):
            out = np.maximum(out, xp[:, :, ki : ki + oh * sh : sh, kj : kj + ow * sw : sw])
    return out


def _slice(x, starts, ends, axes, steps=None):
    steps = steps or [1] * len(starts)  # ONNX Slice steps input is optional
    sl = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        imin = np.iinfo(np.int64).min + 1
        e = None if (st < 0 and e <= imin) else e
        sl[a] = slice(s, e, st)
    return x[tuple(sl)]


ONNX_CAST = {P.FLOAT: np.float32, P.UINT8: np.uint8, P.INT8: np.int8, P.INT32: np.int32,
             P.INT64: np.int64, P.BOOL: np.bool_, P.FLOAT16: np.float16, P.DOUBLE: np.float64}


def run_onnx(model_bytes, feeds: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """Execute a serialized ModelProto (or an already-parsed model dict —
    callers running per-frame should parse once and pass the dict, since
    parsing rebuilds every weight initializer); returns outputs in graph
    order."""
    m = model_bytes if isinstance(model_bytes, dict) else P.parse_model(model_bytes)
    g = m["graph"]
    env: Dict[str, np.ndarray] = {}
    for name, t in g["initializers"].items():
        env[name] = t["array"]
    for vi in g["inputs"]:
        env[vi["name"]] = np.asarray(feeds[vi["name"]])

    for nd in g["nodes"]:
        op = nd["op_type"]
        ins = [env[i] for i in nd["inputs"]]
        at = nd["attrs"]
        if op == "Identity":
            out = ins[0]
        elif op == "Add":
            out = ins[0] + ins[1]
        elif op == "Sub":
            out = ins[0] - ins[1]
        elif op == "Mul":
            out = ins[0] * ins[1]
        elif op == "Div":
            out = ins[0] / ins[1]
        elif op == "Max":
            out = np.maximum(ins[0], ins[1])
        elif op == "Min":
            out = np.minimum(ins[0], ins[1])
        elif op == "Exp":
            out = np.exp(ins[0])
        elif op == "Log":
            out = np.log(ins[0])
        elif op == "Sqrt":
            out = np.sqrt(ins[0])
        elif op == "Reciprocal":
            out = 1.0 / ins[0]
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + np.exp(-ins[0]))
        elif op == "Tanh":
            out = np.tanh(ins[0])
        elif op == "Sin":
            out = np.sin(ins[0])
        elif op == "Cos":
            out = np.cos(ins[0])
        elif op == "Atan":
            out = np.arctan(ins[0])
        elif op == "Erf":
            from math import erf

            out = np.vectorize(erf, otypes=[np.float32])(ins[0])
        elif op == "Neg":
            out = -ins[0]
        elif op == "Abs":
            out = np.abs(ins[0])
        elif op == "Floor":
            out = np.floor(ins[0])
        elif op == "Ceil":
            out = np.ceil(ins[0])
        elif op == "Sign":
            out = np.sign(ins[0])
        elif op == "Pow":
            out = ins[0] ** ins[1]
        elif op == "Clip":
            out = np.clip(ins[0], ins[1] if len(ins) > 1 else None, ins[2] if len(ins) > 2 else None)
        elif op == "Where":
            out = np.where(ins[0], ins[1], ins[2])
        elif op in ("Equal", "Less", "LessOrEqual", "Greater", "GreaterOrEqual"):
            fn = {"Equal": np.equal, "Less": np.less, "LessOrEqual": np.less_equal,
                  "Greater": np.greater, "GreaterOrEqual": np.greater_equal}[op]
            out = fn(ins[0], ins[1])
        elif op == "Mod":
            # fmod=1 -> C fmod (sign of dividend); fmod=0 -> Python-style
            out = np.fmod(ins[0], ins[1]) if int(at.get("fmod", 0)) else np.mod(ins[0], ins[1])
        elif op == "IsInf":
            out = np.isinf(ins[0])
        elif op == "IsNaN":
            out = np.isnan(ins[0])
        elif op == "Not":
            out = ~ins[0]
        elif op == "And":
            out = ins[0] & ins[1]
        elif op == "Or":
            out = ins[0] | ins[1]
        elif op == "Cast":
            out = ins[0].astype(ONNX_CAST[at["to"]])
        elif op in ("ReduceSum", "ReduceMax", "ReduceMin"):
            axes = tuple(int(a) for a in np.asarray(ins[1]).reshape(-1)) if len(ins) > 1 else None
            keep = bool(at.get("keepdims", 1))
            fn = {"ReduceSum": np.sum, "ReduceMax": np.max, "ReduceMin": np.min}[op]
            out = fn(ins[0], axis=axes, keepdims=keep)
        elif op in ("ArgMax", "ArgMin"):
            fn = np.argmax if op == "ArgMax" else np.argmin
            out = fn(ins[0], axis=int(at["axis"]))
            if at.get("keepdims", 1):
                out = np.expand_dims(out, int(at["axis"]))
            out = out.astype(np.int64)
        elif op == "Reshape":
            out = ins[0].reshape([int(d) for d in np.asarray(ins[1]).reshape(-1)])
        elif op == "Squeeze":
            out = np.squeeze(ins[0], tuple(int(a) for a in np.asarray(ins[1]).reshape(-1)))
        elif op == "Unsqueeze":
            out = ins[0]
            for a in sorted(int(a) for a in np.asarray(ins[1]).reshape(-1)):
                out = np.expand_dims(out, a)
        elif op == "Transpose":
            out = np.transpose(ins[0], at["perm"])
        elif op == "Expand":
            out = np.broadcast_to(ins[0], [int(d) for d in np.asarray(ins[1]).reshape(-1)]).copy()
        elif op == "Concat":
            out = np.concatenate(ins, axis=int(at["axis"]))
        elif op == "Slice":
            out = _slice(ins[0], *[np.asarray(i).reshape(-1).tolist() for i in ins[1:5]])
        elif op == "Pad":
            pads = np.asarray(ins[1]).reshape(-1)
            half = len(pads) // 2
            cfg = [(int(pads[i]), int(pads[i + half])) for i in range(half)]
            cval = float(np.asarray(ins[2]).reshape(-1)[0]) if len(ins) > 2 else 0.0
            out = np.pad(ins[0], cfg, constant_values=cval)
        elif op == "MatMul":
            out = np.matmul(ins[0].astype(np.float32), ins[1].astype(np.float32))
        elif op == "Gemm":
            a0 = ins[0].T if at.get("transA") else ins[0]
            b0 = ins[1].T if at.get("transB") else ins[1]
            out = a0 @ b0 + (ins[2] if len(ins) > 2 else 0.0)
        elif op == "Conv":
            out = _conv2d(ins[0].astype(np.float32), ins[1].astype(np.float32),
                          at.get("strides", [1, 1]), at.get("pads", [0, 0, 0, 0]),
                          at.get("dilations", [1, 1]), int(at.get("group", 1)))
        elif op == "MaxPool":
            out = _maxpool2d(ins[0].astype(np.float32), at["kernel_shape"],
                             at.get("strides", [1, 1]), at.get("pads", [0, 0, 0, 0]))
        elif op == "Gather":
            out = np.take(ins[0], ins[1].astype(np.int64), axis=int(at.get("axis", 0)))
        elif op == "GatherElements":
            out = np.take_along_axis(ins[0], ins[1].astype(np.int64),
                                     axis=int(at.get("axis", 0)))
        elif op == "GatherND":
            idx = ins[1].astype(np.int64)
            out = ins[0][tuple(np.moveaxis(idx, -1, 0))]
        elif op == "Softmax":
            ax = int(at.get("axis", -1))
            e = np.exp(ins[0] - ins[0].max(axis=ax, keepdims=True))
            out = e / e.sum(axis=ax, keepdims=True)
        elif op == "TopK":
            k = int(np.asarray(ins[1]).reshape(-1)[0])
            ax = int(at.get("axis", -1))
            sign = -1.0 if int(at.get("largest", 1)) else 1.0
            # stable sort: ties keep the lowest original index (jax top_k)
            order = np.argsort(sign * ins[0], axis=ax, kind="stable")
            idx = np.take(order, np.arange(k), axis=ax)
            vals = np.take_along_axis(ins[0], idx, axis=ax)
            env[nd["outputs"][0]] = np.asarray(vals)
            env[nd["outputs"][1]] = idx.astype(np.int64)
            continue
        else:
            raise NotImplementedError(f"numpy ONNX interpreter: op {op}")
        env[nd["outputs"][0]] = np.asarray(out)

    return [env[vi["name"]] for vi in g["outputs"]]
