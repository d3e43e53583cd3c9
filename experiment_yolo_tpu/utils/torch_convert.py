"""PyTorch checkpoint -> flax variables converter.

Counterpart of the reference's weight-loading path
(``nn/tasks.py:attempt_load_one_weight``) for cross-framework porting: maps
an Ultralytics-layout ``state_dict`` (as a {name: numpy array} dict — the
caller extracts it from torch, keeping this module torch-free) onto our
``DetectionModel`` variables.

Covered module types: Conv/C2f/C3/SPPF/SPP/Bottleneck/Concat/Upsample/
Detect/LDConv/ScalSeq/Zoom_cat/Add/SPDConv/MBConv — everything the 8
shipped configs instantiate. Unknown keys raise with the offending name.

Layout rules:
- Conv2d weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
- BatchNorm weight/bias -> params scale/bias; running_mean/var -> batch_stats
- LDConv's (N,1)-kernel conv -> our Dense 'proj': dense[n*C+i, o] = W[o,i,n,0]
- ScalSeq's Conv3d 1x1x1 -> our Dense 'conv3d': dense[i, o] = W[o,i,0,0,0]
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _set(tree: Dict, path, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def convert_state_dict(state: Dict[str, np.ndarray], model) -> Dict[str, Any]:
    """Build {'params', 'batch_stats'} for `model` from a torch state_dict.

    `model` is a DetectionModel (provides specs[i].type per layer).
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unused = []

    def put(layer: str, sub_path, kind: str, value):
        tree = stats if kind == "stats" else params
        _set(tree, (layer, *sub_path), value)

    for name, w in state.items():
        if not name.startswith("model."):
            unused.append(name)
            continue
        parts = name.split(".")
        idx = int(parts[1])
        layer = f"layers_{idx}"
        rest = parts[2:]
        mtype = model.specs[idx].type
        try:
            _convert_one(put, layer, mtype, rest, np.asarray(w))
        except KeyError:
            unused.append(name)
    if unused:
        raise KeyError(f"unconverted torch keys (unsupported modules?): {unused[:10]}")
    return {"params": params, "batch_stats": stats}


def invert_to_torch_state(variables: Dict, torch_shapes: Dict[str, tuple], model) -> Dict[str, np.ndarray]:
    """Our flax variables -> reference-layout torch ``state_dict`` arrays.

    Exact inverse of :func:`convert_state_dict`, derived from it rather than
    hand-mirrored: each torch key is traced through the forward mapping with
    an ``arange`` placeholder; since every forward transform is a pure
    permutation (transpose/reshape/slice), the traced flax array holds, at
    each flax flat position, the torch flat index that lands there — which
    makes scattering the trained flax values back a one-liner.

    ``torch_shapes``: {state_dict name: shape} from a freshly built reference
    model. Keys the forward converter drops (DFL arange conv, LDConv ``p_n``
    buffer, ``num_batches_tracked``) are omitted from the result — the torch
    model's own fixed buffers are already correct.

    Counterpart direction of the reference's ``attempt_load_one_weight``
    (ultralytics/nn/tasks.py:614): used to run OUR trained weights through the
    reference's val pipeline for end-to-end accuracy-parity checks.
    """
    params = variables.get("params", variables)
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for name, shape in torch_shapes.items():
        if not name.startswith("model."):
            continue
        parts = name.split(".")
        idx = int(parts[1])
        layer = f"layers_{idx}"
        mtype = model.specs[idx].type
        n = int(np.prod(shape)) if shape else 1
        trace: list = []  # (kind, path, traced array)

        def put(layer_, sub_path, kind, value):
            trace.append((kind, (layer_, *sub_path), np.asarray(value)))

        try:
            _convert_one(put, layer, mtype, parts[2:], np.arange(n, dtype=np.int64).reshape(shape))
        except KeyError:
            continue  # dropped by the forward converter (fixed buffer)
        if not trace:
            continue  # e.g. num_batches_tracked / dfl / p_n
        kind, path, traced = trace[0]
        node: Any = stats if kind == "stats" else params
        for k in path:
            node = node[k]
        flax_val = np.asarray(node, np.float32)
        if flax_val.shape != traced.shape:
            raise ValueError(f"{name}: flax shape {flax_val.shape} != traced {traced.shape}")
        torch_flat = np.empty(n, np.float32)
        torch_flat[traced.reshape(-1)] = flax_val.reshape(-1)
        out[name] = torch_flat.reshape(shape)
    return out


def _bn(put, layer, prefix, leaf, w):
    """BatchNorm leaves -> flax names."""
    if leaf == "weight":
        put(layer, (*prefix, "scale"), "params", w)
    elif leaf == "bias":
        put(layer, (*prefix, "bias"), "params", w)
    elif leaf == "running_mean":
        put(layer, (*prefix, "mean"), "stats", w)
    elif leaf == "running_var":
        put(layer, (*prefix, "var"), "stats", w)
    elif leaf == "num_batches_tracked":
        pass
    else:
        raise KeyError(leaf)


def _convbn(put, layer, prefix_ours, rest, w):
    """Reference Conv (conv+bn) under arbitrary nesting: rest like
    ['conv', 'weight'] or ['bn', 'running_mean']."""
    if rest[0] == "conv" and rest[1] == "weight":
        put(layer, (*prefix_ours, "conv", "kernel"), "params", _conv_w(w))
    elif rest[0] == "bn":
        _bn(put, layer, (*prefix_ours, "bn"), rest[1], w)
    else:
        raise KeyError(".".join(rest))


def _convert_one(put, layer, mtype, rest, w):
    # --- plain modules ------------------------------------------------------
    if mtype == "Conv":
        _convbn(put, layer, (), rest, w)
    elif mtype in ("C2f", "C3", "C2f_LDConv"):
        if rest[0] in ("cv1", "cv2", "cv3"):
            _convbn(put, layer, (rest[0],), rest[1:], w)
        elif rest[0] == "m":  # m.{k}.cv1.conv.weight -> m{k}/cv1/...
            k = rest[1]
            inner = rest[2:]
            if mtype == "C2f_LDConv":
                _ldconv_leaf(put, layer, (f"m{k}", inner[0]), inner[1:], w)
            else:
                _convbn(put, layer, (f"m{k}", inner[0]), inner[1:], w)
        else:
            raise KeyError(".".join(rest))
    elif mtype in ("SPPF", "SPP"):
        _convbn(put, layer, (rest[0],), rest[1:], w)
    elif mtype == "SPDConv":
        _convbn(put, layer, ("conv",), rest[1:], w)
    elif mtype == "LDConv":
        _ldconv_leaf(put, layer, (), rest, w)
    elif mtype in ("ScalSeq", "DynamicScalSeq"):
        if rest[0] in ("conv0", "conv1", "conv2"):
            _convbn(put, layer, (rest[0],), rest[1:], w)
        elif rest[0] == "conv3d":
            if rest[1] == "weight":  # (O, I, 1, 1, 1) -> (I, O)
                put(layer, ("conv3d", "kernel"), "params", w[:, :, 0, 0, 0].T)
            else:
                put(layer, ("conv3d", "bias"), "params", w)
        elif rest[0] == "bn":
            _bn(put, layer, ("bn",), rest[1], w)
        else:
            raise KeyError(".".join(rest))
    elif mtype == "MBConv":
        # blocks.{i}.{conv1|conv2|conv3}.{c|bn}.* -> block{i}/{expand|dw|project}
        k = rest[1]
        sub = {"conv1": "expand", "conv2": "dw", "conv3": "project"}[rest[2]]
        inner = rest[3:]
        if inner[0] == "c" and inner[1] == "weight":
            put(layer, (f"block{k}", sub, "conv", "kernel"), "params", _conv_w(w))
        elif inner[0] == "bn":
            _bn(put, layer, (f"block{k}", sub, "bn"), inner[1], w)
        else:
            raise KeyError(".".join(rest))
    elif mtype in ("Detect", "DetectAux"):
        # cv2.{i}.{j} / cv3.{i}.{j}: j in 0,1 = Conv; j=2 bare Conv2d; dfl fixed.
        # DetectAux (extra head.py:235) nests its main cv2/cv3 under our
        # 'detect' submodule; aux cv4/cv5 stay at the head level.
        if rest[0] in ("dfl", "dfl_aux"):
            return  # fixed arange weights, not parameters on our side
        branch, i, j = rest[0], rest[1], rest[2]
        ours = f"{branch}_{i}_{j}"
        prefix = ()
        if mtype == "DetectAux" and branch in ("cv2", "cv3"):
            prefix = ("detect",)
        if j == "2":
            if rest[3] == "weight":
                put(layer, (*prefix, ours, "kernel"), "params", _conv_w(w))
            else:
                put(layer, (*prefix, ours, "bias"), "params", w)
        else:
            _convbn(put, layer, (*prefix, ours), rest[3:], w)
    elif mtype in ("Concat", "Zoom_cat", "Add", "nn.Upsample"):
        raise KeyError("parameter-free module got a weight")
    else:
        raise KeyError(f"module type {mtype} not supported by the converter")


def _ldconv_leaf(put, layer, prefix, rest, w):
    """LDConv leaves: p_conv (offset conv), conv.0 ((N,1) conv -> Dense
    'proj'), conv.1 (BN)."""
    if rest[0] == "p_conv":
        if rest[1] == "weight":
            put(layer, (*prefix, "p_conv", "kernel"), "params", _conv_w(w))
        else:
            put(layer, (*prefix, "p_conv", "bias"), "params", w)
    elif rest[0] == "p_n":
        pass  # fixed buffer (recomputed on our side)
    elif rest[0] == "conv" and rest[1] == "0":
        # torch (O, I, N, 1); our feat layout (..., n*C + i)
        o, i, n, _ = w.shape
        put(layer, (*prefix, "proj", "kernel"), "params", np.transpose(w[..., 0], (2, 1, 0)).reshape(n * i, o))
    elif rest[0] == "conv" and rest[1] == "1":
        _bn(put, layer, (*prefix, "bn"), rest[2], w)
    else:
        raise KeyError(".".join(rest))
