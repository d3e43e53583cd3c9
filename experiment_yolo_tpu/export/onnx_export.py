"""jaxpr -> ONNX graph compiler.

TPU-native answer to the reference's ``export_onnx``
(/root/reference/ultralytics/engine/exporter.py:341): instead of
torch.onnx tracing, we trace the jitted forward to a closed jaxpr — our own
IR — and compile each primitive to ONNX ops (opset 17), with the trained
weights captured as graph initializers. Self-contained: serialization via
``onnx_proto`` (no onnx / tf2onnx dependency).

Layout: JAX convs are NHWC/HWIO; ONNX Conv and MaxPool are NCHW/OIHW.
Weights are pre-transposed at export time; activations get local
Transpose wrappers around each Conv/MaxPool (ONNX runtimes fuse these).

Covered primitives: the full vocabulary of every Detect-family forward
(conv, dot_general, elementwise, reductions, reduce_window_max, reshape /
transpose / slice / concat / broadcast / iota / pad, logistic, exp, tanh,
erf, rsqrt, sqrt, pow, select_n, convert_element_type, clamp, rev, nested
pjit/custom_jvp inlining). Unsupported primitives raise with the op name.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from experiment_yolo_tpu.export import onnx_proto as P


class _Builder:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.initializers: List[bytes] = []
        self.counter = 0
        self._const_cache: Dict[bytes, str] = {}

    def name(self, hint: str = "t") -> str:
        self.counter += 1
        return f"{hint}_{self.counter}"

    def add(self, op: str, inputs: Sequence[str], n_out: int = 1, hint: str = None, **attrs):
        outs = [self.name(hint or op.lower()) for _ in range(n_out)]
        self.nodes.append(P.node(op, inputs, outs, name=self.name(op), **attrs))
        return outs[0] if n_out == 1 else outs

    def const(self, arr: np.ndarray, hint: str = "c") -> str:
        arr = np.ascontiguousarray(arr)
        key = arr.tobytes() + str(arr.dtype).encode() + str(arr.shape).encode()
        if key in self._const_cache:
            return self._const_cache[key]
        nm = self.name(hint)
        self.initializers.append(P.tensor(nm, arr))
        self._const_cache[key] = nm
        return nm

    def i64(self, vals, hint="i") -> str:
        return self.const(np.asarray(vals, np.int64), hint)


def _np_dtype(aval) -> np.dtype:
    dt = np.dtype(aval.dtype)
    if dt == np.dtype("bfloat16"):
        return np.dtype(np.float32)
    return dt


def _as_np(x) -> np.ndarray:
    arr = np.asarray(x)
    if arr.dtype.name == "bfloat16":
        arr = arr.astype(np.float32)
    return arr


def _transpose(b: _Builder, x: str, perm) -> str:
    return b.add("Transpose", [x], hint="tr", perm=list(map(int, perm)))


def export_jaxpr_to_onnx(closed_jaxpr, input_names, output_names, path=None,
                         graph_name: str = "experiment_yolo_tpu", doc: str = ""):
    """Compile a ClosedJaxpr to a serialized ONNX ModelProto (bytes).

    closed_jaxpr: from ``jax.make_jaxpr(fn)(*example)`` — consts become
    initializers. input_names/output_names label graph IO in order.
    """
    b = _Builder()
    jaxpr = closed_jaxpr.jaxpr
    env: Dict = {}

    def get(var) -> str:
        from jax._src.core import Literal

        if isinstance(var, Literal):
            return b.const(_as_np(var.val), "lit")
        return env[var]

    # graph inputs
    graph_inputs = []
    assert len(input_names) == len(jaxpr.invars), (len(input_names), len(jaxpr.invars))
    for name, var in zip(input_names, jaxpr.invars):
        env[var] = name
        dt = _np_dtype(var.aval)
        graph_inputs.append(P.value_info(name, P.NP_TO_ONNX[dt], list(var.aval.shape)))

    # consts -> initializers
    for var, val in zip(jaxpr.constvars, closed_jaxpr.consts):
        env[var] = b.const(_as_np(val), "w")

    _emit_eqns(b, jaxpr.eqns, env, get)

    graph_outputs = []
    assert len(output_names) == len(jaxpr.outvars)
    out_map_nodes = []
    for name, var in zip(output_names, jaxpr.outvars):
        src = get(var)
        out_map_nodes.append(P.node("Identity", [src], [name], name=b.name("out")))
        dt = _np_dtype(var.aval)
        graph_outputs.append(P.value_info(name, P.NP_TO_ONNX[dt], list(var.aval.shape)))
    b.nodes.extend(out_map_nodes)

    g = P.graph(graph_name, b.nodes, graph_inputs, graph_outputs, b.initializers)
    m = P.model(g, opset=17, doc=doc)
    if path is not None:
        with open(path, "wb") as f:
            f.write(m)
    return m


_ELEMENTWISE = {
    "add": "Add", "sub": "Sub", "mul": "Mul", "div": "Div",
    "max": "Max", "min": "Min", "exp": "Exp", "log": "Log",
    "tanh": "Tanh", "logistic": "Sigmoid", "sqrt": "Sqrt", "erf": "Erf",
    "neg": "Neg", "abs": "Abs", "floor": "Floor", "ceil": "Ceil",
    "sign": "Sign", "atan": "Atan", "sin": "Sin", "cos": "Cos",
}

_REDUCE = {"reduce_sum": "ReduceSum", "reduce_max": "ReduceMax", "reduce_min": "ReduceMin"}


def _emit_eqns(b: _Builder, eqns, env, get):
    for eq in eqns:
        prim = eq.primitive.name
        if prim in ("pjit", "jit", "closed_call", "custom_jvp_call", "custom_vjp_call",
                    "custom_vjp_call_jaxpr", "remat", "checkpoint"):
            sub = eq.params.get("jaxpr") or eq.params.get("call_jaxpr") or eq.params.get("fun_jaxpr")
            if hasattr(sub, "jaxpr"):  # ClosedJaxpr
                consts, sub = sub.consts, sub.jaxpr
            else:
                consts = ()
            for var, val in zip(sub.constvars, consts):
                env[var] = b.const(_as_np(val), "w")
            for inner, outer in zip(sub.invars, eq.invars):
                env[inner] = get(outer)
            _emit_eqns(b, sub.eqns, env, get)
            for outer, inner in zip(eq.outvars, sub.outvars):
                env[outer] = get(inner)
            continue

        out = _emit_one(b, prim, eq, env, get)
        if len(eq.outvars) == 1:
            env[eq.outvars[0]] = out
        else:
            for var, o in zip(eq.outvars, out):
                env[var] = o


def _emit_one(b: _Builder, prim: str, eq, env, get) -> str:
    ins = [get(v) for v in eq.invars]
    p = eq.params
    aval = eq.outvars[0].aval

    if prim in _ELEMENTWISE:
        return b.add(_ELEMENTWISE[prim], ins, hint=prim)
    if prim == "rem":
        # fmod=1: C-fmod semantics (remainder takes the DIVIDEND's sign,
        # matching lax.rem) and the only legal mode for float inputs
        return b.add("Mod", ins, hint="rem", fmod=1)
    if prim == "is_finite":
        # finite == !(isinf || isnan); ONNX IsInf alone is the inverse for
        # infs and wrong for NaN
        inf = b.add("IsInf", ins)
        nan = b.add("IsNaN", ins)
        either = b.add("Or", [inf, nan])
        return b.add("Not", [either], hint="is_finite")
    if prim == "rsqrt":
        s = b.add("Sqrt", ins)
        return b.add("Reciprocal", [s], hint="rsqrt")
    if prim == "square":
        return b.add("Mul", [ins[0], ins[0]], hint="square")
    if prim == "integer_pow":
        y = int(p["y"])
        expo = b.const(np.asarray(float(y), _np_dtype(eq.invars[0].aval)), "pow")
        return b.add("Pow", [ins[0], expo], hint="ipow")
    if prim == "pow":
        return b.add("Pow", ins, hint="pow")
    if prim == "stop_gradient" or prim == "copy":
        return b.add("Identity", ins, hint="id")
    if prim == "convert_element_type":
        to = P.NP_TO_ONNX[_np_dtype(aval)]
        return b.add("Cast", ins, hint="cast", to=to)
    if prim == "clamp":
        # jax clamp(min, x, max). ONNX Clip requires SCALAR bounds, so lower
        # to Max/Min which accept broadcast tensors (per-element bounds are
        # common in box clipping).
        lo = b.add("Max", [ins[1], ins[0]])
        return b.add("Min", [lo, ins[2]], hint="clamp")
    if prim == "select_n":
        # select_n(pred, on_false, on_true) with bool pred == Where(pred, true, false)
        assert len(ins) == 3, "select_n with >2 cases unsupported"
        return b.add("Where", [ins[0], ins[2], ins[1]], hint="where")
    if prim == "ne":
        eqo = b.add("Equal", ins)
        return b.add("Not", [eqo], hint="ne")
    if prim in ("eq", "lt", "le", "gt", "ge"):
        opm = {"eq": "Equal", "lt": "Less", "le": "LessOrEqual", "gt": "Greater", "ge": "GreaterOrEqual"}
        return b.add(opm[prim], ins, hint=prim)
    if prim == "and":
        return b.add("And", ins)
    if prim == "or":
        return b.add("Or", ins)
    if prim == "not":
        return b.add("Not", ins)

    if prim in _REDUCE:
        axes = b.i64(list(p["axes"]), "axes")
        return b.add(_REDUCE[prim], [ins[0], axes], hint=prim, keepdims=0)
    if prim in ("reduce_and", "reduce_or"):
        # bool all/any: min/max over the int cast, cast back to bool
        axes = b.i64(list(p["axes"]), "axes")
        xi = b.add("Cast", ins, hint="cast", to=P.INT64)
        red = b.add("ReduceMin" if prim == "reduce_and" else "ReduceMax",
                    [xi, axes], hint=prim, keepdims=0)
        return b.add("Cast", [red], hint="cast", to=P.BOOL)
    if prim == "top_k":
        k = int(p["k"])
        vals, idx = b.add("TopK", [ins[0], b.i64([k], "k")], n_out=2,
                          hint="topk", axis=-1, largest=1, sorted=1)
        idx = b.add("Cast", [idx], hint="cast",
                    to=P.NP_TO_ONNX[_np_dtype(eq.outvars[1].aval)])
        return [vals, idx]
    if prim == "argmax" or prim == "argmin":
        op = "ArgMax" if prim == "argmax" else "ArgMin"
        axes = list(p["axes"])
        assert len(axes) == 1
        r = b.add(op, [ins[0]], hint=prim, axis=int(axes[0]), keepdims=0)
        return b.add("Cast", [r], hint="cast", to=P.NP_TO_ONNX[_np_dtype(aval)])

    if prim == "reshape":
        shape = b.i64(list(aval.shape), "shape")
        return b.add("Reshape", [ins[0], shape], hint="reshape")
    if prim == "squeeze":
        axes = b.i64(list(p["dimensions"]), "axes")
        return b.add("Squeeze", [ins[0], axes], hint="squeeze")
    if prim == "expand_dims":
        axes = b.i64(list(p["dimensions"]), "axes")
        return b.add("Unsqueeze", [ins[0], axes], hint="unsq")
    if prim == "transpose":
        return _transpose(b, ins[0], p["permutation"])
    if prim == "rev":
        # reverse via Slice with negative steps
        dims = list(p["dimensions"])
        starts = b.i64([-1] * len(dims), "st")
        ends = b.i64([np.iinfo(np.int64).min + 1] * len(dims), "en")
        axes = b.i64(dims, "ax")
        steps = b.i64([-1] * len(dims), "sp")
        return b.add("Slice", [ins[0], starts, ends, axes, steps], hint="rev")
    if prim == "concatenate":
        return b.add("Concat", ins, hint="concat", axis=int(p["dimension"]))
    if prim == "slice":
        starts, limits = list(p["start_indices"]), list(p["limit_indices"])
        strides = list(p["strides"] or [1] * len(starts))
        axes = list(range(len(starts)))
        return b.add("Slice", [ins[0], b.i64(starts, "st"), b.i64(limits, "en"),
                               b.i64(axes, "ax"), b.i64(strides, "sp")], hint="slice")
    if prim == "pad":
        # jax pad(operand, pad_value, config (lo, hi, interior))
        cfgp = p["padding_config"]
        assert all(i == 0 for _, _, i in cfgp), "interior pad unsupported"
        los = [lo for lo, _, _ in cfgp]
        his = [hi for _, hi, _ in cfgp]
        assert all(v >= 0 for v in los + his), "negative pad unsupported"
        pads = b.i64(los + his, "pads")
        return b.add("Pad", [ins[0], pads, ins[1]], hint="pad")
    if prim == "broadcast_in_dim":
        shape = list(p["shape"])
        bdims = list(p["broadcast_dimensions"])
        in_shape = list(eq.invars[0].aval.shape)
        # 1) reshape to rank-matched shape with 1s, 2) Expand
        mid = [1] * len(shape)
        for src_axis, dst_axis in enumerate(bdims):
            mid[dst_axis] = in_shape[src_axis]
        x = ins[0]
        if mid != in_shape:
            x = b.add("Reshape", [x, b.i64(mid, "shape")], hint="bshape")
        if mid != shape:
            x = b.add("Expand", [x, b.i64(shape, "shape")], hint="expand")
        elif mid == in_shape:
            x = b.add("Identity", [x], hint="id")
        return x
    if prim == "iota":
        dt = _np_dtype(aval)
        dim = int(p["dimension"])
        shape = list(p["shape"])
        vec = np.arange(shape[dim], dtype=dt)
        full = np.broadcast_to(
            vec.reshape([-1 if i == dim else 1 for i in range(len(shape))]), shape
        )
        return b.const(np.ascontiguousarray(full), "iota")

    if prim == "dot_general":
        return _emit_dot_general(b, eq, ins)
    if prim == "conv_general_dilated":
        return _emit_conv(b, eq, ins, env)
    if prim == "reduce_window_max":
        return _emit_maxpool(b, eq, ins)
    if prim == "gather":
        return _emit_gather(b, eq, ins)
    if prim == "resize_nearest" or prim == "resize":
        raise NotImplementedError("resize primitive reached ONNX export")

    raise NotImplementedError(
        f"ONNX export: unsupported primitive '{prim}' (shapes {[v.aval.shape for v in eq.invars]})"
    )


def _emit_dot_general(b: _Builder, eq, ins) -> str:
    """Lower dot_general via Transpose/Reshape + MatMul."""
    (lc, rc), (lb, rb) = eq.params["dimension_numbers"]
    lhs_shape = list(eq.invars[0].aval.shape)
    rhs_shape = list(eq.invars[1].aval.shape)

    def arrange(x, shape, batch, contract, contract_last):
        free = [i for i in range(len(shape)) if i not in batch and i not in contract]
        perm = list(batch) + (free + list(contract) if contract_last else list(contract) + free)
        y = _transpose(b, x, perm) if perm != list(range(len(shape))) else x
        bsz = [shape[i] for i in batch]
        fsz = int(np.prod([shape[i] for i in free])) if free else 1
        csz = int(np.prod([shape[i] for i in contract])) if contract else 1
        new = bsz + ([fsz, csz] if contract_last else [csz, fsz])
        y = b.add("Reshape", [y, b.i64(new, "shape")], hint="dshape")
        return y, [shape[i] for i in free]

    l2, lfree = arrange(ins[0], lhs_shape, lb, lc, True)
    r2, rfree = arrange(ins[1], rhs_shape, rb, rc, False)
    mm = b.add("MatMul", [l2, r2], hint="matmul")
    out_shape = [lhs_shape[i] for i in lb] + lfree + rfree
    return b.add("Reshape", [mm, b.i64(out_shape, "shape")], hint="dout")


def _emit_conv(b: _Builder, eq, ins, env) -> str:
    p = eq.params
    if int(p.get("batch_group_count", 1)) != 1:
        raise NotImplementedError(f"conv batch_group_count={p['batch_group_count']}")
    dn = p["dimension_numbers"]
    lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
    nsp = len(lhs_spec) - 2
    assert nsp in (1, 2, 3), f"conv rank {nsp}"

    # activations -> NCHW
    # lhs_spec = (batch_dim, feature_dim, *spatial_dims) as POSITIONS
    perm_in = [lhs_spec[0], lhs_spec[1]] + list(lhs_spec[2:])
    x = _transpose(b, ins[0], perm_in) if perm_in != list(range(nsp + 2)) else ins[0]

    pads_lo = [lo for lo, _ in p["padding"]]
    pads_hi = [hi for _, hi in p["padding"]]

    lhs_dil = list(p.get("lhs_dilation") or [1] * nsp)
    if any(d != 1 for d in lhs_dil):
        # transposed conv (lax.conv_transpose / flax ConvTranspose): XLA
        # dilates the INPUT by lhs_dilation (zeros between elements), then
        # pads, then runs an ordinary correlation. Lowered explicitly as
        # Reshape/Concat-zeros/Reshape/Slice per spatial axis + a plain
        # Conv — exact semantics, no ConvTranspose output_padding
        # convention gymnastics (zeros are initializers; fine at the
        # low-res sites transposed convs appear, e.g. seg Proto upsample).
        in_shape = list(eq.invars[0].aval.shape)
        cur = [in_shape[i] for i in perm_in]  # NCHW
        dt = _np_dtype(eq.invars[0].aval)
        for sp_axis, d in enumerate(lhs_dil):
            if d == 1:
                continue
            k = 2 + sp_axis  # NCHW axis
            L = cur[k]
            shape_unsq = cur[:k + 1] + [1] + cur[k + 1:]
            x = b.add("Reshape", [x, b.i64(shape_unsq, "shape")], hint="tdil")
            zshape = cur[:k + 1] + [d - 1] + cur[k + 1:]
            # Expand a scalar zero instead of baking an activation-sized
            # zero initializer into the file (several MB per dilated axis
            # at real image sizes, growing with imgsz^2)
            z0 = b.const(np.zeros((1,) * len(zshape), dt), "tdz0")
            zeros = b.add("Expand", [z0, b.i64(zshape, "shape")], hint="tdz")
            x = b.add("Concat", [x, zeros], hint="tdcat", axis=k + 1)
            cur = cur[:k] + [L * d] + cur[k + 1:]
            x = b.add("Reshape", [x, b.i64(cur, "shape")], hint="tdm")
            new_len = (L - 1) * d + 1
            x = b.add(
                "Slice",
                [x, b.i64([0], "st"), b.i64([new_len], "en"), b.i64([k], "ax")],
                hint="tdtrim",
            )
            cur[k] = new_len
        # negative XLA padding (cropping) can't go on an ONNX Conv -> Slice
        if any(v < 0 for v in pads_lo + pads_hi):
            for sp_axis in range(nsp):
                lo, hi = pads_lo[sp_axis], pads_hi[sp_axis]
                if lo >= 0 and hi >= 0:
                    continue
                k = 2 + sp_axis
                st, en = max(-lo, 0), cur[k] - max(-hi, 0)
                x = b.add(
                    "Slice",
                    [x, b.i64([st], "st"), b.i64([en], "en"), b.i64([k], "ax")],
                    hint="tdcrop",
                )
                cur[k] = en - st
                pads_lo[sp_axis] = max(lo, 0)
                pads_hi[sp_axis] = max(hi, 0)

    # weights -> OIHW; if the kernel is an initializer we could pre-transpose,
    # but a Transpose node keeps the general case correct (runtimes constant-
    # fold initializer transposes).
    perm_w = [rhs_spec[0], rhs_spec[1]] + list(rhs_spec[2:])
    wgt = _transpose(b, ins[1], perm_w) if perm_w != list(range(nsp + 2)) else ins[1]

    conv = b.add(
        "Conv", [x, wgt], hint="conv",
        strides=list(map(int, p["window_strides"])),
        pads=list(map(int, pads_lo + pads_hi)),
        dilations=list(map(int, p["rhs_dilation"])),
        group=int(p["feature_group_count"]),
    )
    # output NCHW -> jaxpr's out_spec order
    inv = [0] * (nsp + 2)
    onnx_order = [out_spec[0], out_spec[1]] + list(out_spec[2:])
    for onnx_axis, jax_axis in enumerate(onnx_order):
        inv[jax_axis] = onnx_axis
    if inv != list(range(nsp + 2)):
        conv = _transpose(b, conv, inv)
    return conv


def _emit_maxpool(b: _Builder, eq, ins) -> str:
    p = eq.params
    dims = list(p["window_dimensions"])
    strides = list(p["window_strides"])
    padding = list(p["padding"])
    for key in ("base_dilation", "window_dilation"):
        dil = p.get(key)
        if dil is not None and any(int(d) != 1 for d in dil):
            raise NotImplementedError(f"reduce_window_max with {key}={tuple(dil)}")
    rank = len(dims)
    # find spatial axes: window==1 on batch/channel axes
    sp = [i for i in range(rank) if dims[i] != 1 or strides[i] != 1]
    if not sp:
        sp = [rank - 3, rank - 2] if rank >= 3 else [0]
    non_sp = [i for i in range(rank) if i not in sp]
    assert len(non_sp) == 2, f"maxpool layout with spatial axes {sp}"
    batch_axis, chan_axis = non_sp[0], non_sp[-1]
    perm = [batch_axis, chan_axis] + sp
    x = _transpose(b, ins[0], perm) if perm != list(range(rank)) else ins[0]
    pads_lo = [padding[i][0] for i in sp]
    pads_hi = [padding[i][1] for i in sp]
    pool = b.add(
        "MaxPool", [x], hint="maxpool",
        kernel_shape=[int(dims[i]) for i in sp],
        strides=[int(strides[i]) for i in sp],
        pads=list(map(int, pads_lo + pads_hi)),
    )
    inv = [0] * rank
    for onnx_axis, jax_axis in enumerate(perm):
        inv[jax_axis] = onnx_axis
    if inv != list(range(rank)):
        pool = _transpose(b, pool, inv)
    return pool


def _emit_gather(b: _Builder, eq, ins) -> str:
    """Limited gather: the take-along-a-single-axis patterns jnp emits."""
    p = eq.params
    dn = p["dimension_numbers"]
    operand_shape = list(eq.invars[0].aval.shape)
    idx_shape = list(eq.invars[1].aval.shape)
    batching = tuple(getattr(dn, "operand_batching_dims", ()) or ())
    # case: dynamic-start slice (lax.dynamic_slice with a traced start:
    # collapsed empty, full slice sizes except the indexed axis) == ONNX
    # Slice with runtime starts. jax clamps out-of-range starts; exported
    # graphs assume in-bounds (true for the model-internal index math).
    if (not dn.collapsed_slice_dims and len(dn.start_index_map) == 1
            and list(idx_shape) == [1] and not batching):
        a = int(dn.start_index_map[0])
        size = int(p["slice_sizes"][a])
        ok = all(int(p["slice_sizes"][d]) == int(operand_shape[d])
                 for d in range(len(operand_shape)) if d != a)
        if ok:
            starts = b.add("Cast", [ins[1]], hint="cast", to=P.INT64)
            ends = b.add("Add", [starts, b.i64([size], "sz")], hint="dsend")
            return b.add("Slice", [ins[0], starts, ends, b.i64([a], "ax")],
                         hint="dslice")
    # case: jnp.take(x, idx, axis) with scalar index depth 1, no batching
    if (len(dn.start_index_map) == 1 and idx_shape and idx_shape[-1] == 1
            and not batching
            and tuple(dn.collapsed_slice_dims) == tuple(dn.start_index_map)):
        axis = dn.start_index_map[0]
        idx = b.add("Squeeze", [ins[1], b.i64([len(idx_shape) - 1], "ax")], hint="gidx")
        idx = b.add("Cast", [idx], hint="cast", to=P.INT64)
        return b.add("Gather", [ins[0], idx], hint="gather", axis=int(axis))
    # case: jnp.take_along_axis (per-batch indices along one axis) ==
    # ONNX GatherElements with the index array broadcast to the output shape
    if (len(dn.start_index_map) == 1 and idx_shape and idx_shape[-1] == 1
            and batching and tuple(dn.collapsed_slice_dims) == tuple(dn.start_index_map)):
        axis = int(dn.start_index_map[0])
        out_shape = list(eq.outvars[0].aval.shape)
        idx = b.add("Squeeze", [ins[1], b.i64([len(idx_shape) - 1], "ax")], hint="taidx")
        off = sorted(int(d) for d in dn.offset_dims)
        if off:
            idx = b.add("Unsqueeze", [idx, b.i64(off, "ax")], hint="tauq")
        idx = b.add("Expand", [idx, b.i64(out_shape, "shape")], hint="taexp")
        idx = b.add("Cast", [idx], hint="cast", to=P.INT64)
        return b.add("GatherElements", [ins[0], idx], hint="gatherel", axis=axis)
    # case: pointwise gather (jnp.take_along_axis lowers to full-rank index
    # tuples with unit slices) == ONNX GatherND
    r = len(operand_shape)
    if (len(dn.start_index_map) == r and not dn.offset_dims
            and tuple(sorted(dn.collapsed_slice_dims)) == tuple(range(r))
            and all(s == 1 for s in p["slice_sizes"])):
        idx = ins[1]
        sim = list(dn.start_index_map)
        if sim != list(range(r)):
            # reorder index components into operand-dimension order
            inv = [sim.index(i) for i in range(r)]
            idx = b.add("Gather", [idx, b.i64(inv, "perm")], hint="gperm",
                        axis=len(idx_shape) - 1)
        idx = b.add("Cast", [idx], hint="cast", to=P.INT64)
        return b.add("GatherND", [ins[0], idx], hint="gathernd")
    raise NotImplementedError(f"general gather in ONNX export: {dn}")
