"""Kernel Warehouse (extra_modules/kernel_warehouse.py, arXiv:2308.08361):
convs in participating layers draw their kernels from shared per-name
warehouses of 1x1 "cells"; a per-sample attention mixes cells into each
layer's full kernel, annealed from a one-hot static assignment by a
temperature that decays over the first training epochs.

TPU-first redesign: the torch version mutates a Warehouse_Manager nn.Module
after construction (store/allocate) and updates a temperature attribute on
every layer each step. Here the manager is a pure-Python build-time planner
(`KWManager`): `parse_model` registers every KW conv while building the
graph, `store()` computes the shared cell shapes and each layer's static
mixture plan, the GraphModel owns the warehouse arrays as ordinary params,
and the temperature is a traced scalar threaded through `apply` — so the
whole thing stays jit-compatible with zero retraces (reference
nn/tasks.py:283-301, engine/trainer.py:795-797).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from experiment_yolo_tpu.nn.norm import BatchNorm as MemBatchNorm

Dtype = Any


def get_temperature(iteration, epoch, iter_per_epoch, temp_epoch=20, temp_init_value=30.0, temp_end=0.0):
    """Linear temperature decay (kernel_warehouse.py:345)."""
    total_iter = iter_per_epoch * temp_epoch
    current_iter = iter_per_epoch * epoch + iteration
    return temp_end + max(0, (temp_init_value - temp_end) * ((total_iter - current_iter) / max(1.0, total_iter)))


@dataclass
class _KWLayerPlan:
    warehouse_idx: int
    in_planes: int
    out_planes: int
    k: int
    groups: int
    # filled by store():
    start_cell_idx: int = 0
    groups_out: int = 0
    groups_in: int = 0
    groups_spatial: int = 0
    num_cells: int = 0
    temp_bias: Tuple[float, ...] = ()


@dataclass
class KWManager:
    """Build-time planner for shared kernel-cell warehouses."""

    cell_num_ratio: float = 1.0
    reduction: float = 0.0625
    names: List[str] = field(default_factory=list)
    records: Dict[str, List[_KWLayerPlan]] = field(default_factory=dict)
    order: List[_KWLayerPlan] = field(default_factory=list)
    cell_shapes: List[Tuple[int, int, int, int]] = field(default_factory=list)
    stored: bool = False

    def reserve(self, c1: int, c2: int, k: int, groups: int, name: str) -> _KWLayerPlan:
        if name not in self.records:
            self.records[name] = []
            self.names.append(name)
        plan = _KWLayerPlan(self.names.index(name), c1, c2, k, groups)
        self.records[name].append(plan)
        self.order.append(plan)
        return plan

    def store(self) -> None:
        """Finalize cell shapes and per-layer mixture plans
        (kernel_warehouse.py:264-302 with the default spatial_partition=True,
        cell in/out ratios 1 and nonlocal_basis_ratio=1)."""
        self.cell_shapes = []
        for name in self.names:
            plans = self.records[name]
            out_gcd = plans[0].out_planes
            in_gcd = plans[0].in_planes // plans[0].groups
            for p in plans:
                out_gcd = math.gcd(out_gcd, p.out_planes)
                in_gcd = math.gcd(in_gcd, p.in_planes // p.groups)
            cell_out, cell_in = max(out_gcd, 1), max(in_gcd, 1)
            total = 0
            for p in plans:
                p.groups_out = p.out_planes // cell_out
                p.groups_in = p.in_planes // cell_in // p.groups
                p.groups_spatial = p.k * p.k
                total += p.groups_out * p.groups_in * p.groups_spatial
            m = max(int(total * self.cell_num_ratio), 1)
            self.cell_shapes.append((m, cell_out, cell_in, 1))
            # static temperature assignment (kernel_warehouse.py:70-88)
            start = 0
            for p in plans:
                p.num_cells = m
                p.start_cell_idx = start
                nlm = p.groups_out * p.groups_in * p.groups_spatial
                kpm = m + 1
                tb = np.zeros(nlm * kpm, np.float32)
                if self.cell_num_ratio >= 1.0:
                    ncpm = int(self.cell_num_ratio)
                    s = start
                    for idx in range(nlm):
                        tb[idx * kpm + s] = 1.0
                        s += ncpm
                    start = s
                else:
                    nmpc = int(1.0 / self.cell_num_ratio)
                    s = start
                    for idx in range(nlm):
                        if idx % nmpc == (idx // nmpc) % nmpc:
                            tb[idx * kpm + s] = 1.0
                            s += 1
                        else:
                            tb[idx * kpm + kpm - 1] = 1.0
                    start = s
                p.temp_bias = tuple(tb.tolist())
        self.stored = True

    def warehouse_params(self, module: nn.Module) -> List[jnp.ndarray]:
        """Create the shared cell arrays as params of `module` (the
        GraphModel) — the flax owner of what torch keeps in
        Warehouse_Manager.weights."""
        cells = []
        for i, (m, co, ci, _) in enumerate(self.cell_shapes):
            cells.append(module.param(f"kw_warehouse_{i}", nn.initializers.normal(1.0), (m, co, ci), jnp.float32))
        return cells


class KWAttention(nn.Module):
    """Cell-mixture attention (kernel_warehouse.py:25): GAP -> fc ->
    BN -> ReLU -> fc to (M+1) logits per local mixture, L1-normalized and
    blended with the static one-hot assignment by the temperature."""

    in_planes: int
    num_cells: int
    num_local_mixture: int
    temp_bias: Tuple[float, ...]
    reduction: float = 0.0625
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temp, train: bool = False):
        b = x.shape[0]
        kpm = self.num_cells + 1
        hidden = max(int(self.in_planes * self.reduction), 16)
        s = x.mean(axis=(1, 2))  # (B, C) — GAP
        s = nn.Dense(hidden, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(s)
        s = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(s)
        s = nn.Dense(kpm * self.num_local_mixture, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(jax.nn.relu(s))
        s = s.reshape(-1, kpm)
        s = s / (jnp.abs(s).sum(axis=1, keepdims=True) + 1e-3)
        tb = jnp.asarray(self.temp_bias, s.dtype).reshape(1, -1)
        s = (1.0 - temp) * s.reshape(b, -1) + temp * tb
        return s.reshape(-1, kpm)[:, :-1].reshape(b, self.num_local_mixture, self.num_cells)


class KWConv2dLayer(nn.Module):
    """One warehouse-drawn conv (kernel_warehouse.py:107 KWConv2d): mixes
    the shared cells into a per-sample (out, in/g, k, k) kernel and applies
    a per-sample grouped conv via vmap."""

    plan: Any  # _KWLayerPlan
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, warehouse, temp, train: bool = False):
        p = self.plan
        b, h, w, c = x.shape
        nlm = p.groups_out * p.groups_in * p.groups_spatial
        att = KWAttention(p.in_planes, p.num_cells, nlm, p.temp_bias,
                          dtype=self.dtype, name="attention")(x, temp, train)
        cells = warehouse[p.warehouse_idx].astype(att.dtype)  # (M, co, ci)
        m, co, ci = cells.shape
        agg = jnp.einsum("bnm,mf->bnf", att, cells.reshape(m, co * ci))
        # (B, g_sp, g_out, g_in, co, ci) -> torch permute (0,2,4,3,5,1)
        agg = agg.reshape(b, p.groups_spatial, p.groups_out, p.groups_in, co, ci)
        agg = agg.transpose(0, 2, 4, 3, 5, 1)
        # -> (B, out, in/g, k, k); spatial cells enumerate taps row-major
        agg = agg.reshape(b, p.out_planes, (p.in_planes // p.groups), p.k, p.k)
        # flax HWIO layout per sample
        wts = agg.transpose(0, 3, 4, 2, 1).astype(self.dtype)
        pad = p.k // 2

        def one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None].astype(self.dtype), wi, (self.stride, self.stride),
                [(pad, pad), (pad, pad)], feature_group_count=p.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

        return jax.vmap(one)(x, wts)


class KWConvBN(nn.Module):
    """KWConv (kernel_warehouse.py:328): warehouse conv + BN + SiLU."""

    plan: Any
    stride: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, warehouse, temp, train: bool = False):
        y = KWConv2dLayer(self.plan, stride=self.stride, dtype=self.dtype, name="conv")(x, warehouse, temp, train)
        y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(y)
        return jax.nn.silu(y) if self.act else y


class KWConvModule(nn.Module):
    """Standalone KWConv graph layer."""

    kw_aware = True

    plan: Any
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, warehouse=None, kw_temp=0.0):
        return KWConvBN(self.plan, stride=self.stride, dtype=self.dtype, name="kw")(x, warehouse, kw_temp, train)


class _KWBottleneck(nn.Module):
    """Bottleneck_KW (block.py:1367): both convs drawn from the warehouse."""

    plans: Tuple[Any, Any]
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, warehouse, temp, train: bool = False):
        y = KWConvBN(self.plans[0], dtype=self.dtype, name="cv1")(x, warehouse, temp, train)
        y = KWConvBN(self.plans[1], dtype=self.dtype, name="cv2")(y, warehouse, temp, train)
        if self.shortcut and x.shape[-1] == y.shape[-1]:
            return x + y
        return y


class C2fKW(nn.Module):
    """C2f_KW (block.py:1387)."""

    kw_aware = True

    c2: int
    plans: Tuple[Tuple[Any, Any], ...]  # per inner bottleneck
    shortcut: bool = False
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, warehouse=None, kw_temp=0.0):
        from experiment_yolo_tpu.nn.modules import ConvBN

        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i, pp in enumerate(self.plans):
            ys.append(_KWBottleneck(pp, shortcut=self.shortcut, dtype=self.dtype, name=f"m{i}")(
                ys[-1], warehouse, kw_temp, train))
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3KW(nn.Module):
    """C3_KW (block.py:1381)."""

    kw_aware = True

    c2: int
    plans: Tuple[Tuple[Any, Any], ...]
    shortcut: bool = False
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, warehouse=None, kw_temp=0.0):
        from experiment_yolo_tpu.nn.modules import ConvBN

        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i, pp in enumerate(self.plans):
            y1 = _KWBottleneck(pp, shortcut=self.shortcut, dtype=self.dtype, name=f"m{i}")(
                y1, warehouse, kw_temp, train)
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)
