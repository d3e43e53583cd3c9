"""Extra module zoo, tranche 1: attention blocks, rep/ghost convs,
v9 ELAN blocks, dynamic upsamplers.

Rebuild of the most-used entries of the reference's
``nn/extra_modules/{attention.py,block.py,RFAConv.py}`` and the remaining
``nn/modules/{conv.py,block.py}`` classes, as flax modules (NHWC).
Each class cites its reference counterpart. All are registered in
``nn/tasks.py`` so model YAMLs can instantiate them.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from experiment_yolo_tpu.nn.norm import BatchNorm as MemBatchNorm

from experiment_yolo_tpu.nn.modules import (
    Bottleneck,
    ConvBN,
    DWConv,
    GhostConv,
    _act,
    _max_pool_same,
    _nearest_upsample,
    autopad,
    ldconv_bilinear_gather,
)

Dtype = Any


def _h_sigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def _h_swish(x):
    return x * _h_sigmoid(x)


def _conv2d(x, features, k, s=1, p=None, g=1, use_bias=True, dtype=jnp.float32, name="conv"):
    """Bare nn.Conv with torch-style symmetric padding (helper)."""
    pad = autopad(k, p)
    return nn.Conv(
        features, (k, k), strides=(s, s), padding=[(pad, pad), (pad, pad)],
        feature_group_count=g, use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32, name=name,
    )(x)


# ---------------------------------------------------------------------------
# attention (reference: nn/extra_modules/attention.py)
# ---------------------------------------------------------------------------


class SEAttention(nn.Module):
    """Squeeze-and-Excitation (attention.py:896)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))
        y = nn.Dense(max(c // self.reduction, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(y)
        return x * jax.nn.sigmoid(y)[:, None, None, :]


class EffectiveSE(nn.Module):
    """Effective squeeze-excite with hard sigmoid (attention.py:1052)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="fc")(y)
        return x * _h_sigmoid(y)


class SimAM(nn.Module):
    """Parameter-free SimAM attention (attention.py:53)."""

    e_lambda: float = 1e-4

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        n = h * w - 1
        mu = x.mean(axis=(1, 2), keepdims=True)
        d2 = (x - mu) ** 2
        y = d2 / (4 * (d2.sum(axis=(1, 2), keepdims=True) / n + self.e_lambda)) + 0.5
        return x * jax.nn.sigmoid(y)


class CoordAtt(nn.Module):
    """Coordinate attention (attention.py:586)."""

    reduction: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        x_h = x.mean(axis=2)[:, None]  # (B, 1, H, C)
        x_w = x.mean(axis=1)[:, None]  # (B, 1, W, C)
        y = jnp.concatenate([x_h, x_w], axis=2)
        y = nn.Conv(mip, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(y)
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn1")(y)
        y = _h_swish(y)
        y_h, y_w = y[:, :, :h], y[:, :, h:]
        a_h = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv_h")(y_h))
        a_w = jax.nn.sigmoid(nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv_w")(y_w))
        a_h = jnp.transpose(a_h, (0, 2, 1, 3))  # (B, H, 1, C)
        return x * a_h * a_w


class EMAAttention(nn.Module):
    """Efficient Multi-scale Attention (attention.py:24; 'EMA' in the yaml
    registry — renamed to avoid clashing with the weight-averaging EMA)."""

    factor: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.factor
        cg = c // g
        xg = x.reshape(b, h, w, g, cg).transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, cg)
        x_h = xg.mean(axis=2)[:, :, None]  # (bg, H, 1, cg)
        x_w = xg.mean(axis=1)[:, None]  # (bg, 1, W, cg)
        hw = jnp.concatenate([x_h.transpose(0, 2, 1, 3), x_w], axis=2)  # (bg,1,H+W,cg)
        hw = nn.Conv(cg, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv1x1")(hw)
        a_h, a_w = hw[:, :, :h], hw[:, :, h:]
        a_h = a_h.transpose(0, 2, 1, 3)  # (bg, H, 1, cg)
        x1 = xg * jax.nn.sigmoid(a_h) * jax.nn.sigmoid(a_w)
        x1 = nn.GroupNorm(num_groups=cg, dtype=self.dtype, param_dtype=jnp.float32, name="gn")(x1)
        x2 = _conv2d(xg, cg, 3, dtype=self.dtype, name="conv3x3")
        x11 = jax.nn.softmax(x1.mean(axis=(1, 2)), axis=-1)[:, None]  # (bg,1,cg)
        x12 = x2.reshape(b * g, h * w, cg)
        x21 = jax.nn.softmax(x2.mean(axis=(1, 2)), axis=-1)[:, None]
        x22 = x1.reshape(b * g, h * w, cg)
        weights = (
            jnp.einsum("bic,bnc->bn", x11, x12) + jnp.einsum("bic,bnc->bn", x21, x22)
        ).reshape(b * g, h, w, 1)
        out = xg * jax.nn.sigmoid(weights)
        return out.reshape(b, g, h, w, cg).transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)


class ChannelAttention(nn.Module):
    """CBAM channel branch (reference conv.py:ChannelAttention)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="fc")(y)
        return x * jax.nn.sigmoid(y)


class SpatialAttention(nn.Module):
    """CBAM spatial branch (reference conv.py:SpatialAttention)."""

    k: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = jnp.concatenate([x.mean(-1, keepdims=True), x.max(-1, keepdims=True)], axis=-1)
        y = _conv2d(y, 1, self.k, use_bias=False, dtype=self.dtype, name="cv1")
        return x * jax.nn.sigmoid(y)


class CBAM(nn.Module):
    """Convolutional block attention module (reference conv.py:CBAM)."""

    k: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(dtype=self.dtype, name="channel_attention")(x, train)
        return SpatialAttention(self.k, dtype=self.dtype, name="spatial_attention")(x, train)


class TripletAttention(nn.Module):
    """Rotate-to-interact triplet attention (attention.py:661)."""

    no_spatial: bool = False
    dtype: Dtype = jnp.float32

    def _gate(self, x, train, name):
        z = jnp.concatenate([x.max(-1, keepdims=True), x.mean(-1, keepdims=True)], axis=-1)
        z = _conv2d(z, 1, 7, use_bias=False, dtype=self.dtype, name=f"{name}_conv")
        z = MemBatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-5,
                         dtype=self.dtype, param_dtype=jnp.float32, name=f"{name}_bn")(z)
        return x * jax.nn.sigmoid(z)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # branch 1: interact C and H (rotate W->channel axis)
        x1 = jnp.transpose(x, (0, 3, 2, 1))  # (B, C, W, H): channel-last = H
        x1 = self._gate(x1, train, "cw")
        x1 = jnp.transpose(x1, (0, 3, 2, 1))
        # branch 2: interact C and W
        x2 = jnp.transpose(x, (0, 1, 3, 2))  # (B, H, C, W)
        x2 = self._gate(x2, train, "hc")
        x2 = jnp.transpose(x2, (0, 1, 3, 2))
        if self.no_spatial:
            return (x1 + x2) / 2
        x3 = self._gate(x, train, "hw")
        return (x1 + x2 + x3) / 3


class SpatialGroupEnhance(nn.Module):
    """Spatial group enhance (attention.py:80): per-group similarity to the
    pooled group descriptor, normalized + affine, sigmoid gate."""

    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.groups
        weight = self.param("weight", nn.initializers.zeros, (g,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (g,), jnp.float32)
        xg = x.reshape(b, h, w, g, c // g)
        xn = (xg * xg.mean(axis=(1, 2), keepdims=True)).sum(-1)  # (b,h,w,g)
        t = xn.reshape(b, h * w, g)
        t = t - t.mean(axis=1, keepdims=True)
        # torch .std defaults to the UNBIASED estimator (ddof=1)
        t = t / (t.std(axis=1, keepdims=True, ddof=1) + 1e-5)
        t = t * weight + bias
        gate = jax.nn.sigmoid(t.reshape(b, h, w, g, 1))
        return (xg * gate).reshape(b, h, w, c)


class BAMBlock(nn.Module):
    """BAM (attention.py:733): channel MLP + dilated spatial conv tower,
    (1 + sigmoid(ca + sa)) * x."""

    reduction: int = 16
    dia_val: int = 2
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        r = c // self.reduction
        # channel branch (attention.py:689): Linear+BN1d+ReLU x3 + Linear
        y = x.mean(axis=(1, 2))
        for i in range(self.num_layers):
            y = nn.Dense(r if i < self.num_layers else c, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"ca_fc{i}")(y)
            y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"ca_bn{i}")(y)
            y = jax.nn.relu(y)
        ca = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="ca_last")(y)[:, None, None, :]
        # spatial branch (attention.py:712)
        s = nn.Conv(r, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="sa_reduce")(x)
        s = jax.nn.relu(MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype, param_dtype=jnp.float32, name="sa_bn_r")(s))
        d = self.dia_val
        for i in range(self.num_layers):
            s = nn.Conv(r, (3, 3), padding=[(d, d)] * 2, kernel_dilation=(d, d), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"sa_conv{i}")(s)
            s = jax.nn.relu(MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, param_dtype=jnp.float32, name=f"sa_bn{i}")(s))
        sa = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="sa_last")(s)
        return (1.0 + jax.nn.sigmoid(ca + sa)) * x


def _dw(x, k, dtype, name, d=1):
    """Depthwise conv with (kh, kw) kernel, torch default bias=True."""
    kh, kw = k if isinstance(k, tuple) else (k, k)
    ph, pw = d * (kh - 1) // 2, d * (kw - 1) // 2
    return nn.Conv(x.shape[-1], (kh, kw), padding=[(ph, ph), (pw, pw)], feature_group_count=x.shape[-1],
                   kernel_dilation=(d, d), use_bias=True, dtype=dtype, param_dtype=jnp.float32, name=name)(x)


class CPCA(nn.Module):
    """Channel-prior convolutional attention (attention.py:950). NB the
    reference calls ONE shared 1x1 conv at three different points of the
    flow (self.conv reused) — replicated with a single shared kernel."""

    reduce: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        shared = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="conv")
        x = jax.nn.gelu(shared(x))
        # channel attention with shared fc over avg+max pools
        fc1 = nn.Conv(c // self.reduce, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="ca_fc1")
        fc2 = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="ca_fc2")
        a1 = jax.nn.sigmoid(fc2(jax.nn.relu(fc1(x.mean(axis=(1, 2), keepdims=True)))))
        a2 = jax.nn.sigmoid(fc2(jax.nn.relu(fc1(x.max(axis=(1, 2), keepdims=True)))))
        x = x * (a1 + a2)
        init = _dw(x, 5, self.dtype, "dconv5_5")
        x1 = _dw(_dw(init, (1, 7), self.dtype, "dconv1_7"), (7, 1), self.dtype, "dconv7_1")
        x2 = _dw(_dw(init, (1, 11), self.dtype, "dconv1_11"), (11, 1), self.dtype, "dconv11_1")
        x3 = _dw(_dw(init, (1, 21), self.dtype, "dconv1_21"), (21, 1), self.dtype, "dconv21_1")
        spatial = shared(x1 + x2 + x3 + init)
        return shared(spatial * x)


class MPCA(nn.Module):
    """Multi-path coordinate attention (attention.py:985)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv_bn_silu(t, kh, kw, name):
            c = t.shape[-1]
            y = nn.Conv(c, (kh, kw), padding=[((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)],
                        use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name=f"{name}_c")(t)
            y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"{name}_bn")(y)
            return jax.nn.silu(y)

        b, h, w, c = x.shape
        gap = conv_bn_silu(x.mean(axis=(1, 2), keepdims=True), 1, 1, "gap_conv")
        ph = x.mean(axis=2)[:, :, None]  # (b, h, 1, c)
        pw = x.mean(axis=1)[:, :, None]  # (b, w, 1, c) (width laid along axis 1)
        hw = jnp.concatenate([ph, pw], axis=1)  # (b, h+w, 1, c)
        hw = conv_bn_silu(hw, 3, 1, "conv_hw")
        wgt = jax.nn.sigmoid(conv_bn_silu(hw, 1, 1, "conv_pool_hw"))
        ph2 = hw[:, :h] * wgt[:, :h]  # (b, h, 1, c)
        pw2 = hw[:, h:] * wgt[:, h:]  # (b, w, 1, c)
        ch_gate = gap * wgt.mean(axis=1, keepdims=True)
        gate_h = jax.nn.sigmoid(ph2)  # broadcasts over width
        gate_w = jax.nn.sigmoid(pw2)[:, :, 0][:, None]  # (b, 1, w, c)
        return x * gate_h * gate_w * jax.nn.sigmoid(ch_gate)


LSKA_CFGS = {  # k_size -> (k0, ks, dilation, pad_spatial)
    7: (3, 3, 2, 2), 11: (3, 5, 2, 4), 23: (5, 7, 3, 9),
    35: (5, 11, 3, 15), 41: (5, 13, 3, 18), 53: (5, 17, 3, 24),
}


class LSKA(nn.Module):
    """Large separable kernel attention (attention.py:1067): factorized
    1xk/kx1 depthwise pairs + dilated pair + 1x1, multiplicative gate."""

    k_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k0, ks, d, _ = LSKA_CFGS[self.k_size]
        a = _dw(x, (1, k0), self.dtype, "conv0h")
        a = _dw(a, (k0, 1), self.dtype, "conv0v")
        a = _dw(a, (1, ks), self.dtype, "conv_spatial_h", d=d)
        a = _dw(a, (ks, 1), self.dtype, "conv_spatial_v", d=d)
        a = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(a)
        return x * a


class SegNextAttention(nn.Module):
    """SegNeXt MSCA (attention.py:1117): 5x5 dw + three factorized
    strip-conv branches summed, 1x1, multiplicative gate."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = _dw(x, 5, self.dtype, "conv0")
        a0 = _dw(_dw(a, (1, 7), self.dtype, "conv0_1"), (7, 1), self.dtype, "conv0_2")
        a1 = _dw(_dw(a, (1, 11), self.dtype, "conv1_1"), (11, 1), self.dtype, "conv1_2")
        a2 = _dw(_dw(a, (1, 21), self.dtype, "conv2_1"), (21, 1), self.dtype, "conv2_2")
        a = a + a0 + a1 + a2
        a = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="conv3")(a)
        return a * x


def _adaptive_avg_pool(x, oh, ow):
    """torch AdaptiveAvgPool2d for NHWC (exact bin arithmetic)."""
    b, h, w, c = x.shape
    rows = []
    for i in range(oh):
        y0, y1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            x0, x1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(x[:, y0:y1, x0:x1].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (b, oh, ow, c)


class MLCA(nn.Module):
    """Mixed local-channel attention (attention.py:1484): ECA-style 1-D
    convs over local (5x5-pooled) and global descriptors, blended and
    broadcast back (the reference's un-pool is an adaptive-avg-pool
    upsample)."""

    in_size: int
    local_size: int = 5
    gamma: int = 2
    b: int = 1
    local_weight: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _m

        bsz, h, w, c = x.shape
        t = int(abs(_m.log(self.in_size, 2) + self.b) / self.gamma)
        k = t if t % 2 else t + 1
        ls = self.local_size
        local = _adaptive_avg_pool(x, ls, ls)  # (b, ls, ls, c)
        glob = local.mean(axis=(1, 2))  # (b, c)
        # ECA conv over the channel sequence (torch Conv1d(1,1,k))
        kern_l = self.param("conv_local", nn.initializers.lecun_normal(), (k, 1, 1), jnp.float32)
        kern_g = self.param("conv", nn.initializers.lecun_normal(), (k, 1, 1), jnp.float32)
        def eca(seq, kern):  # seq (b, N): torch Conv1d(1, 1, k) over N
            out = jax.lax.conv_general_dilated(
                seq[:, None, :], kern.transpose(2, 1, 0), (1,), [(k // 2, k // 2)],
                dimension_numbers=("NCH", "OIH", "NCH"),
            )
            return out[:, 0]

        # torch layout: local flattened pixel-major with channels fastest
        y_l = eca(local.reshape(bsz, ls * ls * c), kern_l)
        y_g = eca(glob, kern_g)
        att_local = jax.nn.sigmoid(y_l.reshape(bsz, ls, ls, c))
        att_global = jax.nn.sigmoid(y_g)[:, None, None, :]  # broadcast to (ls, ls)
        att = att_global * (1 - self.local_weight) + att_local * self.local_weight
        att = jax.image.resize(att, (bsz, h, w, c), "nearest")  # un-pool
        return x * att


class ELA(nn.Module):
    """Efficient local attention (attention.py:1747): 1D convs over pooled
    H and W profiles with GroupNorm gates."""

    dtype: Dtype = jnp.float32

    def _gate(self, v, c, name):
        # v: (B, L, C) pooled profile; conv1d over L per channel? reference
        # uses Conv1d(C, C, 1) == pointwise dense over channels
        y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name=f"{name}_fc")(v)
        y = nn.GroupNorm(num_groups=min(16, c), dtype=self.dtype, param_dtype=jnp.float32, name=f"{name}_gn")(y)
        return jax.nn.sigmoid(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        x_h = self._gate(x.mean(axis=2), c, "h")[:, :, None, :]  # (B, H, 1, C)
        x_w = self._gate(x.mean(axis=1), c, "w")[:, None, :, :]  # (B, 1, W, C)
        return x * x_h * x_w


class CAA(nn.Module):
    """Context anchor attention (PKINet, attention.py:1765): avg pool +
    factorized large-kernel depthwise convs -> sigmoid gate."""

    h_kernel: int = 11
    v_kernel: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        a = nn.avg_pool(x, (7, 7), strides=(1, 1), padding=[(3, 3), (3, 3)])
        a = ConvBN(c, 1, dtype=self.dtype, name="conv1")(a, train)
        a = nn.Conv(c, (1, self.h_kernel), padding=[(0, 0), (self.h_kernel // 2, self.h_kernel // 2)],
                    feature_group_count=c, dtype=self.dtype, param_dtype=jnp.float32, name="h_conv")(a)
        a = nn.Conv(c, (self.v_kernel, 1), padding=[(self.v_kernel // 2, self.v_kernel // 2), (0, 0)],
                    feature_group_count=c, dtype=self.dtype, param_dtype=jnp.float32, name="v_conv")(a)
        a = ConvBN(c, 1, dtype=self.dtype, name="conv2")(a, train)
        return x * jax.nn.sigmoid(a)


class LSKBlock(nn.Module):
    """Large selective kernel block (attention.py:878): dual-branch large
    receptive field depthwise convs with spatial selection."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="proj_1")(x)
        y = jax.nn.gelu(y)
        # spatial gating unit
        a1 = nn.Conv(c, (5, 5), padding=[(2, 2)] * 2, feature_group_count=c,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv0")(y)
        a2 = nn.Conv(c, (7, 7), padding=[(9, 9)] * 2, kernel_dilation=(3, 3), feature_group_count=c,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv_spatial")(a1)
        b1 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(a1)
        b2 = nn.Conv(c // 2, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(a2)
        cat = jnp.concatenate([b1, b2], -1)
        agg = jnp.concatenate([cat.mean(-1, keepdims=True), cat.max(-1, keepdims=True)], -1)
        sig = jax.nn.sigmoid(
            nn.Conv(2, (7, 7), padding=[(3, 3)] * 2, dtype=self.dtype, param_dtype=jnp.float32, name="conv_squeeze")(agg)
        )
        attn = b1 * sig[..., 0:1] + b2 * sig[..., 1:2]
        attn = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv")(attn)
        y = y * attn
        return x + nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="proj_2")(y)


# ---------------------------------------------------------------------------
# conv variants (reference: nn/modules/conv.py, extra_modules/RFAConv.py)
# ---------------------------------------------------------------------------


class Conv2Mod(nn.Module):
    """Conv with a parallel 1x1 branch sharing one BN (conv.py:Conv2)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv2d(x, self.c2, self.k, self.s, g=self.g, use_bias=False, dtype=self.dtype, name="conv")
        y2 = _conv2d(x, self.c2, 1, self.s, g=self.g, use_bias=False, dtype=self.dtype, name="cv2")
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(y + y2)
        return _act(self.act, y)


class DSConv(nn.Module):
    """Depthwise-separable conv (conv.py:DSConv: DW 3x3 then PW 1x1)."""

    c2: int
    k: int = 1
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = DWConv(x.shape[-1], 3, dtype=self.dtype, name="dwconv")(x, train)
        return ConvBN(self.c2, 1, dtype=self.dtype, name="pwconv")(y, train)


class LightConv(nn.Module):
    """1x1 conv then DW conv with ReLU (conv.py:LightConv)."""

    c2: int
    k: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return DWConv(self.c2, self.k, act="relu", dtype=self.dtype, name="conv2")(y, train)


class RepConv(nn.Module):
    """RepVGG-style 3x3 + 1x1 (+BN identity) sum (conv.py:RepConv).

    Training keeps the branches; at inference the branches are algebraically
    fusable, but on TPU XLA computes the two convs as one fused graph pass
    anyway, so no re-parameterization step is needed.
    """

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    act: Any = True
    use_bn_branch: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y1 = ConvBN(self.c2, self.k, self.s, g=self.g, act=False, dtype=self.dtype, name="conv1")(x, train)
        y2 = ConvBN(self.c2, 1, self.s, g=self.g, act=False, dtype=self.dtype, name="conv2")(x, train)
        out = y1 + y2
        if self.use_bn_branch and x.shape[-1] == self.c2 and self.s == 1:
            out = out + MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                                     dtype=self.dtype, param_dtype=jnp.float32, name="bn_id")(x)
        return _act(self.act, out)


class ConvTranspose(nn.Module):
    """Transposed conv + BN + act (conv.py:ConvTranspose)."""

    c2: int
    k: int = 2
    s: int = 2
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.ConvTranspose(self.c2, (self.k, self.k), strides=(self.s, self.s), padding="VALID",
                             use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="conv_transpose")(x)
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(y)
        return _act(self.act, y)


class RFAConv(nn.Module):
    """Receptive-field attention conv (RFAConv.py:24).

    Per-pixel softmax weights over the k*k receptive field modulate
    depthwise-generated k*k features; the weighted field unfolds to a
    (kh, kw)-expanded map consumed by a stride-k conv.
    """

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        kk = self.k * self.k
        # weights: avg-pool k then grouped 1x1 -> (B, h', w', c*k^2)
        pad = self.k // 2
        avg = nn.avg_pool(x, (self.k, self.k), strides=(self.s, self.s), padding=[(pad, pad), (pad, pad)])
        wgt = nn.Conv(c * kk, (1, 1), feature_group_count=c, use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32, name="get_weight")(avg)
        ho, wo = wgt.shape[1:3]
        wgt = jax.nn.softmax(wgt.reshape(b, ho, wo, c, kk), axis=-1)
        # features: grouped kxk conv -> BN -> ReLU
        feat = nn.Conv(c * kk, (self.k, self.k), strides=(self.s, self.s), padding=[(pad, pad), (pad, pad)],
                       feature_group_count=c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                       name="generate_feature")(x)
        feat = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                            dtype=self.dtype, param_dtype=jnp.float32, name="bn")(feat)
        feat = jax.nn.relu(feat).reshape(b, ho, wo, c, kk)
        weighted = feat * wgt  # (B, h, w, C, k^2)
        # unfold (h n1) (w n2): expand each pixel to a kxk patch
        weighted = weighted.reshape(b, ho, wo, c, self.k, self.k)
        weighted = weighted.transpose(0, 1, 4, 2, 5, 3).reshape(b, ho * self.k, wo * self.k, c)
        return ConvBN(self.c2, self.k, self.k, p=0, dtype=self.dtype, name="conv")(weighted, train)


# ---------------------------------------------------------------------------
# blocks (reference: nn/modules/block.py, extra_modules/block.py)
# ---------------------------------------------------------------------------


def _adaptive_avg_to(x, h, w):
    """Adaptive average pool to (h, w) for integer downscale factors."""
    b, hh, ww, c = x.shape
    fh, fw = hh // h, ww // w
    return x[:, : h * fh, : w * fw].reshape(b, h, fh, w, fw, c).mean(axis=(2, 4))


def _bilinear_to(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="bilinear")


class SimFusion3in(nn.Module):
    """GOLD-YOLO 3-level fusion (extra block.py:1923): pool the finer level,
    upsample the coarser, 1x1-project all to a common width, fuse."""

    c2: int
    inc: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        l, m, s = xs
        h, w = m.shape[1:3]
        l = _adaptive_avg_to(l, h, w)
        s = _bilinear_to(s, h, w)
        outs = []
        for i, (t, cin) in enumerate(zip((l, m, s), self.inc or (0, 0, 0))):
            if cin != self.c2:
                t = ConvBN(self.c2, 1, act="relu", dtype=self.dtype, name=f"cv{i + 1}")(t, train)
            outs.append(t)
        return ConvBN(self.c2, 1, act="relu", dtype=self.dtype, name="cv_fuse")(jnp.concatenate(outs, -1), train)


class SimFusion4in(nn.Module):
    """GOLD-YOLO 4-level gather: pool/upsample everything to the 3rd level's
    size and concat (extra block.py:1945)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x_l, x_m, x_s, x_n = xs
        h, w = x_s.shape[1:3]
        return jnp.concatenate(
            [_adaptive_avg_to(x_l, h, w), _adaptive_avg_to(x_m, h, w), x_s, _bilinear_to(x_n, h, w)], -1
        )


class AdvPoolFusion(nn.Module):
    """GOLD-YOLO pool-then-concat of two levels (extra block.py:2188)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        a, b = xs
        h, w = b.shape[1:3]
        return jnp.concatenate([_adaptive_avg_to(a, h, w), b], -1)


class PyramidPoolAgg(nn.Module):
    """GOLD-YOLO pyramid pooling aggregation: pool all levels to the
    (stride-derived) smallest grid and concat (extra block.py:2039)."""

    stride: int = 2

    @nn.compact
    def __call__(self, xs, train: bool = False):
        h, w = xs[-1].shape[1:3]
        th, tw = max((h - 1) // self.stride + 1, 1), max((w - 1) // self.stride + 1, 1)
        return jnp.concatenate([_adaptive_avg_to(x, th, tw) for x in xs], -1)


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 convs + parallel maxpool branch (block.py:79)."""

    cm: int
    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.cm, 3, 2, act="relu", dtype=self.dtype, name="stem1")(x, train)
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBN(self.cm // 2, 2, 1, p=0, act="relu", dtype=self.dtype, name="stem2a")(xp, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = ConvBN(self.cm, 2, 1, p=0, act="relu", dtype=self.dtype, name="stem2b")(x2, train)
        x1 = nn.max_pool(xp, (2, 2), strides=(1, 1))  # k2 s1 on the padded map
        x = jnp.concatenate([x1, x2], -1)
        x = ConvBN(self.cm, 3, 2, act="relu", dtype=self.dtype, name="stem3")(x, train)
        return ConvBN(self.c2, 1, 1, act="relu", dtype=self.dtype, name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 HG block: n (Light)Convs densely concatenated, then
    squeeze/excitation convs (block.py:110)."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    variant: str = "light"  # light | ghost | rep | dynamic (extra block.py:2846-2933)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ys = [x]
        for i in range(self.n):
            if not self.lightconv:
                ys.append(ConvBN(self.cm, self.k, act="relu", dtype=self.dtype, name=f"m{i}")(ys[-1], train))
            elif self.variant == "ghost":
                ys.append(GhostConv(self.cm, self.k, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
            elif self.variant == "rep":
                # RepLightConv (extra block.py:2869): 1x1 no-act + dw RepConv
                z = ConvBN(self.cm, 1, act=False, dtype=self.dtype, name=f"m{i}_pw")(ys[-1], train)
                ys.append(RepConv(self.cm, self.k, 1, g=self.cm, dtype=self.dtype, name=f"m{i}_rep")(z, train))
            elif self.variant == "dynamic":
                from experiment_yolo_tpu.nn.zoo_blocks import DynamicConv

                ys.append(DynamicConv(self.cm, k=self.k, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
            else:
                ys.append(LightConv(self.cm, self.k, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        y = ConvBN(self.c2 // 2, 1, 1, act="relu", dtype=self.dtype, name="sc")(jnp.concatenate(ys, -1), train)
        y = ConvBN(self.c2, 1, 1, act="relu", dtype=self.dtype, name="ec")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return y + x
        return y


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (block.py:299)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="gc1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="gc2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, dtype=self.dtype, name="sc_dw")(x, train)
            sc = ConvBN(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else ConvBN(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(x, train)
        return y + sc


class C3Ghost(nn.Module):
    """C3 with Ghost bottlenecks (block.py:C3Ghost)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = GhostBottleneck(c_, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)


class C3x(nn.Module):
    """C3 with cross convolutions (1,3)/(3,1) (block.py:C3x)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            z = _cross_conv(y1, c_, (1, 3), self.dtype, f"m{i}_cv1", train, self)
            z = _cross_conv(z, c_, (3, 1), self.dtype, f"m{i}_cv2", train, self)
            y1 = y1 + z if self.shortcut else z
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)


def _cross_conv(x, c2, kk, dtype, name, train, parent):
    kh, kw = kk
    y = nn.Conv(c2, (kh, kw), padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)], use_bias=False,
                dtype=dtype, param_dtype=jnp.float32, name=f"{name}_conv")(x)
    y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                     dtype=dtype, param_dtype=jnp.float32, name=f"{name}_bn")(y)
    return jax.nn.silu(y)


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck (block.py:BottleneckCSP)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, name=f"m{i}")(y1, train)
        y1 = _conv2d(y1, c_, 1, use_bias=False, dtype=self.dtype, name="cv3")
        y2 = _conv2d(x, c_, 1, use_bias=False, dtype=self.dtype, name="cv2")
        y = jnp.concatenate([y1, y2], -1)
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(y)
        y = jax.nn.silu(y)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv4")(y, train)


class RepNCSP(nn.Module):
    """C3 built from RepConv bottlenecks (block.py:RepNCSP, v9).

    ``inner='dbb'`` swaps the RepConvN for a DiverseBranchBlock
    (block.py:4629 DBBNCSP), the DBBNCSPELAN4 building block."""

    c2: int
    n: int = 1
    e: float = 0.5
    inner: str = "rep"
    kernel: int = 7  # DRBNCSP branch kernel (block.py:4641)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            if self.inner == "dbb":
                from experiment_yolo_tpu.nn.zoo_blocks import DiverseBranchBlock

                z = DiverseBranchBlock(c_, k=3, dtype=self.dtype, name=f"m{i}_cv1")(y1, train)
            elif self.inner == "orepa":
                from experiment_yolo_tpu.nn.zoo_blocks import OREPA

                z = OREPA(c_, dtype=self.dtype, name=f"m{i}_cv1")(y1, train)
            elif self.inner == "drb":
                from experiment_yolo_tpu.nn.zoo_blocks import DilatedReparamBlock

                z = DilatedReparamBlock(self.kernel, dtype=self.dtype, name=f"m{i}_cv1")(y1, train)
            else:
                z = RepConv(c_, 3, 1, dtype=self.dtype, name=f"m{i}_cv1")(y1, train)
            z = ConvBN(c_, 3, 1, dtype=self.dtype, name=f"m{i}_cv2")(z, train)
            y1 = y1 + z
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)


class RepNCSPELAN4(nn.Module):
    """YOLOv9 CSP-ELAN block (extra block.py:4647).

    ``inner='dbb'`` = DBBNCSPELAN4 (block.py:4667); ``caa=True`` =
    RepNCSPELAN4_CAA (block.py:5047, CAA attention before cv4)."""

    c2: int
    c3: int
    c4: int
    n: int = 1
    inner: str = "rep"
    caa: bool = False
    kernel: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = self.c3 // 2
        y = ConvBN(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :half], y[..., half:]]
        z = RepNCSP(self.c4, n=self.n, inner=self.inner, kernel=self.kernel, dtype=self.dtype, name="cv2_csp")(ys[-1], train)
        z = ConvBN(self.c4, 3, 1, dtype=self.dtype, name="cv2_conv")(z, train)
        ys.append(z)
        z = RepNCSP(self.c4, n=self.n, inner=self.inner, kernel=self.kernel, dtype=self.dtype, name="cv3_csp")(ys[-1], train)
        z = ConvBN(self.c4, 3, 1, dtype=self.dtype, name="cv3_conv")(z, train)
        ys.append(z)
        out = jnp.concatenate(ys, -1)
        if self.caa:
            out = CAA(dtype=self.dtype, name="caa")(out)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv4")(out, train)


class CBLinear(nn.Module):
    """YOLOv9 cross-branch linear (extra block.py:4700): one biased conv
    split into a list of per-branch channel groups."""

    c2s: Tuple[int, ...]
    k: int = 1
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        y = nn.Conv(sum(self.c2s), (self.k, self.k), strides=(self.s, self.s),
                    padding=[(p, p)] * 2, use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        outs, start = [], 0
        for c in self.c2s:
            outs.append(y[..., start : start + c])
            start += c
        return outs


class CBFuse(nn.Module):
    """YOLOv9 cross-branch fuse (extra block.py:4710): pick idx[i] from each
    CBLinear list, nearest-upsample to the last input's size, sum."""

    idx: Tuple[int, ...]

    @nn.compact
    def __call__(self, xs, train: bool = False):
        target = xs[-1]
        th, tw = target.shape[1:3]
        total = target
        for i, x in enumerate(xs[:-1]):
            sel = x[self.idx[i]]
            if sel.shape[1] != th:
                sel = jax.image.resize(sel, (sel.shape[0], th, tw, sel.shape[-1]), "nearest")
            total = total + sel
        return total


class ADown(nn.Module):
    """YOLOv9 asymmetric downsample (extra block.py:4685)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding=[(0, 1), (0, 1)], count_include_pad=False)
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        x1 = ConvBN(c, 3, 2, dtype=self.dtype, name="cv1")(x1, train)
        x2 = _max_pool_same(x2, 3)[:, ::2, ::2]
        x2 = ConvBN(c, 1, 1, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], -1)


class SConvBank(nn.Module):
    """Template-bank shared convolution (the fork's TemplateBank + SConv2d,
    reference nn/modules/block.py:397-422): a small bank of full kernels is
    combined by per-site learned coefficients into one conv kernel — soft
    parameter sharing across the network."""

    c2: int
    k: int = 3
    num_templates: int = 4
    p: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        bank = self.param(
            "templates",
            nn.initializers.he_normal(),
            (self.num_templates, self.k, self.k, c1, self.c2),
            jnp.float32,
        )
        coeff = self.param("coefficients", nn.initializers.normal(0.01), (self.num_templates, 1, 1, 1, 1), jnp.float32)
        kernel = (bank * coeff).sum(0)  # (k, k, c1, c2)
        pad = self.k // 2 if self.p is None else self.p
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class SC2f(nn.Module):
    """C2f with shared-template convs + channel attention (the fork's SC2f,
    reference block.py:420)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    num_templates: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        x = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn_input")(x)
        y = SConvBank(2 * c, 3, self.num_templates, dtype=self.dtype, name="cv1")(x, train)
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn1")(y)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, True, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        cat = jnp.concatenate(ys, -1)
        # channel attention (squeeze -> 1x1 -> SiLU -> 1x1 -> sigmoid)
        a = cat.mean(axis=(1, 2), keepdims=True)
        cc = cat.shape[-1]
        a = nn.Conv(cc, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="ca1")(a)
        a = nn.Conv(cc, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="ca2")(jax.nn.silu(a))
        cat = cat * jax.nn.sigmoid(a)
        out = SConvBank(self.c2, 3, self.num_templates, dtype=self.dtype, name="cv2")(cat, train)
        return MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                            dtype=self.dtype, param_dtype=jnp.float32, name="bn2")(out)


class ESC2f(nn.Module):
    """Efficient SC2f: reduced template banks, GroupNorm, factorized
    bottlenecks, lightweight attention (the fork's ESC2f, block.py:508)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    num_templates: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        nt = max(2, self.num_templates // 2)
        y = SConvBank(2 * c, 3, nt, dtype=self.dtype, name="cv1")(x, train)
        y = nn.GroupNorm(num_groups=min(8, 2 * c), dtype=self.dtype, param_dtype=jnp.float32, name="gn1")(y)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, True, max(self.g * 2, 2), k=(1, 3), e=0.5, dtype=self.dtype, name=f"m{i}")(ys[-1], train)
            )
        cat = jnp.concatenate(ys, -1)
        cc = cat.shape[-1]
        mid = max(8, cc // 8)
        a = cat.mean(axis=(1, 2), keepdims=True)
        a = nn.Conv(mid, (1, 1), feature_group_count=math.gcd(mid, cc), dtype=self.dtype,
                    param_dtype=jnp.float32, name="ca1")(a)
        a = nn.Conv(cc, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="ca2")(jax.nn.silu(a))
        cat = cat * jax.nn.sigmoid(a)
        out = SConvBank(self.c2, 1, nt, p=0, dtype=self.dtype, name="cv2")(cat, train)
        return nn.GroupNorm(num_groups=min(8, self.c2), dtype=self.dtype, param_dtype=jnp.float32, name="gn2")(out)


class DynamicScalSeq(nn.Module):
    """ScalSeq with DySample learned upsamplers instead of nearest
    (reference block.py:3445 DynamicScalSeq)."""

    c2: int
    inc: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        p3, p4, p5 = xs
        if self.inc and self.inc[0] != self.c2:
            p3 = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="conv0")(p3, train)
        p4 = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="conv1")(p4, train)
        p5 = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="conv2")(p5, train)
        g = 4 if self.c2 % 4 == 0 else 1
        p4 = DySample(scale=2, groups=g, dtype=self.dtype, name="dysample1")(p4, train)
        p5 = DySample(scale=4, groups=g, dtype=self.dtype, name="dysample2")(p5, train)
        # scale axis adjacent to channels — see ScalSeq (modules.py) for the
        # layout rationale; identical math
        stack = jnp.stack([p3, p4, p5], axis=3)
        stack = nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32, name="conv3d")(stack)
        stack = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                             dtype=self.dtype, param_dtype=jnp.float32, name="bn")(stack)
        return jax.nn.leaky_relu(stack, 0.1).max(axis=3)


class ResNetBlock(nn.Module):
    """ResNet bottleneck block (reference block.py:360)."""

    c2: int
    s: int = 1
    e: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c3 = self.e * self.c2
        y = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.c2, 3, self.s, dtype=self.dtype, name="cv2")(y, train)
        y = ConvBN(c3, 1, act=False, dtype=self.dtype, name="cv3")(y, train)
        if self.s != 1 or x.shape[-1] != c3:
            sc = ConvBN(c3, 1, self.s, act=False, dtype=self.dtype, name="shortcut")(x, train)
        else:
            sc = x
        return jax.nn.relu(y + sc)


class ResNetLayer(nn.Module):
    """ResNet stage (reference block.py:377). is_first => 7x7 stem + maxpool."""

    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            y = ConvBN(self.c2, 7, 2, p=3, dtype=self.dtype, name="stem")(x, train)
            y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            return nn.max_pool(y, (3, 3), strides=(2, 2))
        y = ResNetBlock(self.c2, self.s, self.e, dtype=self.dtype, name="block0")(x, train)
        for i in range(1, self.n):
            y = ResNetBlock(self.c2, 1, self.e, dtype=self.dtype, name=f"block{i}")(y, train)
        return y


class RepC3(nn.Module):
    """RT-DETR neck block: RepConv chain + parallel 1x1 (block.py:262)."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = RepConv(c_, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        out = y1 + y2
        if c_ != self.c2:
            out = ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(out, train)
        return out


class DySample(nn.Module):
    """Dynamic upsampler with learned sub-pixel offsets (extra block.py:3819,
    'lp' style). Bilinear resampling reuses the LDConv gather."""

    scale: int = 2
    groups: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, g = self.scale, self.groups
        assert c % g == 0
        off = nn.Conv(2 * g * s * s, (1, 1), kernel_init=nn.initializers.normal(0.001),
                      dtype=self.dtype, param_dtype=jnp.float32, name="offset")(x)
        off = off.reshape(b, h, w, g, s * s, 2) * 0.25
        # init_pos: sub-pixel center offsets of the s*s output cells
        lin = (jnp.arange(s, dtype=jnp.float32) - (s - 1) / 2) / s
        dy, dx = jnp.meshgrid(lin, lin, indexing="ij")
        init = jnp.stack([dy.ravel(), dx.ravel()], -1)  # (s*s, 2)
        base_r = jnp.arange(h, dtype=jnp.float32)[:, None] + 0.5
        base_c = jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5
        pos_r = base_r[None, :, :, None, None] + init[None, None, None, None, :, 0] + off[..., 0] - 0.5
        pos_c = base_c[None, :, :, None, None] + init[None, None, None, None, :, 1] + off[..., 1] - 0.5
        # sample each channel group at its positions
        outs = []
        cg = c // g
        for gi in range(g):
            p = jnp.stack([pos_r[..., gi, :], pos_c[..., gi, :]], -1)  # (B,h,w,s²,2)
            sampled = ldconv_bilinear_gather(x[..., gi * cg : (gi + 1) * cg], p)  # (B,h,w,s²,cg)
            sampled = sampled.reshape(b, h, w, s, s, cg).transpose(0, 1, 3, 2, 4, 5)
            outs.append(sampled.reshape(b, h * s, w * s, cg))
        return jnp.concatenate(outs, -1)


class CARAFE(nn.Module):
    """Content-aware upsampling (extra block.py:3898)."""

    c2: int = 0  # unused; CARAFE preserves channels
    k_enc: int = 3
    k_up: int = 5
    c_mid: int = 64
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        s, k = self.scale, self.k_up
        ho, wo = h * s, w * s
        wgt = ConvBN(self.c_mid, 1, dtype=self.dtype, name="comp")(x, train)
        wgt = ConvBN((s * k) ** 2, self.k_enc, act=False, dtype=self.dtype, name="enc")(wgt, train)
        # pixel shuffle: (B,h,w,(s*k)^2) -> (B,hs,ws,k^2)
        wgt = wgt.reshape(b, h, w, s, s, k * k).transpose(0, 1, 3, 2, 4, 5).reshape(b, ho, wo, k * k)
        wgt = jax.nn.softmax(wgt, axis=-1)
        xu = _nearest_upsample(x, s, s)  # nearest upsample
        pad = k // 2 * s
        xp = jnp.pad(xu, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        out = jnp.zeros_like(xu)
        for i in range(k):
            for j in range(k):
                shift = xp[:, i * s : i * s + ho, j * s : j * s + wo]
                out = out + wgt[..., i * k + j : i * k + j + 1] * shift
        return out


class LocalWindowAttention(nn.Module):
    """EfficientViT local-window cascaded group attention
    (extra_modules/attention.py:1683): pad to a window multiple, partition
    into window x window tiles, run CascadedGroupAttention per tile with a
    learned relative-position bias, and stitch back."""

    key_dim: int = 16
    num_heads: int = 4
    window: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.backbones import _CascadedGroupAttention

        B, H, W, C = x.shape
        w = self.window
        attn = _CascadedGroupAttention(C, self.key_dim, self.num_heads, w,
                                       (5, 5, 5, 5), dtype=self.dtype, name="attn")
        pad_b, pad_r = (w - H % w) % w, (w - W % w) % w
        y = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        pH, pW = H + pad_b, W + pad_r
        nH, nW = pH // w, pW // w
        y = y.reshape(B, nH, w, nW, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(B * nH * nW, w, w, C)
        y = attn(y, train)
        y = y.reshape(B, nH, nW, w, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
        return y[:, :H, :W]


class EfficientAttention(nn.Module):
    """CloFormer efficient attention (extra_modules/attention.py:773): local
    high-frequency heads (dw-mixed qkv, gated by a tanh'd conv-swish-conv
    score on q*k) plus global low-frequency heads (avg-pooled kv, standard
    softmax attention), concatenated and 1x1-projected."""

    num_heads: int = 8
    group_split: Tuple[int, ...] = (4, 4)
    kernel_sizes: Tuple[int, ...] = (5,)
    window_size: int = 4
    dtype: Dtype = jnp.float32

    def _pw(self, c, name, bias=True):
        return nn.Conv(c, (1, 1), use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        dh = c // self.num_heads
        scalor = dh**-0.5
        res = []
        for i, ks in enumerate(self.kernel_sizes):
            gh = self.group_split[i]
            if gh == 0:
                continue
            gc = gh * dh
            qkv = self._pw(3 * gc, f"qkv{i}")(x)
            qkv = nn.Conv(3 * gc, (ks, ks), padding=[(ks // 2, ks // 2)] * 2, feature_group_count=3 * gc,
                          use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name=f"mix{i}")(qkv)
            q, k, v = qkv[..., :gc], qkv[..., gc:2 * gc], qkv[..., 2 * gc:]
            # AttnMap: pw -> swish -> pw on q*k
            a = self._pw(gc, f"attn{i}_0")(q * k)
            a = self._pw(gc, f"attn{i}_1")(jax.nn.silu(a))
            res.append(jnp.tanh(a * scalor) * v)
        gh = self.group_split[-1]
        if gh != 0:
            gc = gh * dh
            q = self._pw(gc, "global_q")(x).reshape(b, h * w, gh, dh).transpose(0, 2, 1, 3)
            ws = self.window_size
            kv_in = nn.avg_pool(x, (ws, ws), strides=(ws, ws)) if ws != 1 else x
            kv = self._pw(2 * gc, "global_kv")(kv_in)
            n2 = kv.shape[1] * kv.shape[2]
            kv = kv.reshape(b, n2, 2, gh, dh).transpose(2, 0, 3, 1, 4)
            k, v = kv[0], kv[1]
            attn = jax.nn.softmax(scalor * q @ k.transpose(0, 1, 3, 2), axis=-1)
            o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, h, w, gc)
            res.append(o)
        return self._pw(c, "proj")(jnp.concatenate(res, -1))


def _bilinear_zeros(img, py, px):
    """Sample img (B,H,W,C) at float pixel coords py/px (B,N) with zero
    padding outside (torch grid_sample padding_mode='zeros')."""
    B, H, W, C = img.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = py - y0
    wx = px - x0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            yy = y0 + dy
            xx = x0 + dx
            wgt = (wy if dy else 1 - wy) * (wx if dx else 1 - wx)
            valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            g = jnp.take_along_axis(
                img.reshape(B, H * W, C),
                (yc * W + xc)[..., None].astype(jnp.int32), axis=1)
            out = out + g * (wgt * valid)[..., None]
    return out


class DeformableLKA(nn.Module):
    """deformable_LKA (extra_modules/attention.py:1038): LKA whose 5x5 and
    dilated 7x7 depthwise convs are plain (non-modulated) deformable convs,
    finishing with a 1x1 conv multiplicative gate."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.ops.dcnv3 import dcnv2_core

        c = x.shape[-1]

        def dconv(y, k, pad, dil, name):
            off = nn.Conv(2 * k * k, (k, k), padding=[(pad, pad)] * 2, kernel_dilation=(dil, dil),
                          use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"{name}_offset")(y)
            wkey = self.param(f"{name}_weight",
                              nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                              (k, k, 1, c), jnp.float32)
            ones = jnp.ones(off.shape[:3] + (k * k,), off.dtype)
            return dcnv2_core(y.astype(self.dtype), off.astype(jnp.float32), ones,
                              wkey.astype(self.dtype), stride=1, pad=pad, dilation=dil, groups=c)

        a = dconv(x, 5, 2, 1, "conv0")
        a = dconv(a, 7, 9, 3, "conv_spatial")
        a = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(a)
        return x * a


class DAttention(nn.Module):
    """Deformable attention (DAT, CVPR'22 — extra_modules/attention.py:1161,
    default flags: dwc_pe=True so the positional term is a depthwise conv on
    q): per-group offset net -> tanh-bounded offsets over a reference grid ->
    bilinear-sampled kv -> softmax attention + dw-conv positional residual.
    `q_size` is accepted for YAML parity; with dwc_pe the tables it would
    size are not used at runtime."""

    q_size: Tuple[int, int] = (0, 0)
    n_heads: int = 8
    n_groups: int = 4
    offset_range_factor: int = 4
    ksize: int = 3
    dtype: Dtype = jnp.float32

    def _pw(self, c, name):
        return nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        g = self.n_groups
        gc = C // g
        nh = self.n_heads
        dh = C // nh
        q = self._pw(C, "proj_q")(x)
        qg = q.reshape(B, H, W, g, gc).transpose(0, 3, 1, 2, 4).reshape(B * g, H, W, gc)
        ks = self.ksize
        off = nn.Conv(gc, (ks, ks), padding=[(ks // 2, ks // 2)] * 2, feature_group_count=gc,
                      use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="offset_dw")(qg)
        off = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="offset_ln")(off)
        off = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                      name="offset_out")(jax.nn.gelu(off, approximate=False))
        rng = jnp.array([1.0 / (H - 1.0), 1.0 / (W - 1.0)], off.dtype)
        off = jnp.tanh(off) * rng * self.offset_range_factor  # (B*g, H, W, 2) (dy, dx)
        ref_y = (jnp.linspace(0.5, H - 0.5, H) / (H - 1.0)) * 2.0 - 1.0
        ref_x = (jnp.linspace(0.5, W - 0.5, W) / (W - 1.0)) * 2.0 - 1.0
        ref = jnp.stack(jnp.meshgrid(ref_y, ref_x, indexing="ij"), -1)  # (H, W, 2)
        pos = off + ref.astype(off.dtype)
        # grid_sample bilinear, align_corners=True, zero padding
        py = (pos[..., 0].reshape(B * g, H * W) + 1.0) * 0.5 * (H - 1.0)
        px = (pos[..., 1].reshape(B * g, H * W) + 1.0) * 0.5 * (W - 1.0)
        xg = x.reshape(B, H, W, g, gc).transpose(0, 3, 1, 2, 4).reshape(B * g, H, W, gc)
        sampled = _bilinear_zeros(xg, py, px)
        sampled = sampled.reshape(B, g, H * W, gc).transpose(0, 2, 1, 3).reshape(B, H * W, 1, C)
        k = self._pw(C, "proj_k")(sampled).reshape(B, H * W, nh, dh).transpose(0, 2, 1, 3)
        v = self._pw(C, "proj_v")(sampled).reshape(B, H * W, nh, dh).transpose(0, 2, 1, 3)
        qa = q.reshape(B, H * W, nh, dh).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(qa @ k.transpose(0, 1, 3, 2) * dh**-0.5, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, C)
        lepe = nn.Conv(C, (3, 3), padding=[(1, 1)] * 2, feature_group_count=C, use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32, name="rpe_table")(q)
        return self._pw(C, "proj_out")(out + lepe)


class FocusedLinearAttention(nn.Module):
    """Focused linear attention (FLatten-Transformer — attention.py:1385;
    here H_sp/W_sp = the full `resolution`, so the window is the whole map):
    ReLU feature maps sharpened by a focusing power, linear attention via the
    kv-first associativity, plus a depthwise-conv feature map on v and a
    per-window lepe dw conv."""

    resolution: Tuple[int, int] = (20, 20)
    num_heads: int = 8
    focusing_factor: int = 3
    kernel_size: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Conv(3 * C, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv_qkv")(x)
        q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
        q = q.reshape(B, H * W, C)
        k = k.reshape(B, H * W, C)
        lepe = nn.Conv(C, (3, 3), padding=[(1, 1)] * 2, feature_group_count=C, use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32, name="get_v")(v)
        lepe = lepe.reshape(B, H * W, nh, hd).transpose(0, 2, 1, 3).reshape(B * nh, H * W, hd)
        v = v.reshape(B, H * W, C)
        pe = self.param("positional_encoding", nn.initializers.zeros,
                        (1, self.resolution[0] * self.resolution[1], C), jnp.float32)
        if (H, W) != tuple(self.resolution):  # off-size map: resize the grid
            pe2 = pe.reshape(1, self.resolution[0], self.resolution[1], C)
            pe2 = jax.image.resize(pe2, (1, H, W, C), "bilinear").reshape(1, H * W, C)
        else:
            pe2 = pe
        k = k + pe2.astype(k.dtype)
        scale = jax.nn.softplus(self.param("scale", nn.initializers.zeros, (1, 1, C), jnp.float32))
        ff = self.focusing_factor
        q = jax.nn.relu(q) + 1e-6
        k = jax.nn.relu(k) + 1e-6
        q = q / scale
        k = k / scale
        qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
        kn = jnp.linalg.norm(k, axis=-1, keepdims=True)
        q = q**ff
        k = k**ff
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True) * qn
        k = k / jnp.linalg.norm(k, axis=-1, keepdims=True) * kn
        q = q.reshape(B, H * W, nh, hd).transpose(0, 2, 1, 3).reshape(B * nh, H * W, hd)
        k = k.reshape(B, H * W, nh, hd).transpose(0, 2, 1, 3).reshape(B * nh, H * W, hd)
        vv = v.reshape(B, H * W, nh, hd).transpose(0, 2, 1, 3).reshape(B * nh, H * W, hd)
        z = 1.0 / (jnp.einsum("bic,bc->bi", q, k.sum(axis=1)) + 1e-6)
        i = j = H * W
        c_, d_ = hd, hd
        if i * j * (c_ + d_) > c_ * d_ * (i + j):
            kv = jnp.einsum("bjc,bjd->bcd", k, vv)
            o = jnp.einsum("bic,bcd,bi->bid", q, kv, z)
        else:
            qk = jnp.einsum("bic,bjc->bij", q, k)
            o = jnp.einsum("bij,bjd,bi->bid", qk, vv, z)
        fm = vv.reshape(B * nh, H, W, hd)
        fm = nn.Conv(hd, (self.kernel_size, self.kernel_size),
                     padding=[(self.kernel_size // 2, self.kernel_size // 2)] * 2,
                     feature_group_count=hd, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="dwc")(fm).reshape(B * nh, H * W, hd)
        o = o + fm + lepe
        return o.reshape(B, nh, H * W, hd).transpose(0, 2, 1, 3).reshape(B, H, W, C)


class BiLevelRoutingAttention(nn.Module):
    """BiFormer bi-level routing attention (extra_modules/attention.py:206
    legacy NHWC form; :489 nchw form via `nchw=True`): window-mean
    query/key routing picks top-k regions per window (routing is
    stop-gradiented, diff_routing=False), token attention runs only over the
    gathered regions, plus a depthwise LCE branch on v."""

    num_heads: int = 8
    n_win: int = 7
    topk: int = 4
    side_dwconv: int = 3
    nchw: bool = False  # BiLevelRoutingAttention_nchw: conv qkv/proj
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H0, W0, C = x.shape
        nw = self.n_win
        pad_b, pad_r = (nw - H0 % nw) % nw, (nw - W0 % nw) % nw
        xp = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        B, H, W, _ = xp.shape
        rh, rw = H // nw, W // nw
        R = nw * nw
        w2 = rh * rw
        nh = self.num_heads
        hd = C // nh
        scale = C**-0.5

        if self.nchw:
            qkv = nn.Conv(3 * C, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                          name="qkv_linear")(xp)
            q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
        else:
            qkv = nn.Dense(3 * C, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                           name="qkv")(xp)
            q, kv = qkv[..., :C], qkv[..., C:]
            k, v = kv[..., :C], kv[..., C:]

        def to_regions(t):  # (B, H, W, C) -> (B, R, w2, C)
            t = t.reshape(B, nw, rh, nw, rw, C).transpose(0, 1, 3, 2, 4, 5)
            return t.reshape(B, R, w2, C)

        qr, kr, vr = to_regions(q), to_regions(k), to_regions(v)
        # routing adjacency on detached window means
        q_win = jax.lax.stop_gradient(qr.mean(2))
        k_win = jax.lax.stop_gradient(kr.mean(2))
        a_r = q_win @ k_win.transpose(0, 2, 1)  # (B, R, R)
        idx = jax.lax.top_k(a_r, self.topk)[1]  # (B, R, topk)

        def gather(kv_, id_):  # (R, w2, C), (R, k) -> (R, k, w2, C)
            return kv_[id_]

        k_sel = jax.vmap(gather)(kr, idx).reshape(B, R, self.topk * w2, C)
        v_sel = jax.vmap(gather)(vr, idx).reshape(B, R, self.topk * w2, C)
        qf = qr.reshape(B, R, w2, nh, hd).transpose(0, 1, 3, 2, 4)
        kf = k_sel.reshape(B, R, self.topk * w2, nh, hd).transpose(0, 1, 3, 2, 4)
        vf = v_sel.reshape(B, R, self.topk * w2, nh, hd).transpose(0, 1, 3, 2, 4)
        attn = jax.nn.softmax((qf * scale) @ kf.transpose(0, 1, 2, 4, 3), axis=-1)
        out = (attn @ vf).transpose(0, 1, 3, 2, 4).reshape(B, R, w2, C)
        out = out.reshape(B, nw, nw, rh, rw, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        lepe = nn.Conv(C, (self.side_dwconv, self.side_dwconv),
                       padding=[(self.side_dwconv // 2, self.side_dwconv // 2)] * 2,
                       feature_group_count=C, use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="lepe")(v)
        out = out + lepe
        if self.nchw:
            out = nn.Conv(C, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                          name="output_linear")(out)
        else:
            out = nn.Dense(C, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="wo")(out)
        return out[:, :H0, :W0]
