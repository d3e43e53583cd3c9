"""C2f_X / C3_X module-zoo tranche: custom inner blocks behind generic
CSP containers.

The reference implements ~100 C2f_<X>/C3_<X> classes by subclassing C2f/C3
and swapping ``self.m`` (extra_modules/block.py — each cited per class
below). Here one pair of generic containers (:class:`C2fX`, :class:`C3X`)
takes the inner-block key; the registry :data:`INNER_BLOCKS` maps the
reference's class-name suffix to a builder, so every new inner block adds
two parse_model entries for free.

All blocks are NHWC flax with static shapes. DropPath/stochastic-depth is
the identity (drop-path rngs are not threaded through the trainer;
inference semantics are exact).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from experiment_yolo_tpu.nn.norm import BatchNorm as MemBatchNorm

from experiment_yolo_tpu.nn.modules import ConvBN

Dtype = Any


def _conv(x, c2, k, train, dtype, name, s=1, g=1, d=1, act=True):
    """Reference Conv (conv+BN+SiLU) shorthand."""
    return ConvBN(c2, k, s, g=g, d=d, act=act, dtype=dtype, name=name)(x, train)


def _bare_conv(x, c2, k, dtype, name, s=1, g=1, d=1, bias=False):
    p = d * (k - 1) // 2
    return nn.Conv(c2, (k, k), strides=(s, s), padding=[(p, p)] * 2, use_bias=bias,
                   feature_group_count=g, kernel_dilation=(d, d), dtype=dtype,
                   param_dtype=jnp.float32, name=name)(x)


def _bn(x, train, dtype, name):
    return MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                        dtype=dtype, param_dtype=jnp.float32, name=name)(x)


# ---------------------------------------------------------------------------
# inner blocks
# ---------------------------------------------------------------------------


class FasterBlock(nn.Module):
    """Faster_Block (block.py:524, FasterNet arXiv:2303.03667): partial 3x3
    conv spatial mixing + 1x1 MLP, residual."""

    c2: int
    n_div: int = 4
    mlp_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dc = self.c2 // self.n_div
        x1 = _bare_conv(x[..., :dc], dc, 3, self.dtype, "pconv")
        mixed = jnp.concatenate([x1, x[..., dc:]], -1)
        y = _conv(mixed, self.c2 * self.mlp_ratio, 1, train, self.dtype, "mlp1")
        y = _bare_conv(y, self.c2, 1, self.dtype, "mlp2")
        return x + y


class PartialConv3(nn.Module):
    """Standalone Partial_conv3 (block.py:497): 3x3 conv over the first
    C/n_div channels, rest untouched."""

    n_div: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dc = x.shape[-1] // self.n_div
        x1 = _bare_conv(x[..., :dc], dc, 3, self.dtype, "partial_conv3")
        return jnp.concatenate([x1, x[..., dc:]], -1)


class FasterBlockEMA(nn.Module):
    """Faster_Block_EMA (block.py:793): FasterBlock with EMA attention after
    the spatial mixing."""

    c2: int
    n_div: int = 4
    mlp_ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import EMAAttention

        dc = self.c2 // self.n_div
        x1 = _bare_conv(x[..., :dc], dc, 3, self.dtype, "pconv")
        mixed = jnp.concatenate([x1, x[..., dc:]], -1)
        mixed = EMAAttention(dtype=self.dtype, name="attention")(mixed)
        y = _conv(mixed, self.c2 * self.mlp_ratio, 1, train, self.dtype, "mlp1")
        y = _bare_conv(y, self.c2, 1, self.dtype, "mlp2")
        return x + y


class ContextGuidedBlock(nn.Module):
    """ContextGuidedBlock (block.py:2226, CGNet): 1x1 reduce, parallel local
    dw3x3 + dilated-surround dw3x3, BN+act, FGlo channel gate, residual."""

    c2: int
    dilation: int = 2
    reduction: int = 16
    add: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.c2 // 2
        y = _conv(x, n, 1, train, self.dtype, "conv1x1")
        loc = _bare_conv(y, n, 3, self.dtype, "f_loc", g=n, bias=True)
        sur = _bare_conv(y, n, 3, self.dtype, "f_sur", g=n, d=self.dilation, bias=True)
        joi = jnp.concatenate([loc, sur], -1)
        joi = jax.nn.silu(_bn(joi, train, self.dtype, "bn"))
        # FGlo (block.py:2206)
        s = joi.mean(axis=(1, 2))
        s = nn.Dense(self.c2 // self.reduction, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(s)
        s = nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(jax.nn.relu(s))
        out = joi * jax.nn.sigmoid(s)[:, None, None, :]
        return x + out if self.add else out


class ContextGuidedDown(nn.Module):
    """ContextGuidedBlock_Down (block.py:2261): stride-2, channels x2."""

    c2: int
    dilation: int = 2
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.c2  # == 2 * c1
        y = _conv(x, n, 3, train, self.dtype, "conv1x1", s=2)
        loc = _bare_conv(y, n, 3, self.dtype, "f_loc", g=n, bias=True)
        sur = _bare_conv(y, n, 3, self.dtype, "f_sur", g=n, d=self.dilation, bias=True)
        joi = jnp.concatenate([loc, sur], -1)
        joi = jax.nn.silu(_bn(joi, train, self.dtype, "bn"))
        joi = _conv(joi, n, 1, train, self.dtype, "reduce")
        s = joi.mean(axis=(1, 2))
        s = nn.Dense(n // self.reduction, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(s)
        s = nn.Dense(n, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(jax.nn.relu(s))
        return joi * jax.nn.sigmoid(s)[:, None, None, :]


class DWR(nn.Module):
    """Dilation-wise residual (block.py:2748): 3x3 reduce, parallel d=1/3/5
    branches, 1x1 fuse, residual."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv(x, self.c2 // 2, 3, train, self.dtype, "conv3")
        x1 = _conv(h, self.c2, 3, train, self.dtype, "d1")
        x2 = _conv(h, self.c2 // 2, 3, train, self.dtype, "d3", d=3)
        x3 = _conv(h, self.c2 // 2, 3, train, self.dtype, "d5", d=5)
        out = jnp.concatenate([x1, x2, x3], -1)
        return _conv(out, self.c2, 1, train, self.dtype, "fuse") + x


class MSBlock(nn.Module):
    """MSBlock (block.py:2324, YOLO-MS): split expanded channels into
    kernel-size branches with cascaded adds."""

    c2: int
    kernel_sizes: Tuple[int, ...] = (1, 3, 3)
    in_expand_ratio: float = 3.0
    mid_expand_ratio: float = 2.0
    layers_num: int = 3
    in_down_ratio: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inc = x.shape[-1]
        in_ch = int(inc * self.in_expand_ratio // self.in_down_ratio)
        mid = in_ch // len(self.kernel_sizes)
        groups = int(mid * self.mid_expand_ratio)
        out = _conv(x, in_ch, 1, train, self.dtype, "in_conv")
        chans = []
        for i, k in enumerate(self.kernel_sizes):
            ch = out[..., i * mid : (i + 1) * mid]
            if i >= 1:
                ch = ch + chans[i - 1]
            if k != 1:
                for j in range(int(self.layers_num)):
                    y = _conv(ch, groups, 1, train, self.dtype, f"b{i}_l{j}_in")
                    y = _conv(y, groups, k, train, self.dtype, f"b{i}_l{j}_mid", g=groups)
                    ch = _conv(y, mid, 1, train, self.dtype, f"b{i}_l{j}_out")
            chans.append(ch)
        return _conv(jnp.concatenate(chans, -1), self.c2, 1, train, self.dtype, "out_conv")


class SCConvSC(nn.Module):
    """SCConv (block.py:1029, SCNet CVPR2020): self-calibrated conv — pooled
    k2 branch gates k3, then k4."""

    c2: int
    pooling_r: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = self.pooling_r
        pooled = nn.avg_pool(x, (r, r), strides=(r, r))
        k2 = _conv(pooled, self.c2, 3, train, self.dtype, "k2", act=False)
        k2 = jax.image.resize(k2, x.shape, "nearest")
        out = jax.nn.sigmoid(x + k2)
        out = _conv(x, self.c2, 3, train, self.dtype, "k3", act=False) * out
        return _conv(out, self.c2, 3, train, self.dtype, "k4", act=False)


class ScConvCVPR23(nn.Module):
    """ScConv (block.py:1160, CVPR2023): SRU spatial-reconstruct +
    CRU channel-reconstruct units."""

    c2: int
    group_num: int = 16
    gate_threshold: float = 0.5
    squeeze_radio: int = 2
    group_size: int = 2
    group_kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # SRU with GroupBatchnorm2d (block.py:1072): stats over per-group
        # (C/G * H * W) slices, torch layout (N, G, C/G*H*W)
        gamma = self.param("gn_gamma", nn.initializers.normal(1.0), (c,), jnp.float32)
        beta = self.param("gn_beta", nn.initializers.zeros, (c,), jnp.float32)
        g = self.group_num
        xc = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, g, -1)
        mean = xc.mean(axis=2, keepdims=True)
        std = xc.std(axis=2, keepdims=True, ddof=1)
        xn = ((xc - mean) / (std + 1e-10)).reshape(b, c, h, w).transpose(0, 2, 3, 1)
        gn_x = xn * gamma + beta
        w_gamma = gamma / gamma.sum()
        rw = jax.nn.sigmoid(gn_x * w_gamma)
        info = jnp.where(rw >= self.gate_threshold, x, 0.0)
        noninfo = jnp.where(rw < self.gate_threshold, x, 0.0)
        half = c // 2
        y = jnp.concatenate(
            [info[..., :half] + noninfo[..., half:], info[..., half:] + noninfo[..., :half]], -1
        )
        # CRU (block.py:1123)
        up_c = int(0.5 * self.c2)
        low_c = self.c2 - up_c
        sq = self.squeeze_radio
        up = _bare_conv(y[..., :up_c], up_c // sq, 1, self.dtype, "squeeze1")
        low = _bare_conv(y[..., up_c:], low_c // sq, 1, self.dtype, "squeeze2")
        y1 = _bare_conv(up, self.c2, self.group_kernel_size, self.dtype, "gwc", g=self.group_size, bias=True) \
            + _bare_conv(up, self.c2, 1, self.dtype, "pwc1")
        y2 = jnp.concatenate([_bare_conv(low, self.c2 - low_c // sq, 1, self.dtype, "pwc2"), low], -1)
        out = jnp.concatenate([y1, y2], -1)
        attn = jax.nn.softmax(out.mean(axis=(1, 2), keepdims=True), axis=-1)
        out = attn * out
        return out[..., : self.c2] + out[..., self.c2 :]


class EMSConv(nn.Module):
    """Efficient multi-scale conv (block.py:1236): half the channels pass
    through, the rest split over 3x3/5x5 branches, 1x1 fuse."""

    c2: int
    kernels: Tuple[int, ...] = (3, 5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        min_ch = c // 4
        cheap, group = x[..., : c // 2], x[..., c // 2 :]
        outs = [
            _conv(group[..., i * min_ch : (i + 1) * min_ch], min_ch, k, train, self.dtype, f"conv{i}")
            for i, k in enumerate(self.kernels)
        ]
        y = jnp.concatenate([cheap] + outs, -1)
        return _conv(y, self.c2, 1, train, self.dtype, "conv_1x1")


class EMSConvP(nn.Module):
    """EMSConvP (block.py:1260): all channels split over 1/3/5/7 branches."""

    c2: int
    kernels: Tuple[int, ...] = (1, 3, 5, 7)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        min_ch = c // len(self.kernels)
        outs = [
            _conv(x[..., i * min_ch : (i + 1) * min_ch], min_ch, k, train, self.dtype, f"conv{i}")
            for i, k in enumerate(self.kernels)
        ]
        return _conv(jnp.concatenate(outs, -1), self.c2, 1, train, self.dtype, "conv_1x1")


class RFAConv(nn.Module):
    """Receptive-field attention conv (RFAConv.py:24): per-pixel kxk weight
    maps gate kxk generated features; the weighted (h*k, w*k) tiling then
    collapses through a k-stride conv. The tile+stride-k conv pair is
    algebraically a single weighted sum per output pixel — kept in the
    reference's tiled form for weight-porting parity (XLA fuses the
    reshape into the conv)."""

    c2: int
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k = self.k
        p = k // 2
        pooled = nn.avg_pool(jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0))), (k, k), strides=(1, 1))
        weight = _bare_conv(pooled, c * k * k, 1, self.dtype, "get_weight", g=c)
        feat = _bare_conv(x, c * k * k, k, self.dtype, "generate", g=c)
        feat = jax.nn.relu(_bn(feat, train, self.dtype, "gen_bn"))
        # (b,h,w,c*k2) -> (b,c,k2,h,w) grouping matches torch's view(b,c,k2,h,w)
        wgt = jax.nn.softmax(weight.reshape(b, h, w, c, k * k), axis=-1)
        ft = feat.reshape(b, h, w, c, k * k) * wgt
        # tile to (b, h*k, w*k, c): torch rearrange 'b c (n1 n2) h w -> b c (h n1) (w n2)'
        ft = ft.reshape(b, h, w, c, k, k).transpose(0, 1, 4, 2, 5, 3).reshape(b, h * k, w * k, c)
        return ConvBN(self.c2, k, k, p=0, dtype=self.dtype, name="conv")(ft, train)


class IRMB(nn.Module):
    """iRMB (block.py:4098, EMO arXiv:2301.01146): BN -> interleaved-window
    attention (EMO's dilated window partition) -> dw conv with residual ->
    1x1 proj, outer residual."""

    c2: int
    exp_ratio: float = 1.0
    dim_head: int = 16
    window: int = 7
    dw_ks: int = 3
    local: str = "dw"  # dw | drb (block.py:4230) | swc (block.py:4317)
    cascaded: bool = False  # iRMB_Cascaded (block.py:4185): LWA attention
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        B, H, W, C = x.shape
        x = _bn(x, train, self.dtype, "norm")
        dim_mid = int(C * self.exp_ratio)
        if self.cascaded:
            from experiment_yolo_tpu.nn.extra_modules import LocalWindowAttention

            y = LocalWindowAttention(dtype=self.dtype, name="attn")(x, train)
        else:
            nh = C // self.dim_head
            # EMO's interleaved windows: H = h1*n1 with h1 (window) the OUTER factor
            wsW = self.window if self.window > 0 else W
            wsH = self.window if self.window > 0 else H
            pad_r = (wsW - W % wsW) % wsW
            pad_b = (wsH - H % wsH) % wsH
            y = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            pH, pW = H + pad_b, W + pad_r
            n1, n2 = pH // wsH, pW // wsW
            y = y.reshape(B, wsH, n1, wsW, n2, C).transpose(0, 2, 4, 1, 3, 5).reshape(B * n1 * n2, wsH, wsW, C)
            bb = y.shape[0]
            qk = _bare_conv(y, 2 * C, 1, self.dtype, "qk")
            qk = qk.reshape(bb, wsH * wsW, 2, nh, self.dim_head).transpose(2, 0, 3, 1, 4)
            q, k = qk[0], qk[1]
            attn = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) * self.dim_head**-0.5, axis=-1)
            v = jax.nn.silu(_bare_conv(y, dim_mid, 1, self.dtype, "v"))
            v = v.reshape(bb, wsH * wsW, nh, dim_mid // nh).transpose(0, 2, 1, 3)
            sp = (attn @ v).transpose(0, 2, 1, 3).reshape(bb, wsH, wsW, dim_mid)
            sp = sp.reshape(B, n1, n2, wsH, wsW, dim_mid).transpose(0, 3, 1, 4, 2, 5).reshape(B, pH, pW, dim_mid)
            y = sp[:, :H, :W]
        if self.local == "drb":
            y = y + DilatedReparamBlock(self.dw_ks, dtype=self.dtype, name="conv_local")(y, train)
        elif self.local == "swc":
            y = y + ReparamLKConv(dim_mid, k=self.dw_ks, groups=dim_mid // 16,
                                  dtype=self.dtype, name="conv_local")(y, train)
        else:
            y = y + _conv(y, dim_mid, self.dw_ks, train, self.dtype, "conv_local", g=dim_mid)
        y = _bare_conv(y, self.c2, 1, self.dtype, "proj", bias=True)
        return shortcut + y


class RFCBAMConv(nn.Module):
    """RFCBAMConv (RFAConv.py:70): kxk generated features tiled to
    (h*k, w*k), gated by SE channel attention and a max/mean spatial
    attention, collapsed by a k-stride conv."""

    c2: int
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k = self.k
        # SE (RFAConv.py:53): Linear c->16->c, no bias
        s = x.mean(axis=(1, 2))
        s = nn.Dense(16, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="se_fc1")(s)
        s = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="se_fc2")(jax.nn.relu(s))
        ca = jax.nn.sigmoid(s)[:, None, None, :]
        feat = _bare_conv(x, c * k * k, k, self.dtype, "generate", g=c)
        feat = jax.nn.relu(_bn(feat, train, self.dtype, "gen_bn"))
        ft = feat.reshape(b, h, w, c, k, k).transpose(0, 1, 4, 2, 5, 3).reshape(b, h * k, w * k, c)
        unfold = ft * ca
        spat = jnp.concatenate([ft.max(-1, keepdims=True), ft.mean(-1, keepdims=True)], -1)
        rfa = jax.nn.sigmoid(_bare_conv(spat, 1, 3, self.dtype, "get_weight"))
        return ConvBN(self.c2, k, k, p=0, dtype=self.dtype, name="conv")(unfold * rfa, train)


class RFCAConv(nn.Module):
    """RFCAConv (RFAConv.py:105): tiled kxk features with coordinate
    attention; final collapse is a bare biased conv (no BN/act in the
    reference)."""

    c2: int
    k: int = 3
    reduction: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        k = self.k
        feat = _bare_conv(x, c * k * k, k, self.dtype, "generate", g=c)
        feat = jax.nn.relu(_bn(feat, train, self.dtype, "gen_bn"))
        ft = feat.reshape(b, h, w, c, k, k).transpose(0, 1, 4, 2, 5, 3).reshape(b, h * k, w * k, c)
        hh, ww = h * k, w * k
        x_h = ft.mean(axis=2)[:, :, None]  # (b, hh, 1, c)
        x_w = ft.mean(axis=1)[:, None]  # (b, 1, ww, c)
        mip = max(8, c // self.reduction)
        y = jnp.concatenate([x_h.transpose(0, 2, 1, 3), x_w], axis=2)  # (b, 1, hh+ww, c)
        y = _bare_conv(y, mip, 1, self.dtype, "conv1", bias=True)
        y = _bn(y, train, self.dtype, "bn1")
        y = y * jax.nn.relu6(y + 3.0) / 6.0  # h_swish
        a_h = jax.nn.sigmoid(_bare_conv(y[:, :, :hh].transpose(0, 2, 1, 3), c, 1, self.dtype, "conv_h", bias=True))
        a_w = jax.nn.sigmoid(_bare_conv(y[:, :, hh:], c, 1, self.dtype, "conv_w", bias=True))
        out = ft * a_w * a_h
        return _bare_conv(out, self.c2, k, self.dtype, "conv", s=k, bias=True)


class GSConv(nn.Module):
    """GSConv (block.py:886, SlimNeck): half standard conv + half dw5x5,
    channel interleave shuffle."""

    c2: int
    k: int = 1
    s: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        x1 = _conv(x, c_, self.k, train, self.dtype, "cv1", s=self.s)
        x2 = jnp.concatenate([x1, _conv(x1, c_, 5, train, self.dtype, "cv2", g=c_)], -1)
        # shuffle: out = [even channels, odd channels]
        return jnp.concatenate([x2[..., 0::2], x2[..., 1::2]], -1)


class GSConvNS(nn.Module):
    """GSConvns (block.py:910): GSConv with a learned 1x1 'normative
    shuffle' + ReLU."""

    c2: int
    k: int = 1
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        x1 = _conv(x, c_, self.k, train, self.dtype, "cv1", s=self.s)
        x2 = jnp.concatenate([x1, _conv(x1, c_, 5, train, self.dtype, "cv2", g=c_)], -1)
        return jax.nn.relu(_bare_conv(x2, self.c2, 1, self.dtype, "shuf"))


class GSBottleneck(nn.Module):
    """GSBottleneck (block.py:923): GSConv pair + 1x1 conv shortcut."""

    c2: int
    e: float = 0.5
    ns: bool = False
    cheap: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        GS = GSConvNS if self.ns else GSConv
        y = GS(c_, 1, dtype=self.dtype, name="gs1")(x, train)
        if self.ns:
            y = GS(self.c2, 3, dtype=self.dtype, name="gs2")(y, train)
        else:
            y = GSConv(self.c2, 3, act=False, dtype=self.dtype, name="gs2")(y, train)
        if self.cheap:
            sc = ConvBN(self.c2, 3, 1, g=min(x.shape[-1], self.c2), act=False, dtype=self.dtype, name="shortcut")(x, train)
        else:
            sc = _conv(x, self.c2, 1, train, self.dtype, "shortcut", act=False)
        return y + sc


class VoVGSCSP(nn.Module):
    """VoVGSCSP / ns / C (block.py:953): CSP over GSBottlenecks."""

    c2: int
    n: int = 1
    ns: bool = False
    cheap: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y1 = _conv(x, c_, 1, train, self.dtype, "cv1")
        n = 1 if self.cheap else self.n
        for i in range(n):
            y1 = GSBottleneck(c_, e=1.0 if not self.cheap else 0.5, ns=self.ns, cheap=self.cheap,
                              dtype=self.dtype, name=f"gsb{i}")(y1, train)
        y2 = _conv(x, c_, 1, train, self.dtype, "cv2")
        return _conv(jnp.concatenate([y2, y1], -1), self.c2, 1, train, self.dtype, "cv3")


class _BNPad(nn.Module):
    """BNAndPadLayer (rep_block.py:84): BatchNorm whose spatial padding is
    the BN response to zero input (bias - running_mean * scale / std) — the
    trick that lets DBB's branch padding fold into the re-param conv."""

    c: int
    pad: int
    eps: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale = self.param("scale", nn.initializers.ones, (self.c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((self.c,), jnp.float32))
        if train:
            mean = x.mean(axis=(0, 1, 2))
            var = x.var(axis=(0, 1, 2))
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        p = self.pad
        if p == 0:
            return y
        pad_val = bias - ra_mean.value * scale * jax.lax.rsqrt(ra_var.value + self.eps)
        b, h, w, c = y.shape
        out = jnp.broadcast_to(pad_val.astype(y.dtype), (b, h + 2 * p, w + 2 * p, c))
        return out.at[:, p:-p, p:-p].set(y)


class DiverseBranchBlock(nn.Module):
    """DiverseBranchBlock (rep_block.py:132, DBB CVPR2021): kxk conv-bn +
    1x1 conv-bn + (1x1 -> BNAndPad -> avgpool) + (identity-1x1 -> BNAndPad
    -> kxk) branches summed, SiLU. Train-time structure kept (re-param
    deploy fusion is an export concern in the XLA world — branches stay
    separately trainable like the reference's non-deploy mode)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        p = self.k // 2
        bn = lambda xx, nm: MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, param_dtype=jnp.float32, name=nm)(xx)
        # origin kxk
        out = bn(_bare_conv(x, self.c2, self.k, self.dtype, "origin_conv", s=self.s), "origin_bn")
        # 1x1 (groups=1 < c2 in every registry use)
        out = out + bn(_bare_conv(x, self.c2, 1, self.dtype, "one_conv", s=self.s), "one_bn")
        # avg branch: 1x1 -> BNAndPad -> avgpool(k, stride s, pad 0) -> BN
        y = _bare_conv(x, self.c2, 1, self.dtype, "avg_conv")
        y = _BNPad(self.c2, p, name="avg_bnpad")(y, train)
        y = nn.avg_pool(y, (self.k, self.k), strides=(self.s, self.s))
        out = out + bn(y, "avg_bn")
        # 1x1_kxk branch: identity-based 1x1 -> BNAndPad -> kxk (pad 0) -> BN
        idk = self.param("id_kernel", nn.initializers.zeros, (1, 1, c1, c1), jnp.float32)
        eye = jnp.eye(c1, dtype=jnp.float32).reshape(1, 1, c1, c1)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), (idk + eye).astype(self.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = _BNPad(c1, p, name="kxk_bnpad")(y, train)
        y = nn.Conv(self.c2, (self.k, self.k), strides=(self.s, self.s), padding="VALID", use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="kxk_conv")(y)
        out = out + bn(y, "kxk_bn")
        return jax.nn.silu(out)


class _DBBBottleneck(nn.Module):
    """Bottleneck_DBB (block.py:864): both convs replaced by DBB; C3 passes
    k=(1,3) so cv1 is a 1x1 DBB there."""

    c2: int
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = DiverseBranchBlock(self.c2, k=self.k0, dtype=self.dtype, name="cv1")(x, train)
        y = DiverseBranchBlock(self.c2, k=3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class SEAM(nn.Module):
    """SEAM attention (block.py:3971, YOLO-FaceV2): depthwise-residual +
    pointwise blocks, channel-squeeze MLP, exp-scaled gate."""

    c2: int
    n: int = 1
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2
        y = x
        for i in range(self.n):
            z = _bare_conv(y, c, 3, self.dtype, f"dcov{i}_dw", g=c, bias=True)
            y = y + MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"dcov{i}_bn1")(jax.nn.gelu(z))
            z = _bare_conv(y, c, 1, self.dtype, f"dcov{i}_pw", bias=True)
            y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"dcov{i}_bn2")(jax.nn.gelu(z))
        s = y.mean(axis=(1, 2))
        s = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(s)
        s = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(jax.nn.relu(s))
        return x * jnp.exp(jax.nn.sigmoid(s))[:, None, None, :]


class MultiSEAM(nn.Module):
    """MultiSEAM (block.py:4041): three patch-size DcovN towers pooled and
    averaged with the input pool, exp-gated."""

    c2: int
    depth: int = 1
    patch_sizes: Tuple[int, ...] = (3, 5, 7)
    reduction: int = 16
    dtype: Dtype = jnp.float32

    def _dcovn(self, x, ps, train, name):
        c = self.c2
        y = nn.Conv(c, (ps, ps), strides=(ps, ps), use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"{name}_patch")(x)
        y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"{name}_pbn")(jax.nn.silu(y))
        for i in range(self.depth):
            z = _bare_conv(y, c, 3, self.dtype, f"{name}_d{i}_dw", g=c, bias=True)
            y = y + MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"{name}_d{i}_bn1")(jax.nn.silu(z))
            z = _bare_conv(y, c, 1, self.dtype, f"{name}_d{i}_pw", bias=True)
            y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"{name}_d{i}_bn2")(jax.nn.silu(z))
        return y.mean(axis=(1, 2))

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2
        # pad so each patch stride divides the map (reference relies on
        # divisible inputs; stride-conv floors instead — same pooled stats)
        ys = [self._dcovn(x, ps, train, f"dcovn{i}") for i, ps in enumerate(self.patch_sizes)]
        y = (ys[0] + ys[1] + ys[2] + x.mean(axis=(1, 2))) / 4.0
        y = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(jax.nn.relu(y))
        return x * jnp.exp(jax.nn.sigmoid(y))[:, None, None, :]


class RepVGGBlock(nn.Module):
    """RepVGGBlock (block.py:1782): 3x3 conv-BN + 1x1 conv-BN + identity BN
    branches summed, ReLU. Train-time structure (re-param is an export
    concern in the XLA world)."""

    c2: int
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda xx, nm: MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, param_dtype=jnp.float32, name=nm)(xx)
        y = bn(_bare_conv(x, self.c2, 3, self.dtype, "dense_conv", s=self.s), "dense_bn")
        y = y + bn(_bare_conv(x, self.c2, 1, self.dtype, "one_conv", s=self.s), "one_bn")
        if x.shape[-1] == self.c2 and self.s == 1:
            y = y + bn(x, "id_bn")
        return jax.nn.relu(y)


class IFM(nn.Module):
    """GOLD-YOLO information-fusion module (block.py:1965): 1x1 embed,
    fuse_block_num RepVGG blocks, 1x1 to sum(ouc)."""

    ouc: Tuple[int, ...]
    embed_dim: int = 96
    fuse_block_num: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(x, self.embed_dim, 1, train, self.dtype, "conv_in")
        for i in range(self.fuse_block_num):
            y = RepVGGBlock(self.embed_dim, dtype=self.dtype, name=f"rep{i}")(y, train)
        return _conv(y, sum(self.ouc), 1, train, self.dtype, "conv_out")


class InjectionMultiSum(nn.Module):
    """InjectionMultiSum_Auto_pool (block.py:1986): local embedding gated by
    the (pooled or upsampled) global slice plus the global embedding.
    NOTE the reference skips the h-sigmoid in its pooling branch — kept."""

    oup: int
    global_inp: Tuple[int, ...]
    flag: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x_l, x_g = xs
        H, W = x_l.shape[1:3]
        gH = x_g.shape[1]
        start = sum(self.global_inp[: self.flag])
        g = x_g[..., start : start + self.global_inp[self.flag]]
        local = _conv(x_l, self.oup, 1, train, self.dtype, "local_embedding", act=False)
        g_act = _conv(g, self.oup, 1, train, self.dtype, "global_act", act=False)
        g_feat = _conv(g, self.oup, 1, train, self.dtype, "global_embedding", act=False)
        if H < gH:  # adaptive-avg-pool down (no act — reference quirk)
            k = gH // H
            sig = nn.avg_pool(g_act, (k, k), strides=(k, k))
            g_feat = nn.avg_pool(g_feat, (k, k), strides=(k, k))
        else:
            sig = jax.nn.relu6(g_act + 3.0) / 6.0
            sig = jax.image.resize(sig, (sig.shape[0], H, W, self.oup), "bilinear")
            g_feat = jax.image.resize(g_feat, (g_feat.shape[0], H, W, self.oup), "bilinear")
        return local * sig + g_feat


class TopBasicLayer(nn.Module):
    """GOLD-YOLO top transformer (block.py:2168): block_num attention+MLP
    blocks over the pooled token map, 1x1 to sum(ouc)."""

    ouc: Tuple[int, ...]
    block_num: int = 2
    key_dim: int = 8
    num_heads: int = 4
    attn_ratio: float = 2.0
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim = x.shape[-1]
        d = int(self.attn_ratio * self.key_dim)
        nh_kd = self.key_dim * self.num_heads
        dh = d * self.num_heads
        for bi in range(self.block_num):
            # GOLDYOLO_Attention (block.py:2114)
            b, H, W, _ = x.shape
            q = _conv(x, nh_kd, 1, train, self.dtype, f"b{bi}_to_q", act=False)
            k = _conv(x, nh_kd, 1, train, self.dtype, f"b{bi}_to_k", act=False)
            v = _conv(x, dh, 1, train, self.dtype, f"b{bi}_to_v", act=False)
            qh = q.reshape(b, H * W, self.num_heads, self.key_dim).transpose(0, 2, 1, 3)
            kh = k.reshape(b, H * W, self.num_heads, self.key_dim).transpose(0, 2, 3, 1)
            vh = v.reshape(b, H * W, self.num_heads, d).transpose(0, 2, 1, 3)
            attn = jax.nn.softmax(qh @ kh * self.key_dim**-0.5, axis=-1)
            y = (attn @ vh).transpose(0, 2, 1, 3).reshape(b, H, W, dh)
            y = _conv(jax.nn.relu6(y), dim, 1, train, self.dtype, f"b{bi}_proj", act=False)
            x = x + y
            z = _conv(x, int(dim * self.mlp_ratio), 1, train, self.dtype, f"b{bi}_mlp1", act=False)
            z = _bare_conv(jax.nn.silu(z), int(dim * self.mlp_ratio), 3, self.dtype, f"b{bi}_mlp_dw",
                           g=int(dim * self.mlp_ratio), bias=True)
            z = _conv(jax.nn.silu(z), dim, 1, train, self.dtype, f"b{bi}_mlp2", act=False)
            x = x + z
        return _bare_conv(x, sum(self.ouc), 1, self.dtype, "conv_out", bias=True)


class CSPStage(nn.Module):
    """DAMO-YOLO GFPN CSPStage (block.py:2447): split, chain of RepConv
    3x3-reverse basic blocks, concat all intermediates."""

    c2: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import RepConv

        ch_first = self.c2 // 2
        ch_mid = self.c2 - ch_first
        y1 = _conv(x, ch_first, 1, train, self.dtype, "conv1")
        y2 = _conv(x, ch_mid, 1, train, self.dtype, "conv2")
        outs = [y1]
        for i in range(self.n):
            z = RepConv(ch_mid, 3, dtype=self.dtype, name=f"m{i}_conv2")(y2, train)
            z = _conv(z, ch_mid, 3, train, self.dtype, f"m{i}_conv1")
            y2 = y2 + z
            outs.append(y2)
        return _conv(jnp.concatenate(outs, -1), self.c2, 1, train, self.dtype, "conv3")


class BiFusion(nn.Module):
    """YOLOv6 BiFusion (block.py:2528): transpose-conv upsample of the top
    level + 1x1 mid + downsampled bottom, concat, 1x1 fuse."""

    c2: int
    inc: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x0 = nn.ConvTranspose(self.c2, (2, 2), strides=(2, 2), use_bias=True, dtype=self.dtype,
                              param_dtype=jnp.float32, name="upsample")(xs[0])
        x1 = _conv(xs[1], self.c2, 1, train, self.dtype, "cv1")
        x2 = _conv(_conv(xs[2], self.c2, 1, train, self.dtype, "cv2"), self.c2, 3, train, self.dtype,
                   "downsample", s=2)
        return _conv(jnp.concatenate([x0, x1, x2], -1), self.c2, 1, train, self.dtype, "cv3")


class RepBlock(nn.Module):
    """YOLOv6 RepBlock (block.py:2572): n chained RepVGG blocks."""

    c2: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = RepVGGBlock(self.c2, dtype=self.dtype, name="conv1")(x, train)
        for i in range(self.n - 1):
            x = RepVGGBlock(self.c2, dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class V7DownSampling(nn.Module):
    """YOLOv7 downsample (block.py:4731): maxpool+1x1 || 1x1+3x3s2, concat."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = self.c2 // 2
        a = nn.max_pool(x, (2, 2), strides=(2, 2))
        a = _conv(a, h, 1, train, self.dtype, "mp_cv")
        b = _conv(x, h, 1, train, self.dtype, "cv1")
        b = _conv(b, h, 3, train, self.dtype, "cv2", s=2)
        return jnp.concatenate([a, b], -1)


class _EMBCBottleneck(nn.Module):
    """The zoo's MBConv (block.py:1759, C2f_EMBC inner): pw expand, dw3x3,
    EffectiveSE, pw project (no act), residual."""

    c2: int
    e: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import EffectiveSE

        mid = x.shape[-1] * self.e
        y = _conv(x, mid, 1, train, self.dtype, "conv_pw_1")
        y = _conv(y, mid, 3, train, self.dtype, "conv_dw_1", g=mid)
        y = EffectiveSE(dtype=self.dtype, name="effective_se")(y)
        y = _conv(y, self.c2, 1, train, self.dtype, "conv1", act=False)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class _DSnakeBranch(nn.Module):
    """One dynamic-snake conv branch (dynamic_snake_conv.py:18 DSConv):
    tanh offsets accumulated outward from the kernel center deform the tap
    line; samples contract through a (K,1)/(1,K) stride-K conv + GN + SiLU.
    morph 0 = taps along W with snake offsets in H, morph 1 = transposed."""

    c2: int
    morph: int
    k: int = 3
    extend_scope: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.transformer import _bilinear_sample_zeros

        b, h, w, c = x.shape
        K = self.k
        off = _bare_conv(x, 2 * K, 3, self.dtype, "offset_conv", bias=True)
        off = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                           param_dtype=jnp.float32, name="offset_bn")(off)
        off = jnp.tanh(off)
        y_off, x_off = off[..., :K], off[..., K:]  # (b, h, w, K)
        # accumulate outward from the center tap (the snake swing)
        center = K // 2
        snake = y_off if self.morph == 0 else x_off
        acc = [jnp.zeros_like(snake[..., 0])] * K
        for i in range(1, center + 1):
            acc[center + i] = acc[center + i - 1] + snake[..., center + i]
            acc[center - i] = acc[center - i + 1] + snake[..., center - i]
        acc = jnp.stack(acc, -1) * self.extend_scope  # (b, h, w, K)
        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
        taps = jnp.arange(K, dtype=jnp.float32) - center
        if self.morph == 0:  # taps along W, snake in H
            sx = gx[None, ..., None] + taps
            sy = gy[None, ..., None] + acc
        else:  # taps along H, snake in W
            sy = gy[None, ..., None] + taps
            sx = gx[None, ..., None] + acc
        loc = jnp.stack([(sx + 0.5) / w, (sy + 0.5) / h], -1)  # (b|1, h, w, K, 2)
        loc = jnp.broadcast_to(loc, (b, h, w, K, 2)).reshape(b, h * w * K, 2)
        sampled = _bilinear_sample_zeros(x, loc).reshape(b, h, w, K, c)
        kern = self.param("dsc_kernel", nn.initializers.lecun_normal(), (K * c, self.c2), jnp.float32)
        bias = self.param("dsc_bias", nn.initializers.zeros, (self.c2,), jnp.float32)
        # the reference DSConv registers BOTH orientation convs per branch and
        # uses only the morph-selected one — kept for state-dict parity
        self.param("dsc_kernel_unused", nn.initializers.lecun_normal(), (K * c, self.c2), jnp.float32)
        self.param("dsc_bias_unused", nn.initializers.zeros, (self.c2,), jnp.float32)
        # torch (K,1)/(1,K) stride-K conv over the tiled map == one tap-matmul
        y = sampled.reshape(b, h, w, K * c) @ kern.astype(sampled.dtype) + bias.astype(sampled.dtype)
        y = nn.GroupNorm(num_groups=self.c2 // 4, dtype=self.dtype, param_dtype=jnp.float32, name="gn")(y)
        return jax.nn.silu(y)


class DySnakeConv(nn.Module):
    """DySnakeConv (dynamic_snake_conv.py:7): standard conv + x-snake +
    y-snake branches concatenated (3x channels out)."""

    c2: int
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = _conv(x, self.c2, self.k, train, self.dtype, "conv_0")
        bx = _DSnakeBranch(self.c2, 0, self.k, dtype=self.dtype, name="conv_x")(x, train)
        by = _DSnakeBranch(self.c2, 1, self.k, dtype=self.dtype, name="conv_y")(x, train)
        return jnp.concatenate([a, bx, by], -1)


class _DySnakeBottleneck(nn.Module):
    """Bottleneck_DySnakeConv (block.py:1396): cv1 Conv, cv2 DySnakeConv
    (3x out), cv3 1x1 back to c2."""

    c2: int
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(x, self.c2, self.k0, train, self.dtype, "cv1")
        y = DySnakeConv(self.c2, 3, dtype=self.dtype, name="cv2")(y, train)
        y = _conv(y, self.c2, 1, train, self.dtype, "cv3")
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class SS2D(nn.Module):
    """2-D selective scan (mamba_vss.py:16, VMamba SS2D): four direction
    sequences (row/col major x fwd/rev) through the Mamba recurrence —
    evaluated with our associative-scan selective_scan (the reference needs
    its CUDA extension here), summed back, LN, gated by silu(z)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 3
    expand: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, C)
        import math as _m

        from experiment_yolo_tpu.ops.pallas.selective_scan import selective_scan_reference

        B, H, W, C = x.shape
        d_inner = self.expand * self.d_model
        dt_rank = _m.ceil(self.d_model / 16)
        N = self.d_state
        xz = nn.Dense(d_inner * 2, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="in_proj")(x)
        xc, z = xz[..., :d_inner], xz[..., d_inner:]
        p = (self.d_conv - 1) // 2
        xc = nn.Conv(d_inner, (self.d_conv, self.d_conv), padding=[(p, p)] * 2, feature_group_count=d_inner,
                     use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="conv2d")(xc)
        xc = jax.nn.silu(xc)

        xw = self.param("x_proj_weight", nn.initializers.lecun_normal(),
                        (4, dt_rank + 2 * N, d_inner), jnp.float32)
        dtw = self.param("dt_projs_weight", nn.initializers.lecun_normal(), (4, d_inner, dt_rank), jnp.float32)
        # softplus^-1(0.01) constant stand-in for the reference's log-uniform
        # dt init (init-time only)
        dtb = self.param("dt_projs_bias", nn.initializers.constant(_m.log(_m.expm1(0.01))),
                         (4, d_inner), jnp.float32)
        a_logs = self.param("A_logs",
                            lambda _k: jnp.tile(jnp.log(jnp.arange(1, N + 1, dtype=jnp.float32)), (4, d_inner, 1)),
                            )
        ds = self.param("Ds", nn.initializers.ones, (4, d_inner), jnp.float32)

        row = xc.reshape(B, H * W, d_inner)
        col = xc.transpose(0, 2, 1, 3).reshape(B, H * W, d_inner)
        seqs = [row, col, row[:, ::-1], col[:, ::-1]]
        ys = []
        for k, seq in enumerate(seqs):
            dbl = seq.astype(jnp.float32) @ xw[k].T
            dt, Bs, Cs = dbl[..., :dt_rank], dbl[..., dt_rank : dt_rank + N], dbl[..., dt_rank + N :]
            dt = jax.nn.softplus(dt @ dtw[k].T + dtb[k])
            A = -jnp.exp(a_logs[k])  # (d_inner, N)
            ys.append(selective_scan_reference(seq.astype(jnp.float32), dt, A, Bs, Cs, ds[k]))
        y = ys[0] + ys[2][:, ::-1]
        ycol = ys[1] + ys[3][:, ::-1]
        y = y + ycol.reshape(B, W, H, d_inner).transpose(0, 2, 1, 3).reshape(B, H * W, d_inner)
        y = y.reshape(B, H, W, d_inner).astype(x.dtype)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="out_norm")(y)
        y = y * jax.nn.silu(z)
        return nn.Dense(self.d_model, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(y)


class VSSBlock(nn.Module):
    """VSSBlock (mamba_vss.py:200): LN -> SS2D -> residual."""

    c2: int
    d_state: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="ln_1")(x)
        return x + SS2D(self.c2, d_state=self.d_state, dtype=self.dtype, name="self_attention")(y, train)


def _patches(x, k, pad):
    """im2col: (B,H,W,C) -> (B,H,W,k*k,C) with zero padding."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    cols = [xp[:, i : i + h, j : j + w] for i in range(k) for j in range(k)]
    return jnp.stack(cols, axis=3)


class ODConv2d(nn.Module):
    """Omni-dimensional dynamic conv (block.py:713, kernel_num=1 as the
    zoo instantiates it): channel/filter/spatial attentions from pooled
    features modulate one conv kernel per sample; expressed as im2col +
    one attention-weighted einsum (MXU) instead of the reference's
    groups=batch conv trick."""

    c2: int
    k: int = 3
    reduction: float = 0.0625
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        att_ch = max(int(c1 * self.reduction), 16)
        s = x.mean(axis=(1, 2), keepdims=True)
        s = _bare_conv(s, att_ch, 1, self.dtype, "att_fc")
        s = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="att_bn")(s)
        s = jax.nn.relu(s)
        ch_att = jax.nn.sigmoid(_bare_conv(s, c1, 1, self.dtype, "channel_fc", bias=True))
        f_att = jax.nn.sigmoid(_bare_conv(s, self.c2, 1, self.dtype, "filter_fc", bias=True))
        weight = self.param("weight", nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
                            (self.k * self.k, c1, self.c2), jnp.float32)
        y = x * ch_att
        if self.k == 1:
            out = jnp.einsum("bhwc,co->bhwo", y, weight[0].astype(y.dtype))
        else:
            sp = jax.nn.sigmoid(_bare_conv(s, self.k * self.k, 1, self.dtype, "spatial_fc", bias=True))
            sp = sp[:, 0, 0, :]  # (B, k*k)
            pt = _patches(y, self.k, self.k // 2)  # (B,H,W,k2,C)
            out = jnp.einsum("bhwtc,tco,bt->bhwo", pt, weight.astype(y.dtype), sp.astype(y.dtype))
        return out * f_att


class _ODConvBottleneck(nn.Module):
    """Bottleneck_ODConv (block.py:771): BOTH convs are ODConv2d."""

    c2: int
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ODConv2d(self.c2, k=self.k0, dtype=self.dtype, name="cv1")(x, train)
        y = ODConv2d(self.c2, k=3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class DynamicConv(nn.Module):
    """DynamicConv (block.py:4768, CondConv): sigmoid expert routing over
    num_experts kernels, BN + SiLU."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    num_experts: int = 4
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        route = nn.Dense(self.num_experts, dtype=self.dtype, param_dtype=jnp.float32, name="routing")(
            x.mean(axis=(1, 2)))
        r = jax.nn.sigmoid(route)  # (B, E)
        weight = self.param("cond_weight", nn.initializers.lecun_normal(),
                            (self.num_experts, self.k * self.k, c1 // self.g, self.c2), jnp.float32)
        pt = _patches(x, self.k, self.k // 2)  # (B,H,W,k2,C)
        if self.s > 1:
            pt = pt[:, :: self.s, :: self.s]
        if self.g == 1:
            out = jnp.einsum("bhwtc,etco,be->bhwo", pt, weight.astype(pt.dtype), r.astype(pt.dtype))
        else:  # grouped (the Ghost cheap op): per-group einsum
            gs_in, gs_out = c1 // self.g, self.c2 // self.g
            ptg = pt.reshape(*pt.shape[:4], self.g, gs_in)
            wg = weight.reshape(self.num_experts, self.k * self.k, gs_in, self.g, gs_out)
            out = jnp.einsum("bhwtgc,etcgo,be->bhwgo", ptg, wg.astype(pt.dtype), r.astype(pt.dtype))
            out = out.reshape(*out.shape[:3], self.c2)
        out = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype,
                           param_dtype=jnp.float32, name="bn")(out)
        return jax.nn.silu(out) if self.act else out


class GhostModuleDyn(nn.Module):
    """GhostModule with DynamicConvs (block.py:4779)."""

    c2: int
    ratio: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_ch = -(-self.c2 // self.ratio)
        new_ch = init_ch * (self.ratio - 1)
        x1 = DynamicConv(init_ch, 1, dtype=self.dtype, name="primary_conv")(x, train)
        x2 = DynamicConv(new_ch, 3, g=init_ch, dtype=self.dtype, name="cheap_operation")(x1, train)
        return jnp.concatenate([x1, x2], -1)[..., : self.c2]


class _DynamicConvBottleneck(nn.Module):
    """Bottleneck_DynamicConv (block.py:4793): cv2 = DynamicConv 3x3."""

    c2: int
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(x, self.c2, self.k0, train, self.dtype, "cv1")
        y = DynamicConv(self.c2, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


DRB_CFGS = {  # kernel -> (branch kernels, dilations) (UniRepLKNet.py:158)
    17: ((5, 9, 3, 3, 3), (1, 2, 4, 5, 7)),
    15: ((5, 7, 3, 3, 3), (1, 2, 3, 5, 7)),
    13: ((5, 7, 3, 3, 3), (1, 2, 3, 4, 5)),
    11: ((5, 5, 3, 3, 3), (1, 2, 3, 4, 5)),
    9: ((5, 5, 3, 3), (1, 2, 3, 4)),
    7: ((5, 3, 3), (1, 2, 3)),
    5: ((3, 3), (1, 2)),
}


class DilatedReparamBlock(nn.Module):
    """Dilated reparam large-kernel dw conv (UniRepLKNet.py:145): one KxK
    depthwise conv-BN plus parallel small dilated dw conv-BN branches summed
    (train-time structure; branches fold into the large kernel at deploy)."""

    k: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        bn = lambda xx, nm: MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                         dtype=self.dtype, param_dtype=jnp.float32, name=nm)(xx)
        out = bn(_bare_conv(x, c, self.k, self.dtype, "lk_origin", g=c), "origin_bn")
        ks, ds = DRB_CFGS[self.k]
        for kk, r in zip(ks, ds):
            y = nn.Conv(c, (kk, kk), padding=[((r * (kk - 1) + 1) // 2,) * 2] * 2, feature_group_count=c,
                        kernel_dilation=(r, r), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"dil_conv_k{kk}_{r}")(x)
            out = out + bn(y, f"dil_bn_k{kk}_{r}")
        return out


class UniRepLKNetBlock(nn.Module):
    """UniRepLKNetBlock (UniRepLKNet.py:222): DRB dw conv + BN + SE(dim/4) +
    GRN-gated FFN with layer scale, residual."""

    c2: int
    k: int = 7
    ffn_factor: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2
        if self.k >= 7:
            y = DilatedReparamBlock(self.k, dtype=self.dtype, name="dwconv")(x, train)
        elif self.k > 0:
            y = _bare_conv(x, c, self.k, self.dtype, "dwconv", g=c if self.k != 1 else 1)
        else:
            y = x
        if self.k > 0:
            y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name="norm")(y)
        # SEBlock(dim, dim//4): 1x1 reduce (bias) + ReLU + 1x1 (bias) + sigmoid
        s = y.mean(axis=(1, 2), keepdims=True)
        s = _bare_conv(s, c // 4, 1, self.dtype, "se_down", bias=True)
        s = _bare_conv(jax.nn.relu(s), c, 1, self.dtype, "se_up", bias=True)
        y = y * jax.nn.sigmoid(s)
        ffn = self.ffn_factor * c
        z = nn.Dense(ffn, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="pwconv1")(y)
        z = jax.nn.gelu(z)
        # GRNwithNHWC (use_bias=True): gamma/beta + bias term
        grn_g = self.param("grn_gamma", nn.initializers.zeros, (ffn,), jnp.float32)
        grn_b = self.param("grn_beta", nn.initializers.zeros, (ffn,), jnp.float32)
        gx = jnp.sqrt((z**2).sum(axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
        z = grn_g * (z * nx) + grn_b + z
        z = nn.Dense(c, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="pwconv2")(z)
        z = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="pw_bn")(z)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (c,), jnp.float32)
        return x + gamma * z


class _DRBBottleneck(nn.Module):
    """Bottleneck_DRB (block.py:3345): cv2 = DilatedReparamBlock(7)."""

    c2: int
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(x, self.c2, self.k0, train, self.dtype, "cv1")
        y = DilatedReparamBlock(7, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class DCNv2Conv(nn.Module):
    """The zoo's own DCNv2 layer (block.py:1423): offset+mask conv (kxk,
    zero-init), sigmoid modulation, deformable conv + BN + SiLU."""

    c2: int
    k: int = 3
    s: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.ops.dcnv3 import dcnv2_core

        c1 = x.shape[-1]
        K = self.k * self.k
        p = self.k // 2
        om = nn.Conv(3 * K, (self.k, self.k), strides=(self.s, self.s), padding=[(p, p)] * 2,
                     use_bias=True, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv_offset_mask")(x)
        o1, o2, mask = om[..., :K], om[..., K : 2 * K], jax.nn.sigmoid(om[..., 2 * K :])
        offset = jnp.stack([o1, o2], -1).reshape(*o1.shape[:3], 2 * K)  # (dy,dx) interleaved
        n = c1 * K
        std = 1.0 / (n**0.5)
        weight = self.param("weight", nn.initializers.uniform(scale=2 * std), (self.k, self.k, c1, self.c2),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32)
        y = dcnv2_core(x.astype(self.dtype), offset.astype(jnp.float32), mask.astype(self.dtype),
                       weight.astype(self.dtype), bias.astype(self.dtype), stride=self.s, pad=p)
        y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(y)
        return jax.nn.silu(y) if self.act else y


class DCNV3YOLO(nn.Module):
    """DCNV3_YOLO / DCNV4_YOLO wrapper (block.py:1512/3662): optional 1x1
    stem when channels change, DCNv3/v4 core, BN + SiLU."""

    c2: int
    k: int = 1
    version: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.ops.dcnv3 import DCNv3, DCNv4

        if x.shape[-1] != self.c2:
            x = _conv(x, self.c2, 1, train, self.dtype, "stem_conv")
        cls = DCNv3 if self.version == 3 else DCNv4
        y = cls(self.c2, kernel=self.k, pad=self.k // 2, group=1, dtype=self.dtype, name="dcn")(x, train)
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(y)
        return jax.nn.silu(y)


class ChannelAttentionHSFPN(nn.Module):
    """ChannelAttention_HSFPN (block.py:3702): CBAM-style shared-MLP gate;
    flag=False returns the gate itself (the HS-FPN select signal)."""

    ratio: int = 4
    flag: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        fc1 = nn.Conv(c // self.ratio, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="conv1")
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="conv2")
        avg = fc2(jax.nn.relu(fc1(x.mean(axis=(1, 2), keepdims=True))))
        mx = fc2(jax.nn.relu(fc1(x.max(axis=(1, 2), keepdims=True))))
        gate = jax.nn.sigmoid(avg + mx)
        return gate * x if self.flag else gate


class ELAHSFPN(nn.Module):
    """ELA_HSFPN (block.py:3723): shared Conv1d+GN+sigmoid over pooled H
    and W profiles."""

    flag: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        kern = self.param("conv1x1_kernel", nn.initializers.lecun_normal(), (1, c, c), jnp.float32)
        bias = self.param("conv1x1_bias", nn.initializers.zeros, (c,), jnp.float32)
        gn_s = self.param("gn_scale", nn.initializers.ones, (c,), jnp.float32)
        gn_b = self.param("gn_bias", nn.initializers.zeros, (c,), jnp.float32)

        def branch(seq):  # (b, L, c) -> sigmoid(GN(conv1d_1x1(seq)))
            y = seq @ kern[0].T + bias
            # GroupNorm(16, c) over (c/16, L) groups — torch normalizes each
            # group over (c_g, L)
            L = y.shape[1]
            g = 16
            yg = y.transpose(0, 2, 1).reshape(b, g, -1)
            mu = yg.mean(axis=2, keepdims=True)
            var = yg.var(axis=2, keepdims=True)
            yn = ((yg - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(b, c, L).transpose(0, 2, 1)
            return jax.nn.sigmoid(yn * gn_s + gn_b)

        x_h = branch(x.mean(axis=2))[:, :, None]  # (b, h, 1, c)
        x_w = branch(x.mean(axis=1))[:, None]  # (b, 1, w, c)
        return x * x_h * x_w if self.flag else x_h * x_w


class CAHSFPN(nn.Module):
    """CA_HSFPN (block.py:3758): coordinate attention gate."""

    reduction: int = 8
    flag: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        mip = max(8, c // self.reduction)
        ph = x.mean(axis=2)[:, :, None]  # (b, h, 1, c)
        pw = x.mean(axis=1)[:, :, None]  # (b, w, 1, c)
        y = jnp.concatenate([ph, pw], axis=1)
        y = _bare_conv(y, mip, 1, self.dtype, "conv1", bias=True)
        y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn1")(y)
        y = y * jax.nn.relu6(y + 3.0) / 6.0  # h_swish
        a_h = jax.nn.sigmoid(_bare_conv(y[:, :h], c, 1, self.dtype, "conv_h", bias=True))
        a_w = jax.nn.sigmoid(_bare_conv(y[:, h:], c, 1, self.dtype, "conv_w", bias=True))
        gate = a_h * a_w[:, :, 0][:, None]
        return x * gate if self.flag else gate


class CAAHSFPN(nn.Module):
    """CAA_HSFPN (block.py:3791): CAA context-anchor gate variant."""

    flag: bool = True
    h_k: int = 11
    v_k: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.avg_pool(jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0))), (7, 7), strides=(1, 1))
        y = _conv(y, c, 1, train, self.dtype, "conv1")
        y = nn.Conv(c, (1, self.h_k), padding=[(0, 0), (self.h_k // 2,) * 2], feature_group_count=c,
                    use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="h_conv")(y)
        y = nn.Conv(c, (self.v_k, 1), padding=[(self.v_k // 2,) * 2, (0, 0)], feature_group_count=c,
                    use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="v_conv")(y)
        gate = jax.nn.sigmoid(_conv(y, c, 1, train, self.dtype, "conv2"))
        return gate * x if self.flag else gate


class Multiply(nn.Module):
    """Elementwise product of two inputs (block.py:3808, HS-FPN select)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return xs[0] * xs[1]


class SDI(nn.Module):
    """Semantics-detail infusion (block.py:3634): every input resized to the
    first input's resolution, GSConv-projected, multiplied together."""

    c2: int
    inc: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        th, tw = xs[0].shape[1:3]
        ans = jnp.ones_like(xs[0][..., :1])
        out = None
        for i, x in enumerate(xs):
            if x.shape[1] > th:
                k = x.shape[1] // th
                x = nn.avg_pool(x, (k, k), strides=(k, k))
            elif x.shape[1] < th:
                # align_corners=True bilinear (the reference's interpolate)
                from experiment_yolo_tpu.nn.heads_extra import _resize_align_corners

                x = _resize_align_corners(x, th, tw)
            y = GSConv(self.c2, dtype=self.dtype, name=f"convs{i}")(x, train)
            out = y if out is None else out * y
        return out


class _SwapBottleneck(nn.Module):
    """Bottleneck with cv2 replaced by a custom conv unit (the reference's
    Bottleneck_SCConv/ScConv/EMSC/EMSCP/RFAConv pattern, e.g. block.py:1049)."""

    c2: int
    inner: str
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(x, self.c2, self.k0, train, self.dtype, "cv1")
        y = INNER_UNITS[self.inner](self.c2, self.dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


# unit convs usable inside _SwapBottleneck (name -> builder(c2, dtype))
INNER_UNITS: Dict[str, Callable] = {
    "SCConv": lambda c2, dt: SCConvSC(c2, dtype=dt, name="cv2"),
    "ScConv": lambda c2, dt: ScConvCVPR23(c2, dtype=dt, name="cv2"),
    "EMSC": lambda c2, dt: EMSConv(c2, dtype=dt, name="cv2"),
    "EMSCP": lambda c2, dt: EMSConvP(c2, dtype=dt, name="cv2"),
    "RFAConv": lambda c2, dt: RFAConv(c2, dtype=dt, name="cv2"),
    "RFCBAMConv": lambda c2, dt: RFCBAMConv(c2, dtype=dt, name="cv2"),
    "RFCAConv": lambda c2, dt: RFCAConv(c2, dtype=dt, name="cv2"),
    "VSS": lambda c2, dt: VSSBlock(c2, dtype=dt, name="cv2"),
    "DCNv2": lambda c2, dt: DCNv2Conv(c2, 3, dtype=dt, name="cv2"),
    "DCNv3": lambda c2, dt: DCNV3YOLO(c2, 3, version=3, dtype=dt, name="cv2"),
    "DCNv4": lambda c2, dt: DCNV3YOLO(c2, 3, version=4, dtype=dt, name="cv2"),
    "DLKA": lambda c2, dt: __import__("experiment_yolo_tpu.nn.extra_modules", fromlist=["x"]).DeformableLKA(dtype=dt, name="cv2"),
    "DCNv2_Dynamic": lambda c2, dt: DCNv2DynamicConv(c2, 3, dtype=dt, name="cv2"),
    "FADC": lambda c2, dt: AdaptiveDilatedConv(c2, 3, dtype=dt, name="cv2"),
}

# whole inner block per chain slot: builder(c, shortcut, dtype, name, k0).
# k0 is the swap-bottleneck cv1 kernel — 3 inside C2f_<X>, 1 inside C3_<X>
# (the reference passes k=((1,1),(3,3)) in every C3_<X>, block.py:1056).
INNER_BLOCKS: Dict[str, Callable] = {
    "Faster": lambda c, s, dt, nm, k0, ex=None: FasterBlock(c, dtype=dt, name=nm),
    "Faster_EMA": lambda c, s, dt, nm, k0, ex=None: FasterBlockEMA(c, dtype=dt, name=nm),
    "ContextGuided": lambda c, s, dt, nm, k0, ex=None: ContextGuidedBlock(c, dtype=dt, name=nm),
    "DWR": lambda c, s, dt, nm, k0, ex=None: DWR(c, dtype=dt, name=nm),
    "MSBlock": lambda c, s, dt, nm, k0, ex=None: MSBlock(c, dtype=dt, name=nm),
    "iRMB": lambda c, s, dt, nm, k0, ex=None: IRMB(c, dtype=dt, name=nm),
    "SCConv": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "SCConv", k0=k0, shortcut=s, dtype=dt, name=nm),
    "ScConv": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "ScConv", k0=k0, shortcut=s, dtype=dt, name=nm),
    "EMSC": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "EMSC", k0=k0, shortcut=s, dtype=dt, name=nm),
    "EMSCP": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "EMSCP", k0=k0, shortcut=s, dtype=dt, name=nm),
    "RFAConv": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "RFAConv", k0=k0, shortcut=s, dtype=dt, name=nm),
    "RFCBAMConv": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "RFCBAMConv", k0=k0, shortcut=s, dtype=dt, name=nm),
    "RFCAConv": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "RFCAConv", k0=k0, shortcut=s, dtype=dt, name=nm),
    "AKConv": lambda c, s, dt, nm, k0, ex=None: _AKConvBottleneck(c, k0=k0, shortcut=s, dtype=dt, name=nm),
    "DBB": lambda c, s, dt, nm, k0, ex=None: _DBBBottleneck(c, k0=k0, shortcut=s, dtype=dt, name=nm),
    "EMBC": lambda c, s, dt, nm, k0, ex=None: _EMBCBottleneck(c, shortcut=True, dtype=dt, name=nm),
    "DySnakeConv": lambda c, s, dt, nm, k0, ex=None: _DySnakeBottleneck(c, k0=k0, shortcut=s, dtype=dt, name=nm),
    "VSS": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "VSS", k0=k0, shortcut=s, dtype=dt, name=nm),
    "LVMB": lambda c, s, dt, nm, k0, ex=None: VSSBlock(c, dtype=dt, name=nm),
    "ODConv": lambda c, s, dt, nm, k0, ex=None: _ODConvBottleneck(c, k0=k0, shortcut=s, dtype=dt, name=nm),
    "DynamicConv": lambda c, s, dt, nm, k0, ex=None: _DynamicConvBottleneck(c, k0=k0, shortcut=s, dtype=dt, name=nm),
    "GhostDynamicConv": lambda c, s, dt, nm, k0, ex=None: GhostModuleDyn(c, dtype=dt, name=nm),
    "DRB": lambda c, s, dt, nm, k0, ex=None: _DRBBottleneck(c, k0=k0, shortcut=s, dtype=dt, name=nm),
    "UniRepLKNetBlock": lambda c, s, dt, nm, k0, ex=None: UniRepLKNetBlock(c, ex or 7, dtype=dt, name=nm),
    "RVB": lambda c, s, dt, nm, k0, ex=None: _RVBUnit(c, "none", dtype=dt, name=nm),
    "RVB_SE": lambda c, s, dt, nm, k0, ex=None: _RVBUnit(c, "se", dtype=dt, name=nm),
    "RVB_EMA": lambda c, s, dt, nm, k0, ex=None: _RVBUnit(c, "ema", dtype=dt, name=nm),
    "SWC": lambda c, s, dt, nm, k0, ex=None: _SWCBottleneck(c, k=ex or 13, k0=k0, shortcut=s, dtype=dt, name=nm),
    "iRMB_Cascaded": lambda c, s, dt, nm, k0, ex=None: IRMB(c, cascaded=True, dtype=dt, name=nm),
    "iRMB_DRB": lambda c, s, dt, nm, k0, ex=None: IRMB(c, local="drb", dw_ks=ex or 7, dtype=dt, name=nm),
    "iRMB_SWC": lambda c, s, dt, nm, k0, ex=None: IRMB(c, local="swc", dw_ks=ex or 13, dtype=dt, name=nm),
    "DCNv2": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "DCNv2", k0=k0, shortcut=s, dtype=dt, name=nm),
    "DCNv3": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "DCNv3", k0=k0, shortcut=s, dtype=dt, name=nm),
    "DCNv4": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "DCNv4", k0=k0, shortcut=s, dtype=dt, name=nm),
    "MLCA": lambda c, s, dt, nm, k0, ex=None: _AttnBottleneck(c, "MLCA", k0=k0, shortcut=s, dtype=dt, name=nm),
    "CloAtt": lambda c, s, dt, nm, k0, ex=None: _AttnBottleneck(c, "CloAtt", k0=k0, shortcut=s, dtype=dt, name=nm),
    "DAttention": lambda c, s, dt, nm, k0, ex=None: _AttnBottleneck(c, "DAttention", k0=k0, shortcut=s, extra=ex, dtype=dt, name=nm),
    "FocusedLinearAttention": lambda c, s, dt, nm, k0, ex=None: _AttnBottleneck(c, "FocusedLinearAttention", k0=k0, shortcut=s, extra=ex, dtype=dt, name=nm),
    "DLKA": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "DLKA", k0=k0, shortcut=s, dtype=dt, name=nm),
    "DCNv2_Dynamic": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "DCNv2_Dynamic", k0=k0, shortcut=s, dtype=dt, name=nm),
    "DWR_DRB": lambda c, s, dt, nm, k0, ex=None: DWRDRB(c, dtype=dt, name=nm),
    "FADC": lambda c, s, dt, nm, k0, ex=None: _SwapBottleneck(c, "FADC", k0=k0, shortcut=s, dtype=dt, name=nm),
    "Parc": lambda c, s, dt, nm, k0, ex=None: _ParCBottleneck(c, ex, k0=k0, shortcut=s, dtype=dt, name=nm),
    "RetBlock": lambda c, s, dt, nm, k0, ex=None: __import__("experiment_yolo_tpu.nn.backbones", fromlist=["x"])._RetBlock(c, 8, c, init_value=2, heads_range=4, chunk=True, dtype=dt, name=nm),
    "PKIModule": lambda c, s, dt, nm, k0, ex=None: PKIModule(c, dtype=dt, name=nm),
    "AggregatedAtt": lambda c, s, dt, nm, k0, ex=None: _AttnBottleneck(c, "AggregatedAtt", k0=k0, shortcut=s, extra=ex, dtype=dt, name=nm),
    "OREPA": lambda c, s, dt, nm, k0, ex=None: _OREPABottleneck(c, k0=k0, shortcut=s, dtype=dt, name=nm),
    "PPA": lambda c, s, dt, nm, k0, ex=None: PPA(c, dtype=dt, name=nm),
    "Faster_CGLU": lambda c, s, dt, nm, k0, ex=None: FasterBlockCGLU(c, dtype=dt, name=nm),
    "REPVGGOREPA": lambda c, s, dt, nm, k0, ex=None: _OREPABottleneck(c, k0=k0, shortcut=s, repvgg=True, dtype=dt, name=nm),
}


class _AttnBottleneck(nn.Module):
    """Standard bottleneck + trailing attention (the Bottleneck_MLCA /
    _CloAtt pattern, block.py:2962: attention applied after cv2, inside the
    residual)."""

    c2: int
    attn: str
    k0: int = 3
    shortcut: bool = True
    extra: Any = None  # fmapsize for DAttention / FocusedLinearAttention
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn import extra_modules as X

        y = _conv(x, self.c2, self.k0, train, self.dtype, "cv1")
        y = _conv(y, self.c2, 3, train, self.dtype, "cv2")
        if self.attn == "MLCA":
            y = X.MLCA(self.c2, dtype=self.dtype, name="attention")(y, train)
        elif self.attn == "EMA":
            y = X.EMAAttention(dtype=self.dtype, name="attention")(y, train)
        elif self.attn == "SE":
            y = X.SEAttention(dtype=self.dtype, name="attention")(y, train)
        elif self.attn == "CloAtt":
            y = X.EfficientAttention(dtype=self.dtype, name="attention")(y, train)
        elif self.attn == "DAttention":
            fs = tuple(self.extra) if self.extra else (x.shape[1], x.shape[2])
            y = X.DAttention(fs, dtype=self.dtype, name="attention")(y, train)
        elif self.attn == "FocusedLinearAttention":
            fs = tuple(self.extra) if self.extra else (x.shape[1], x.shape[2])
            y = X.FocusedLinearAttention(fs, dtype=self.dtype, name="attention")(y, train)
        elif self.attn == "AggregatedAtt":
            from experiment_yolo_tpu.nn.backbones import _TNAggregatedAttention

            sr = int(self.extra[1]) if self.extra and len(self.extra) > 1 else 2
            y = _TNAggregatedAttention(self.c2, 8, sr, dtype=self.dtype, name="attention")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class _AKConvBottleneck(nn.Module):
    """Bottleneck_AKConv (block.py:3121): cv1 = AKConv when k0==3 else the
    plain 1x1 Conv; cv2 = AKConv. AKConv is the reference's LDConv under a
    different name (identical math — see nn/modules.py:LDConv)."""

    c2: int
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.modules import LDConv

        if self.k0 == 3:
            y = LDConv(self.c2, 3, dtype=self.dtype, name="cv1")(x, train)
        else:
            y = _conv(x, self.c2, 1, train, self.dtype, "cv1")
        y = LDConv(self.c2, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C2fX(nn.Module):
    """Generic C2f with a zoo inner block (covers C2f_<X>, block.py)."""

    c2: int
    inner: str
    n: int = 1
    shortcut: bool = False
    e: float = 0.5
    extra: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            blk = INNER_BLOCKS[self.inner](c, self.shortcut, self.dtype, f"m{i}", 3, self.extra)
            ys.append(blk(ys[-1], train))
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3X(nn.Module):
    """Generic C3 with a zoo inner block (covers C3_<X>, block.py)."""

    c2: int
    inner: str
    n: int = 1
    shortcut: bool = False
    e: float = 0.5
    extra: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = INNER_BLOCKS[self.inner](c_, self.shortcut, self.dtype, f"m{i}", 1, self.extra)(y1, train)
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)


class HWD(nn.Module):
    """Haar wavelet downsample (block.py:3942, pytorch_wavelets DWTForward
    J=1 haar): the four 2x2 Haar subbands concatenated + 1x1 Conv. The DWT is
    four fixed linear combinations of each 2x2 block — pure jnp here."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = x[:, 0::2, 0::2]
        b = x[:, 0::2, 1::2]
        c = x[:, 1::2, 0::2]
        d = x[:, 1::2, 1::2]
        ll = (a + b + c + d) / 2.0
        hl = (a - b + c - d) / 2.0
        lh = (a + b - c - d) / 2.0
        hh = (a - b - c + d) / 2.0
        y = jnp.concatenate([ll, hl, lh, hh], -1)
        return _conv(y, self.c2, 1, train, self.dtype, "conv")


class _RVBUnit(nn.Module):
    """RepViTBlock zoo inner (block.py:4830): stride-1 RepVGGDW token mixer
    (repvit.py RepVGGDW: dw3x3-BN + dw1x1(bias) + identity, then BN) with an
    optional SE (timm, rd=0.25) or EMA attention, and a residual 1x1
    expand(x2)/GELU/project channel mixer whose tail BN starts at zero."""

    c2: int
    attn: str = "none"  # none (C2f_RVB) | se (C2f_RVB_SE) | ema (C2f_RVB_EMA)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.backbones import _conv_bn as _cbn
        from experiment_yolo_tpu.nn.backbones import _squeeze_excite
        from experiment_yolo_tpu.nn.extra_modules import EMAAttention

        c = self.c2
        y = _cbn(x, c, 3, 1, 1, train, self.dtype, "rvg_dw", groups=c)
        y1 = nn.Conv(c, (1, 1), feature_group_count=c, use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="rvg_pw")(x)
        y = _bn(y + y1 + x, train, self.dtype, "rvg_bn")
        if self.attn == "se":
            y = _squeeze_excite(y, c, train, self.dtype, "tm_se")
        elif self.attn == "ema":
            y = EMAAttention(dtype=self.dtype, name="tm_ema")(y, train)
        z = _cbn(y, 2 * c, 1, 1, 0, train, self.dtype, "cm_pw1")
        return y + _cbn(jax.nn.gelu(z, approximate=False), c, 1, 1, 0, train, self.dtype,
                        "cm_pw2", bn_init=0.0)


class ReparamLKConv(nn.Module):
    """Shift-wise large-kernel conv (shiftwise_conv.py:219, Decom branch):
    one grouped small-kernel conv emits nk=ceil(K/small) copies per channel;
    each copy is sigmoid-masked (lora1/lora2), statically shifted along W
    resp. H to tile the KxK footprint, summed per direction and BN'd; a
    plain small-kernel conv-BN branch is added; output = SiLU(BN(sum))."""

    c2: int
    k: int = 13
    small: int = 5
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math as _m

        mink, maxk = self.small, self.k
        nk = _m.ceil(maxk / mink)
        mid_p = maxk // 2
        off_l = mid_p % mink
        off_r = (nk * mink - mid_p - 1) % mink
        padding = off_l % mink
        while padding < off_r:
            padding += mink
        while padding < mink - 1:
            padding += mink
        index = _m.ceil((mid_p + 1) / mink)
        B, H, W, C = x.shape
        out_n = self.c2 * nk
        y = nn.Conv(out_n, (mink, mink), padding=[(padding, padding)] * 2,
                    feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="split_convs")(x)
        crop = padding - mink // 2
        guard = nk * mink  # bounds the largest |shift|

        def _lora(mask_name, shift_axis):
            m = self.param(mask_name, lambda k_, s_: jax.random.uniform(k_, s_, jnp.float32, -1.0, 1.0),
                           (out_n,))
            yy = (y * jax.nn.sigmoid(m)).reshape(B, y.shape[1], y.shape[2], self.c2, nk)
            acc = None
            for i in range(nk):
                s = (i + 1 - index) * mink
                t = yy[..., i]
                if shift_axis == 2:  # lora1: shift along W, center-crop H
                    t = t[:, crop:crop + H]
                    t = jnp.pad(t, ((0, 0), (0, 0), (guard, guard), (0, 0)))
                    t = t[:, :, guard + s:guard + s + W]
                else:  # lora2: shift along H, center-crop W
                    t = t[:, :, crop:crop + W]
                    t = jnp.pad(t, ((0, 0), (guard, guard), (0, 0), (0, 0)))
                    t = t[:, guard + s:guard + s + H]
                acc = t if acc is None else acc + t
            return _bn(acc, train, self.dtype, f"bn_{mask_name}")

        out = _lora("lora1", 2) + _lora("lora2", 1)
        sc = nn.Conv(self.c2, (mink, mink), padding=[(mink // 2, mink // 2)] * 2,
                     feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="small_conv")(x)
        out = out + _bn(sc, train, self.dtype, "small_bn")
        return jax.nn.silu(_bn(out, train, self.dtype, "bn"))


class _SWCBottleneck(nn.Module):
    """Bottleneck_SWC (block.py:4074): cv2 = ReparamLargeKernelConv(K,
    groups=c2//16)."""

    c2: int
    k: int = 13
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(x, self.c2, self.k0, train, self.dtype, "cv1")
        y = ReparamLKConv(self.c2, k=self.k, groups=self.c2 // 16,
                          dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class SPPFLSKA(nn.Module):
    """SPPF_LSKA (block.py:2625): SPPF whose pooled concat is gated by
    LSKA(k=11) before the output 1x1."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import LSKA

        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.k // 2
        win = (1, self.k, self.k, 1)
        pads = ((0, 0), (p, p), (p, p), (0, 0))
        y1 = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max, win, (1, 1, 1, 1), pads)
        y2 = jax.lax.reduce_window(y1, -jnp.inf, jax.lax.max, win, (1, 1, 1, 1), pads)
        y3 = jax.lax.reduce_window(y2, -jnp.inf, jax.lax.max, win, (1, 1, 1, 1), pads)
        cat = jnp.concatenate([y, y1, y2, y3], -1)
        cat = LSKA(11, dtype=self.dtype, name="lska")(cat, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(cat, train)


class TransformerBlockTR(nn.Module):
    """TransformerBlock (modules/transformer.py:137): learned position
    embedding + n TransformerLayers (bias-free q/k/v projections feeding a
    4-head attention with biased in/out projections, then a bias-free MLP)."""

    c2: int
    num_heads: int = 4
    n: int = 1
    dtype: Dtype = jnp.float32

    def _dense(self, c, name, bias):
        return nn.Dense(c, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = _conv(x, self.c2, 1, train, self.dtype, "conv")
        b, h, w, c = x.shape
        hd = c // self.num_heads
        p = x.reshape(b, h * w, c)
        p = p + self._dense(c, "linear", True)(p)
        for i in range(self.n):
            q = self._dense(c, f"tr{i}_q", False)(p)
            k = self._dense(c, f"tr{i}_k", False)(p)
            v = self._dense(c, f"tr{i}_v", False)(p)
            q = self._dense(c, f"tr{i}_inq", True)(q).reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
            k = self._dense(c, f"tr{i}_ink", True)(k).reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
            v = self._dense(c, f"tr{i}_inv", True)(v).reshape(b, -1, self.num_heads, hd).transpose(0, 2, 1, 3)
            a = jax.nn.softmax(q @ k.transpose(0, 1, 3, 2) * hd**-0.5, axis=-1)
            o = (a @ v).transpose(0, 2, 1, 3).reshape(b, -1, c)
            p = self._dense(c, f"tr{i}_out", True)(o) + p
            p = self._dense(c, f"tr{i}_fc2", False)(self._dense(c, f"tr{i}_fc1", False)(p)) + p
        return p.reshape(b, h, w, c)


class C3TR(nn.Module):
    """C3TR (modules/block.py:279): C3 whose bottleneck chain is one
    TransformerBlock with num_layers = n."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = TransformerBlockTR(c_, 4, self.n, dtype=self.dtype, name="m")(y1, train)
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)


class DGCST(nn.Module):
    """Dynamic group convolution shuffle transformer (block.py:4901): 1x1 in,
    dw-1x1 on the first quarter + 2-group channel shuffle, concat back, and a
    residual two-conv tail."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 4
        x = _conv(x, self.c2, 1, train, self.dtype, "conv1")
        x1, x2 = x[..., :c], x[..., c:]
        x1 = _conv(x1, c, 1, train, self.dtype, "gconv", g=c)
        x1 = jnp.concatenate([x1[..., 0::2], x1[..., 1::2]], -1)
        x = jnp.concatenate([x1, x2], -1)
        y = _conv(x, self.c2, 1, train, self.dtype, "conv2_0")
        y = _conv(y, self.c2, 1, train, self.dtype, "conv2_1")
        return x + y


class DWRDRB(nn.Module):
    """DWR_DRB (block.py:3368): DWR whose d3/d5 dilation branches are
    DilatedReparamBlocks (k=5 and k=7)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2
        y = _conv(x, c // 2, 3, train, self.dtype, "conv_3x3")
        x1 = _conv(y, c, 3, train, self.dtype, "d1")
        x2 = DilatedReparamBlock(5, dtype=self.dtype, name="d3")(y, train)
        x3 = DilatedReparamBlock(7, dtype=self.dtype, name="d5")(y, train)
        out = jnp.concatenate([x1, x2, x3], -1)
        return _conv(out, c, 1, train, self.dtype, "conv_1x1") + x


class DCNv2DynamicConv(nn.Module):
    """DCNv2_Dynamic (block.py:1693): DCNv2 whose offset+mask features pass
    through an MPCA attention before the chunk/sigmoid split."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import MPCA
        from experiment_yolo_tpu.ops.dcnv3 import dcnv2_core

        c1 = x.shape[-1]
        K = self.k * self.k
        p = self.k // 2
        om = nn.Conv(3 * K, (self.k, self.k), strides=(self.s, self.s), padding=[(p, p)] * 2,
                     use_bias=True, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv_offset_mask")(x)
        om = MPCA(dtype=self.dtype, name="offset_attention")(om, train)
        o1, o2, mask = om[..., :K], om[..., K:2 * K], jax.nn.sigmoid(om[..., 2 * K:])
        offset = jnp.stack([o1, o2], -1).reshape(*o1.shape[:3], 2 * K)
        n = c1 * K
        std = 1.0 / (n**0.5)
        weight = self.param("weight", nn.initializers.uniform(scale=2 * std),
                            (self.k, self.k, c1, self.c2), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32)
        y = dcnv2_core(x.astype(self.dtype), offset.astype(jnp.float32), mask.astype(self.dtype),
                       weight.astype(self.dtype), bias.astype(self.dtype), stride=self.s, pad=p)
        y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="bn")(y)
        return jax.nn.silu(y)


def _kaiming_uniform(gain2=2.0):
    return nn.initializers.variance_scaling(gain2, "fan_in", "uniform")


class _OREPAWeight(nn.Module):
    """OREPA branch-parameterized kernel generator (orepa.py:21): six reparam
    branches (origin kxk, avg, frequency prior, 1x1->kxk, padded 1x1,
    expanded depthwise-separable) summed with per-branch per-out-channel
    gates. Returns the effective OIHW kernel; generation is a handful of tiny
    einsums that XLA folds into the conv's prologue."""

    c1: int
    c2: int
    k: int = 3
    groups: int = 1
    repvgg_style: bool = False  # OREPA_3x3_RepVGG (orepa.py:424): no 1x1 branch
    single_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        import numpy as np

        o, c1, k, g = self.c2, self.c1, self.k, self.groups
        ig = c1 // g
        ku = _kaiming_uniform()
        w_origin = self.param("weight_orepa_origin", ku, (o, ig, k, k), jnp.float32)
        w_avg = self.param("weight_orepa_avg_conv", ku, (o, ig, 1, 1), jnp.float32)
        w_pfir = self.param("weight_orepa_pfir_conv", ku, (o, ig, 1, 1), jnp.float32)
        if not self.repvgg_style:
            w_1x1 = self.param("weight_orepa_1x1", ku, (o, ig, 1, 1), jnp.float32)
        internal = c1 if (g <= 4 if not self.repvgg_style else g < o) else 2 * c1
        w_id1 = self.param("weight_orepa_1x1_kxk_idconv1", nn.initializers.zeros,
                           (internal, ig, 1, 1), jnp.float32)
        w_kxk2 = self.param("weight_orepa_1x1_kxk_conv2", ku, (o, internal // g, k, k), jnp.float32)
        er = 8
        w_gdw = self.param("weight_orepa_gconv_dw", ku, (c1 * er, 1, k, k), jnp.float32)
        w_gpw = self.param("weight_orepa_gconv_pw", ku, (o, c1 * er // g, 1, 1), jnp.float32)
        nb = 5 if self.repvgg_style else 6
        if self.repvgg_style and o == c1:
            nb += 1  # unused identity gate row (orepa.py:494 — dead params)
        rows = ([0.25, 0.25, 0.0, 0.5, 0.5] if self.repvgg_style else [0.25, 0.25, 0.0, 0.5, 1.0, 0.5])
        rows = rows + [0.0] * (nb - len(rows))
        if self.single_init:
            rows = [1.0] + [0.0] * (nb - 1)
        vec = self.param("vector", lambda _, sh: jnp.tile(jnp.asarray(rows, jnp.float32)[:, None], (1, sh[1])),
                         (nb, o))
        # constants
        avg_avg = jnp.full((k, k), 1.0 / (k * k), jnp.float32)
        prior = np.zeros((o, k, k), np.float32)  # fre_init (orepa.py:157)
        half = o / 2
        for i in range(o):
            for h in range(min(3, k)):
                for w_ in range(min(3, k)):
                    if i < half:
                        prior[i, h, w_] = math.cos(math.pi * (h + 0.5) * (i + 1) / 3)
                    else:
                        prior[i, h, w_] = math.cos(math.pi * (w_ + 0.5) * (i + 1 - half) / 3)
        prior = jnp.asarray(prior)
        idv = np.zeros((internal, ig), np.float32)
        for i in range(internal):
            idv[i, i % ig] = 1.0
        idv = jnp.asarray(idv)

        w = jnp.einsum("oihw,o->oihw", w_origin, vec[0])
        w = w + jnp.einsum("oihw,o->oihw", jnp.einsum("oi,hw->oihw", w_avg[..., 0, 0], avg_avg), vec[1])
        w = w + jnp.einsum("oihw,o->oihw", jnp.einsum("oi,ohw->oihw", w_pfir[..., 0, 0], prior), vec[2])
        conv1 = w_id1[..., 0, 0] + idv  # (internal, ig)
        if g > 1:
            c1g = conv1.reshape(g, internal // g, ig)
            c2g = w_kxk2.reshape(g, o // g, internal // g, k, k)
            kxk = jnp.einsum("gti,gothw->goihw", c1g, c2g).reshape(o, ig, k, k)
        else:
            kxk = jnp.einsum("ti,othw->oihw", conv1, w_kxk2)
        w = w + jnp.einsum("oihw,o->oihw", kxk, vec[3])
        if not self.repvgg_style:
            p = (k - 1) // 2
            pad1x1 = jnp.pad(w_1x1, ((0, 0), (0, 0), (p, p), (p, p)))
            w = w + jnp.einsum("oihw,o->oihw", pad1x1, vec[4])
        # dwsc2full (orepa.py:234): expand_ratio-8 depthwise-separable branch
        gc = g
        ggc = c1 // gc
        dw = w_gdw.reshape(gc, ggc, er, 1, k, k)
        pw = w_gpw[..., 0, 0].reshape(o // gc, gc, ggc, er)
        gconv = jnp.einsum("cgtihw,ocgt->cogihw", dw, pw).reshape(o, c1 // gc, k, k)
        w = w + jnp.einsum("oihw,o->oihw", gconv, vec[4 if self.repvgg_style else 5])
        return w


class OREPA(nn.Module):
    """OREPA conv (orepa.py:21): generated kernel + conv + BN + SiLU."""

    c2: int
    k: int = 3
    s: int = 1
    groups: int = 1
    act: bool = True
    single_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        w = _OREPAWeight(c1, self.c2, self.k, self.groups, single_init=self.single_init,
                         dtype=self.dtype, name="w")()
        pad = self.k // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.transpose(2, 3, 1, 0).astype(self.dtype),
            (self.s, self.s), [(pad, pad)] * 2, feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _bn(y, train, self.dtype, "bn")
        return jax.nn.silu(y) if self.act else y


class OREPALargeConv(nn.Module):
    """OREPA_LargeConv (orepa.py:308): (k-1)/2 chained 3x3 OREPA kernels
    composed into one KxK kernel by convolving the weights themselves."""

    c2: int
    k: int = 5
    s: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        layers = (self.k - 1) // 2
        w = _OREPAWeight(c1, self.c2, 3, dtype=self.dtype, name="w0")()
        w = w.transpose(1, 0, 2, 3)  # (i, o0, 3, 3) as an "image" batch
        for i in range(layers - 1):
            w2 = _OREPAWeight(self.c2, self.c2, 3, dtype=self.dtype, name=f"w{i + 1}")()
            w = jax.lax.conv_general_dilated(w, w2, (1, 1), [(2, 2)] * 2,
                                             dimension_numbers=("NCHW", "OIHW", "NCHW"))
        w = w.transpose(1, 0, 2, 3)  # (o, i, K, K)
        pad = self.k // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.transpose(2, 3, 1, 0).astype(self.dtype),
            (self.s, self.s), [(pad, pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = _bn(y, train, self.dtype, "bn")
        return jax.nn.silu(y) if self.act else y


class RepVGGBlockOREPA(nn.Module):
    """RepVGGBlock_OREPA (orepa.py:573): OREPA-3x3-RepVGG dense branch +
    plain 1x1 conv-BN + identity BN, summed, SiLU."""

    c2: int
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        w = _OREPAWeight(c1, self.c2, 3, repvgg_style=True, dtype=self.dtype, name="rbr_dense_w")()
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.transpose(2, 3, 1, 0).astype(self.dtype),
            (self.s, self.s), [(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = _bn(y, train, self.dtype, "rbr_dense_bn")
        y1 = _bare_conv(x, self.c2, 1, self.dtype, "rbr_1x1", s=self.s)
        out = out + _bn(y1, train, self.dtype, "rbr_1x1_bn")
        if c1 == self.c2 and self.s == 1:
            out = out + _bn(x, train, self.dtype, "rbr_identity")
        return jax.nn.silu(out)


class _OREPABottleneck(nn.Module):
    """Bottleneck_OREPA (block.py:1624): cv1 = Conv(1x1) or OREPA(3);
    cv2 = OREPA(3)."""

    c2: int
    k0: int = 3
    shortcut: bool = True
    repvgg: bool = False  # Bottleneck_REPVGGOREPA (block.py:1651)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cls = RepVGGBlockOREPA if self.repvgg else OREPA
        if self.k0 == 1:
            y = _conv(x, self.c2, 1, train, self.dtype, "cv1")
        else:
            y = cls(self.c2, dtype=self.dtype, name="cv1")(x, train)
        y = cls(self.c2, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class LAWDS(nn.Module):
    """Light adaptive-weight downsampling (block.py:1208): a 4-way grouped
    stride-2 conv whose four candidate outputs are blended per-pixel by a
    softmax over an avg-pool+1x1 attention map."""

    c2: int
    group: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        att = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1)] * 2)
        att = _conv(att, C, 1, train, self.dtype, "attention")
        h, w = H // 2, W // 2
        # rearrange 'bs ch (s1 h) (s2 w) -> bs ch h w (s1 s2)' (s1/s2 OUTER)
        att = att.reshape(B, 2, h, 2, w, C).transpose(0, 2, 4, 5, 1, 3).reshape(B, h, w, C, 4)
        att = jax.nn.softmax(att, axis=-1)
        y = _conv(x, C * 4, 3, train, self.dtype, "ds_conv", s=2, g=C // self.group)
        # '(s ch) h w -> ch h w s' (s OUTER in channel dim)
        y = y.reshape(B, h, w, 4, C).transpose(0, 1, 2, 4, 3)
        return (y * att).sum(-1)


class _SR(nn.Module):
    """Shuffle-RepVGG cell (block.py:1321): RepConv on the second half +
    2-group channel shuffle."""

    c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import RepConv

        half = x.shape[-1] // 2
        x2 = RepConv(self.c // 2, 3, 1, use_bn_branch=True, dtype=self.dtype, name="repconv")(
            x[..., half:], train)
        y = jnp.concatenate([x[..., :half], x2], -1)
        c = y.shape[-1]
        return y.reshape(*y.shape[:-1], 2, c // 2).transpose(0, 1, 2, 4, 3).reshape(*y.shape[:-1], c)


class RCSOSA(nn.Module):
    """RCS-OSA (block.py:1343, RCS-YOLO): RepConv stem, two chains of
    shuffle-RepVGG cells, one-shot aggregation of the three stages."""

    c2: int
    n: int = 1
    se: bool = False
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import RepConv, SEAttention
        from experiment_yolo_tpu.nn.tasks import make_divisible

        c1 = x.shape[-1]
        c_ = make_divisible(int(c1 * self.e), 8)
        n_ = self.n // 2
        x1 = RepConv(c_, 3, 1, use_bn_branch=True, dtype=self.dtype, name="conv1")(x, train)
        x2 = x1
        for i in range(n_):
            x2 = _SR(c_, dtype=self.dtype, name=f"sr1_{i}")(x2, train)
        x3 = x2
        for i in range(n_):
            x3 = _SR(c_, dtype=self.dtype, name=f"sr2_{i}")(x3, train)
        y = jnp.concatenate([x1, x2, x3], -1)
        y = RepConv(self.c2, 3, 1, use_bn_branch=True, dtype=self.dtype, name="conv3")(y, train)
        if self.se:
            y = SEAttention(dtype=self.dtype, name="se")(y, train)
        return y


class FocalModulation(nn.Module):
    """Focal modulation (block.py:1553, FocalNets): query + hierarchically
    gated depthwise context aggregation + global gate, multiplicative
    modulation, 1x1 projection."""

    focal_window: int = 3
    focal_level: int = 2
    focal_factor: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        y = _bare_conv(x, 2 * C + self.focal_level + 1, 1, self.dtype, "f_linear", bias=True)
        q, ctx, gates = y[..., :C], y[..., C:2 * C], y[..., 2 * C:]
        ctx_all = 0.0
        for l in range(self.focal_level):
            k = self.focal_factor * l + self.focal_window
            ctx = jax.nn.gelu(_bare_conv(ctx, C, k, self.dtype, f"focal{l}", g=C), approximate=False)
            ctx_all = ctx_all + ctx * gates[..., l:l + 1]
        ctx_global = jax.nn.gelu(ctx.mean(axis=(1, 2), keepdims=True), approximate=False)
        ctx_all = ctx_all + ctx_global * gates[..., self.focal_level:]
        out = q * _bare_conv(ctx_all, C, 1, self.dtype, "h", bias=True)
        return _bare_conv(out, C, 1, self.dtype, "proj", bias=True)


class _DualConv(nn.Module):
    """DualConv (block.py:3552): grouped 3x3 + pointwise, summed."""

    c2: int
    g: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return (_bare_conv(x, self.c2, 3, self.dtype, "gc", g=self.g)
                + _bare_conv(x, self.c2, 1, self.dtype, "pwc"))


class CSPEDLAN(nn.Module):
    """CSP_EDLAN (block.py:3583): C2f-style container over stacks of two
    DualConvs."""

    c2: int
    n: int = 1
    g: int = 4
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            z = _DualConv(c, self.g, dtype=self.dtype, name=f"m{i}_0")(ys[-1], train)
            z = _DualConv(c, self.g, dtype=self.dtype, name=f"m{i}_1")(z, train)
            ys.append(z)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class FocusFeature(nn.Module):
    """FocusFeature (block.py:5072): align three pyramid levels (upsample /
    identity / ADown), concat, add a bank of large-kernel dw convs, 1x1 mix,
    residual."""

    inc: Tuple[int, int, int]
    kernel_sizes: Tuple[int, ...] = (5, 7, 9, 11)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import ADown

        x1, x2, x3 = xs
        hidc = int(self.inc[1] * self.e)
        b, h, w, _ = x1.shape
        x1 = jax.image.resize(x1, (b, h * 2, w * 2, x1.shape[-1]), "nearest")
        x1 = _conv(x1, hidc, 1, train, self.dtype, "conv1")
        if self.e != 1:
            x2 = _conv(x2, hidc, 1, train, self.dtype, "conv2")
        x3 = ADown(hidc, dtype=self.dtype, name="conv3")(x3, train)
        x = jnp.concatenate([x1, x2, x3], -1)
        feat = x
        for i, k in enumerate(self.kernel_sizes):
            feat = feat + _bare_conv(x, hidc * 3, k, self.dtype, f"dw{i}", g=hidc * 3, bias=True)
        feat = _conv(feat, hidc * 3, 1, train, self.dtype, "pw_conv")
        return x + feat


class CSMHSA(nn.Module):
    """Cross-scale multi-head self-attention (block.py:5143): queries from
    the upsampled higher-level map attend over the lower-level map."""

    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x_high, x_low = xs
        B, H, W, C = x_low.shape
        hb, hh, hw_, _ = x_high.shape
        q = jax.image.resize(x_high, (hb, hh * 2, hw_ * 2, x_high.shape[-1]), "nearest")
        q = _bare_conv(q, C, 1, self.dtype, "query", bias=True)
        k = _bare_conv(x_low, C, 1, self.dtype, "key", bias=True)
        v = _bare_conv(x_low, C, 1, self.dtype, "value", bias=True)
        hd = C // self.heads
        qf = q.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)
        kf = k.reshape(B, H * W, self.heads, hd).transpose(0, 2, 1, 3)
        vf = v.reshape(B, H * W, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(qf @ kf.transpose(0, 1, 3, 2), axis=-1)
        out = (attn @ vf).transpose(0, 2, 1, 3).reshape(B, q.shape[1], q.shape[2], C)
        return out


class _Cut(nn.Module):
    """Cut (block.py:5172): 2x2 pixel-unshuffle + 1x1 fusion + BN."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        parts = [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]]
        y = jnp.concatenate(parts, -1)
        y = _bare_conv(y, self.c2, 1, self.dtype, "conv_fusion", bias=True)
        return _bn(y, train, self.dtype, "batch_norm")


class SRFD(nn.Module):
    """Shallow robust feature downsampling (block.py:5188): stem that takes
    RGB to C at stride 4 by fusing conv, cut (pixel-unshuffle) and max-pool
    paths at each of two downsampling steps."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c14, c12 = self.c2 // 4, self.c2 // 2
        x = _bare_conv(x, c14, 7, self.dtype, "conv_init", bias=True)
        c = _Cut(c12, dtype=self.dtype, name="cut_c")(x, train)
        y = _bare_conv(x, c12, 3, self.dtype, "conv_1", g=c14, bias=True)
        y = _bare_conv(y, c12, 3, self.dtype, "conv_x1", s=2, g=c12, bias=True)
        y = _bn(y, train, self.dtype, "batch_norm_x1")
        y = _bare_conv(jnp.concatenate([y, c], -1), c12, 1, self.dtype, "fusion1", bias=True)
        r = _Cut(self.c2, dtype=self.dtype, name="cut_r")(y, train)
        y = _bare_conv(y, self.c2, 3, self.dtype, "conv_2", g=c12, bias=True)
        m = nn.max_pool(y, (2, 2), strides=(2, 2))
        m = _bn(m, train, self.dtype, "batch_norm_m")
        y = _bare_conv(y, self.c2, 3, self.dtype, "conv_x2", s=2, g=self.c2, bias=True)
        y = _bn(y, train, self.dtype, "batch_norm_x2")
        y = jnp.concatenate([y, r, m], -1)
        return _bare_conv(y, self.c2, 1, self.dtype, "fusion2", bias=True)


class DRFD(nn.Module):
    """Deep robust feature downsampling (block.py:5247): cut + conv + max
    paths fused into one stride-2 step."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c = _Cut(self.c2, dtype=self.dtype, name="cut_c")(x, train)
        y = _bare_conv(x, self.c2, 3, self.dtype, "conv", g=c1, bias=True)
        m = nn.max_pool(y, (2, 2), strides=(2, 2))
        m = _bn(m, train, self.dtype, "batch_norm_m")
        y = _bare_conv(y, self.c2, 3, self.dtype, "conv_x", s=2, g=self.c2, bias=True)
        y = _bn(jax.nn.gelu(y, approximate=False), train, self.dtype, "batch_norm_x")
        y = jnp.concatenate([c, y, m], -1)
        return _bare_conv(y, self.c2, 1, self.dtype, "fusion", bias=True)


class CFC_CRB(nn.Module):
    """Context feature calibration (block.py:5337): pyramid-pooled key/value
    attention over a channel-reduced map + tanh-gated local attention,
    residual."""

    grids: Tuple[int, ...] = (6, 3, 2, 1)
    dtype: Dtype = jnp.float32

    def _psp(self, x):
        from experiment_yolo_tpu.nn.extra_modules import _adaptive_avg_pool

        b, h, w, c = x.shape
        outs = []
        for g in self.grids:
            p = _adaptive_avg_pool(x, g, g)
            outs.append(p.reshape(b, g * g, c))
        return jnp.concatenate(outs, 1)  # (b, S, c)

    @nn.compact
    def __call__(self, x, train: bool = False):
        inter = x.shape[-1] // 2
        x = _conv(x, inter, 3, train, self.dtype, "reduce_channel")
        b, h, w, c = x.shape
        q = _bare_conv(x, 32, 1, self.dtype, "query_conv", bias=True).reshape(b, h * w, 32)
        kpsp = self._psp(x)
        k = nn.Dense(32, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="key_conv")(kpsp)
        v = nn.Dense(inter, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="value_conv")(self._psp(x))
        sim = jax.nn.softmax(q @ k.transpose(0, 2, 1), axis=-1)  # (b, N, S)
        ctx = (sim @ v).reshape(b, h, w, inter)
        # LocalAttenModule (block.py:5315): conv1x1 -> 3x3(zero-init) -> tanh gate
        la = _conv(ctx, inter // 8, 1, train, self.dtype, "la_conv1")
        la = nn.Conv(inter, (3, 3), padding=[(1, 1)] * 2, use_bias=False, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, param_dtype=jnp.float32, name="la_conv2")(la)
        ctx = ctx * jnp.tanh(la) + ctx
        return x + ctx


class SFC_G2(nn.Module):
    """Spatial feature calibration (block.py:5393): aligned bilinear upsample
    of the semantic map, learned per-group flow offsets for both maps
    (grid_sample), tanh attention blend."""

    inc: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import _bilinear_zeros
        from experiment_yolo_tpu.nn.heads_extra import _resize_align_corners

        cp, sp = xs
        n, H, W, _ = cp.shape
        hidc = self.inc[0]
        groups = 2
        sp = _conv(sp, hidc, 3, train, self.dtype, "conv_32")
        sp = _resize_align_corners(sp, H, W)
        cp = _conv(cp, hidc, 3, train, self.dtype, "conv_8")
        off = _conv(jnp.concatenate([cp, sp], -1), 64, 1, train, self.dtype, "offset_conv")
        off = nn.Conv(groups * 4 + 2, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                      kernel_init=nn.initializers.zeros, dtype=self.dtype,
                      param_dtype=jnp.float32, name="offset_out")(off)
        cg = hidc // groups
        spg = sp.reshape(n, H, W, groups, cg).transpose(0, 3, 1, 2, 4).reshape(n * groups, H, W, cg)
        cpg = cp.reshape(n, H, W, groups, cg).transpose(0, 3, 1, 2, 4).reshape(n * groups, H, W, cg)
        # offsets: per-group (dx, dy) flows, normalized by (W, H)
        ol = off[..., :groups * 2].reshape(n, H, W, groups, 2).transpose(0, 3, 1, 2, 4).reshape(n * groups, H, W, 2)
        oh = off[..., groups * 2:groups * 4].reshape(n, H, W, groups, 2).transpose(0, 3, 1, 2, 4).reshape(n * groups, H, W, 2)
        gy, gx = jnp.meshgrid(jnp.linspace(-1.0, 1.0, H), jnp.linspace(-1.0, 1.0, W), indexing="ij")

        def sample(img, o):
            px = (gx[None] + o[..., 0] / W + 1.0) * 0.5 * (W - 1.0)
            py = (gy[None] + o[..., 1] / H + 1.0) * 0.5 * (H - 1.0)
            return _bilinear_zeros(img, py.reshape(n * groups, -1), px.reshape(n * groups, -1)).reshape(n * groups, H, W, cg)

        cp2 = sample(cpg, ol).reshape(n, groups, H, W, cg).transpose(0, 2, 3, 1, 4).reshape(n, H, W, hidc)
        sp2 = sample(spg, oh).reshape(n, groups, H, W, cg).transpose(0, 2, 3, 1, 4).reshape(n, H, W, hidc)
        att = 1.0 + jnp.tanh(off[..., groups * 4:])
        return sp2 * att[..., 0:1] + cp2 * att[..., 1:2]


class _PixelAttentionCGA(nn.Module):
    """PixelAttention_CGA (block.py:5494): interleave x with the combined
    attention map channel-wise, 7x7 dw conv (reflect pad), sigmoid."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pattn1):
        B, H, W, C = x.shape
        x2 = jnp.stack([x, pattn1], -1).reshape(B, H, W, 2 * C)
        x2 = jnp.pad(x2, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = nn.Conv(C, (7, 7), padding="VALID", feature_group_count=C, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, name="pa2")(x2)
        return y


class CGAFusion(nn.Module):
    """CGAFusion (block.py:5504, DEA-Net): channel + spatial attention fused
    into a pixel gate blending the two inputs."""

    reduction: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x, y = xs
        C = x.shape[-1]
        initial = x + y
        # channel attention
        gap = initial.mean(axis=(1, 2), keepdims=True)
        ca = _bare_conv(gap, C // self.reduction, 1, self.dtype, "ca_fc1", bias=True)
        ca = _bare_conv(jax.nn.relu(ca), C, 1, self.dtype, "ca_fc2", bias=True)
        # spatial attention (7x7 reflect conv on avg/max)
        s = jnp.concatenate([initial.mean(-1, keepdims=True), initial.max(-1, keepdims=True)], -1)
        s = jnp.pad(s, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        sa = nn.Conv(1, (7, 7), padding="VALID", use_bias=True, dtype=self.dtype,
                     param_dtype=jnp.float32, name="sa")(s)
        pattn1 = sa + ca
        pattn2 = jax.nn.sigmoid(_PixelAttentionCGA(dtype=self.dtype, name="pa")(initial, pattn1))
        out = initial + pattn2 * x + (1.0 - pattn2) * y
        return _bare_conv(out, C, 1, self.dtype, "conv", bias=True)


class CAFM(nn.Module):
    """Convolution-and-attention fusion module (block.py:5525): a channel
    transposed-attention branch plus a dynamic local conv branch whose 3x3
    kernels come from the qkv features. The reference uses Conv3d with a
    singleton depth — only the middle depth slice touches data; full-depth
    weights are kept for state-dict parity and the middle slice computes."""

    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        nh = self.num_heads
        temp = self.param("temperature", nn.initializers.ones, (nh, 1, 1), jnp.float32)
        qkv = _bare_conv(x, 3 * C, 1, self.dtype, "qkv")
        w3 = self.param("qkv_dwconv", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                        (3, 3, 3, 1, 3 * C), jnp.float32)  # (d, kh, kw, 1, 3C) dw conv3d
        qkv = jax.lax.conv_general_dilated(
            qkv.astype(self.dtype), w3[1].astype(self.dtype), (1, 1), [(1, 1)] * 2,
            feature_group_count=3 * C, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # f_all: the reference reshapes NCHW (B,3C,H,W) -> (B, HW, 3nh, C/nh)
        qkv_nchw = qkv.transpose(0, 3, 1, 2)
        f_all = qkv_nchw.reshape(B, H * W, 3 * nh, C // nh)
        f_all = f_all.transpose(0, 2, 1, 3)  # (B, 3nh, HW, C/nh)
        fw = self.param("fc", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                        (9, 3 * nh), jnp.float32)
        fb = self.param("fc_bias", nn.initializers.zeros, (9,), jnp.float32)
        f_all = jnp.einsum("bchd,oc->bohd", f_all, fw.astype(f_all.dtype)) + fb.astype(f_all.dtype)[None, :, None, None]
        # local conv branch: (B, 9, HW, C/nh) -> permute(0,3,1,2) -> (B, 9C/nh, H, W)
        f_conv = f_all.transpose(0, 3, 1, 2).reshape(B, 9 * C // nh, H, W)
        dcw = self.param("dep_conv", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                         (3, 3, 3, 9, C), jnp.float32)  # (d, kh, kw, in/g=9, C)
        dcb = self.param("dep_conv_bias", nn.initializers.zeros, (C,), jnp.float32)
        out_conv = jax.lax.conv_general_dilated(
            f_conv.transpose(0, 2, 3, 1).astype(self.dtype), dcw[1].astype(self.dtype), (1, 1),
            [(1, 1)] * 2, feature_group_count=C // nh,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + dcb.astype(self.dtype)
        # global channel attention (NCHW channel-major head split)
        q, k, v = qkv_nchw[:, :C], qkv_nchw[:, C:2 * C], qkv_nchw[:, 2 * C:]
        qf = q.reshape(B, nh, C // nh, H * W)
        kf = k.reshape(B, nh, C // nh, H * W)
        vf = v.reshape(B, nh, C // nh, H * W)
        qf = qf / (jnp.linalg.norm(qf, axis=-1, keepdims=True) + 1e-12)
        kf = kf / (jnp.linalg.norm(kf, axis=-1, keepdims=True) + 1e-12)
        attn = jax.nn.softmax(qf @ kf.transpose(0, 1, 3, 2) * temp.astype(qf.dtype), axis=-1)
        out = (attn @ vf).reshape(B, C, H, W).transpose(0, 2, 3, 1)
        out = _bare_conv(out, C, 1, self.dtype, "project_out")
        return out + out_conv


class CAFMFusion(nn.Module):
    """CAFMFusion (block.py:5579): CAFM on the sum drives a pixel gate."""

    heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x, y = xs
        C = x.shape[-1]
        initial = x + y
        pattn1 = CAFM(self.heads, dtype=self.dtype, name="cfam")(initial, train)
        pattn2 = jax.nn.sigmoid(_PixelAttentionCGA(dtype=self.dtype, name="pa")(initial, pattn1))
        out = initial + pattn2 * x + (1.0 - pattn2) * y
        return _bare_conv(out, C, 1, self.dtype, "conv", bias=True)


class RGCSPELAN(nn.Module):
    """Rep-Ghost CSP-ELAN (block.py:5600): C2f layout with a RepConv entry,
    cheap 3x3 chain and a 1x1 tail branch."""

    c2: int
    n: int = 1
    scale: float = 0.5
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import RepConv

        c = int(self.c2 * self.e)
        mid = int(c * self.scale)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        ys[-1] = RepConv(mid, 3, 1, dtype=self.dtype, name="cv3")(ys[-1], train)
        for i in range(self.n - 1):
            ys.append(_conv(ys[-1], mid, 3, train, self.dtype, f"m{i}"))
        ys.append(_conv(ys[-1], mid, 1, train, self.dtype, "cv4"))
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class ConvolutionalGLU(nn.Module):
    """TransNeXt convolutional GLU (block.py:5634): 1x1 to 2*hidden, dw-3x3
    GELU gate, 1x1 back, residual."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        hidden = int(2 * C / 3)
        y = _bare_conv(x, hidden * 2, 1, self.dtype, "fc1", bias=True)
        a, v = y[..., :hidden], y[..., hidden:]
        a = jax.nn.gelu(_bare_conv(a, hidden, 3, self.dtype, "dwconv", g=hidden, bias=True), approximate=False)
        return x + _bare_conv(a * v, C, 1, self.dtype, "fc2", bias=True)


class FasterBlockCGLU(nn.Module):
    """Faster_Block_CGLU (block.py:5665): partial-conv mixing + CGLU MLP."""

    c2: int
    n_div: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dc = self.c2 // self.n_div
        x1 = _bare_conv(x[..., :dc], dc, 3, self.dtype, "pconv")
        mixed = jnp.concatenate([x1, x[..., dc:]], -1)
        # CGLU carries its own residual: out = x + (mixed + glu_inner(mixed))
        return x + ConvolutionalGLU(dtype=self.dtype, name="mlp")(mixed, train)


class _LocalGlobalAttention(nn.Module):
    """LocalGlobalAttention (hcfnet.py:22): patch-mean MLP attention with a
    learned prompt mask and top-down transform, upsampled back."""

    c2: int
    patch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H0, W0, C = x.shape
        P = self.patch
        # tiny-map guard (stride-calibration dry runs): pad up to one patch
        if H0 < P or W0 < P:
            x = jnp.pad(x, ((0, 0), (0, max(0, P - H0)), (0, max(0, P - W0)), (0, 0)))
        B, H, W, _ = x.shape
        hp, wp = H // P, W // P
        patches = x[:, :hp * P, :wp * P].reshape(B, hp, P, wp, P, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(B, hp * wp, P * P, C).mean(-1)  # (B, N, P*P)
        y = nn.Dense(self.c2 // 2, dtype=self.dtype, param_dtype=jnp.float32, name="mlp1")(patches)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(self.c2, dtype=self.dtype, param_dtype=jnp.float32, name="mlp2")(y)
        att = jax.nn.softmax(y, axis=-1)
        local = y * att
        prompt = self.param("prompt", nn.initializers.normal(1.0), (self.c2,), jnp.float32)
        tdt = self.param("top_down_transform", lambda *_: jnp.eye(self.c2), (self.c2, self.c2))
        # grad-safe normalize (norm has an unbounded gradient at 0)
        ln = jax.lax.rsqrt((local * local).sum(-1, keepdims=True) + 1e-12)
        pn = jax.lax.rsqrt((prompt * prompt).sum() + 1e-12)
        cos = (local * ln) @ (prompt * pn)[:, None].astype(local.dtype)
        local = local * jnp.clip(cos, 0, 1)
        local = local @ tdt.astype(local.dtype)
        local = local.reshape(B, hp, wp, self.c2)
        local = jax.image.resize(local, (B, H, W, self.c2), "bilinear")[:, :H0, :W0]
        return _bare_conv(local, self.c2, 1, self.dtype, "conv", bias=True)


class PPA(nn.Module):
    """Parallelized patch-aware attention (hcfnet.py:84): skip 1x1 + three
    stacked 3x3s + patch attentions at 2 and 4, ECA + spatial gates, BN+SiLU."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = _conv(x, self.c2, 1, train, self.dtype, "skip", act=False)
        lga2 = _LocalGlobalAttention(self.c2, 2, dtype=self.dtype, name="lga2")(skip, train)
        lga4 = _LocalGlobalAttention(self.c2, 4, dtype=self.dtype, name="lga4")(skip, train)
        x1 = _conv(x, self.c2, 3, train, self.dtype, "c1")
        x2 = _conv(x1, self.c2, 3, train, self.dtype, "c2")
        x3 = _conv(x2, self.c2, 3, train, self.dtype, "c3")
        y = x1 + x2 + x3 + skip + lga2 + lga4
        # ECA (hcfnet.py:64)
        c = y.shape[-1]
        t = int(abs((math.log2(c) + 1) / 2))
        kk = t if t % 2 else t + 1
        s = y.mean(axis=(1, 2))[:, :, None, None]  # (b, c, 1, 1) — channel as H
        w = self.param("eca_conv", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                       (kk, 1, 1, 1), jnp.float32)
        s = jax.lax.conv_general_dilated(s.astype(self.dtype), w.astype(self.dtype), (1, 1),
                                         [(kk // 2, kk // 2), (0, 0)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y * jax.nn.sigmoid(s[:, :, 0, 0])[:, None, None, :]
        # spatial attention (hcfnet.py:9)
        sp = jnp.concatenate([y.mean(-1, keepdims=True), y.max(-1, keepdims=True)], -1)
        sp = jax.nn.sigmoid(_bare_conv(sp, 1, 7, self.dtype, "sa", bias=True))
        y = y * sp
        y = _bn(y, train, self.dtype, "bn1")
        return jax.nn.silu(y)


class DASI(nn.Module):
    """DASI (hcfnet.py:123): three-level bag fusion — sigmoid(mid) gates
    low vs high per quarter-channel chunk, 1x1 tail + BN + SiLU."""

    c2: int
    inc: Tuple[int, int, int] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.nn.heads_extra import _resize_align_corners

        x_low, x, x_high = xs
        B, H, W, _ = x.shape
        x_high = nn.Conv(self.c2, (3, 3), strides=(2, 2), kernel_dilation=(2, 2),
                         padding=[(2, 2)] * 2, use_bias=True, dtype=self.dtype,
                         param_dtype=jnp.float32, name="skips_3")(x_high)
        x_low = _bare_conv(x_low, self.c2, 1, self.dtype, "skips_2", bias=True)
        x_low = _resize_align_corners(x_low, H, W)
        x = _bare_conv(x, self.c2, 1, self.dtype, "skips", bias=True)
        # dead 1x1 conv (hcfnet.py:127): only used in the reference's
        # None-input branches, kept for state-dict parity
        self.param("conv_kernel", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                   (1, 1, self.c2 // 2, self.c2 // 4), jnp.float32)
        self.param("conv_bias", nn.initializers.zeros, (self.c2 // 4,), jnp.float32)
        skip = x
        q = self.c2 // 4
        outs = []
        for i in range(4):
            lo = x_low[..., i * q:(i + 1) * q]
            hi = x_high[..., i * q:(i + 1) * q]
            mid = x[..., i * q:(i + 1) * q]
            gate = jax.nn.sigmoid(mid)
            outs.append(gate * lo + (1.0 - gate) * hi)
        y = jnp.concatenate(outs, -1)
        y = _bare_conv(y, self.c2, 1, self.dtype, "tail_conv", bias=True) + skip
        y = _bn(y, train, self.dtype, "bns")
        return jax.nn.silu(y)


class FrequencySelection(nn.Module):
    """FrequencySelection (fadc.py:123, lp_type='freq'): split the feature
    into FFT ring bands (center crops of the shifted spectrum at 1/k) and
    re-weight each band by a zero-init 3x3 conv gate (2*sigmoid), plus a
    gated low-frequency remainder."""

    k_list: Tuple[int, ...] = (3, 5, 7, 9)
    dtype: Dtype = jnp.float32

    @staticmethod
    def _lp_operator(n: int, freq: int):
        """Real/imag parts of the 1-D low-pass circulant IDFT.diag(box).DFT
        for a centered spectral box of width n/freq (numpy, trace-time)."""
        import numpy as np

        F = np.fft.fft(np.eye(n), norm="ortho", axis=0)
        Fi = np.fft.ifft(np.eye(n), norm="ortho", axis=0)
        y0, y1 = round(n / 2 - n / (2 * freq)), round(n / 2 + n / (2 * freq))
        ms = np.zeros(n)
        ms[y0:y1] = 1.0
        m = np.fft.ifftshift(ms)
        A = Fi @ np.diag(m) @ F
        return A.real.astype(np.float32), A.imag.astype(np.float32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        gates = [
            nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, use_bias=True,
                    kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"freq_weight_conv_{i}")
            for i in range(len(self.k_list) + 1)
        ]
        # FFT band split as dense DFT matmuls: low = Re(A_h X A_w^T) — two
        # real matmuls per axis, which maps onto the MXU (and avoids the
        # FFT custom call, which the TPU relay doesn't implement)
        pre = x
        out = 0.0
        xf = x.astype(jnp.float32)
        for i, freq in enumerate(self.k_list):
            ahr, ahi = self._lp_operator(h, freq)
            awr, awi = self._lp_operator(w, freq)
            yr = jnp.einsum("ij,bjwc->biwc", jnp.asarray(ahr), xf)
            yi = jnp.einsum("ij,bjwc->biwc", jnp.asarray(ahi), xf)
            low = (jnp.einsum("biwc,jw->bijc", yr, jnp.asarray(awr))
                   - jnp.einsum("biwc,jw->bijc", yi, jnp.asarray(awi))).astype(x.dtype)
            high = pre - low
            pre = low
            out = out + high * (jax.nn.sigmoid(gates[i](x)) * 2.0)
        out = out + pre * (jax.nn.sigmoid(gates[-1](x)) * 2.0)
        return out


class AdaptiveDilatedConv(nn.Module):
    """FADC AdaptiveDilatedConv (fadc.py:328, default flags): frequency
    selection on the input, a zero-init 1-channel offset conv whose ReLU'd
    scalar scales the fixed 3x3 tap lattice (adaptive dilation), a zero-init
    sigmoid mask, and a modulated deformable conv."""

    c2: int
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.ops.dcnv3 import dcnv2_core

        c1 = x.shape[-1]
        K = self.k * self.k
        x = FrequencySelection(dtype=self.dtype, name="FS")(x, train)
        off = nn.Conv(1, (self.k, self.k), padding=[(self.k // 2, self.k // 2)] * 2,
                      use_bias=True, kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv_offset")(x)
        off = jax.nn.relu(off)
        lattice = jnp.asarray([-1, -1, -1, 0, -1, 1, 0, -1, 0, 0, 0, 1, 1, -1, 1, 0, 1, 1],
                              jnp.float32)  # (dy, dx) per tap (fadc.py:458)
        offset = off * lattice[None, None, None, :]
        mask = jax.nn.sigmoid(
            nn.Conv(K, (self.k, self.k), padding=[(self.k // 2, self.k // 2)] * 2,
                    use_bias=True, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_mask")(x))
        n = c1 * K
        std = 1.0 / (n**0.5)
        weight = self.param("weight", nn.initializers.uniform(scale=2 * std),
                            (self.k, self.k, c1, self.c2), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32)
        return dcnv2_core(x.astype(self.dtype), offset.astype(jnp.float32), mask.astype(self.dtype),
                          weight.astype(self.dtype), bias.astype(self.dtype), pad=self.k // 2)


class ParConv(nn.Module):
    """ParConv (block.py:2698, ParC-Net): circular depthwise global convs —
    kernel (H,1) on the first channel half, (1,W) on the second — with
    positional embeddings, BN + SiLU. fmapsize is the static map size."""

    fmapsize: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        half = c // 2
        gh, gw = self.fmapsize

        def parc(y, axis, gk, name):
            dim = y.shape[-1]
            n = y.shape[axis]
            if axis == 1:
                pe = self.param(f"{name}_pe", nn.initializers.normal(0.02), (gk, 1, dim), jnp.float32)
                kshape = (gk, 1)
            else:
                pe = self.param(f"{name}_pe", nn.initializers.normal(0.02), (1, gk, dim), jnp.float32)
                kshape = (1, gk)
            if n != gk:  # off-size maps: interpolate the positional embedding
                tgt = (n, 1, dim) if axis == 1 else (1, n, dim)
                pe = jax.image.resize(pe, tgt, "linear")
            y = y + jnp.broadcast_to(pe, y.shape[1:]).astype(y.dtype)
            # circular tiling so the gk-long kernel wraps over the n-long axis
            need = n + gk - 1
            reps = -(-need // n)
            tiled = jnp.concatenate([y] * reps, axis=axis)
            y = tiled[:, :need] if axis == 1 else tiled[:, :, :need]
            return nn.Conv(dim, kshape, padding="VALID", feature_group_count=dim, use_bias=True,
                           dtype=self.dtype, param_dtype=jnp.float32, name=f"{name}_conv")(y)

        yh = parc(x[..., :half], 1, gh, "parc_H")
        yw = parc(x[..., half:], 2, gw, "parc_W")
        y = _bn(jnp.concatenate([yh, yw], -1), train, self.dtype, "bn")
        return jax.nn.silu(y)


class _ParCBottleneck(nn.Module):
    """Bottleneck_ParC (block.py:2715): cv2 = ParConv when the hidden width
    equals c2 (always in the C2f/C3 containers, e=1.0)."""

    c2: int
    fmapsize: Any = None  # None -> the runtime map size
    k0: int = 3
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(x, self.c2, self.k0, train, self.dtype, "cv1")
        fs = tuple(self.fmapsize) if self.fmapsize else (x.shape[1], x.shape[2])
        y = ParConv(fs, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class PKIModule(nn.Module):
    """PKIModule (block.py:5000): 1x1 pre, summed poly-kernel dw bank, 1x1
    pw, CAA gate, multiplicative identity mix, 1x1 post."""

    c2: int
    kernel_sizes: Tuple[int, ...] = (3, 5, 7, 9, 11)
    caa_k: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.backbones import _PKICAA
        from experiment_yolo_tpu.nn.tasks import make_divisible

        hid = make_divisible(self.c2, 8)
        add_identity = x.shape[-1] == self.c2
        x = _conv(x, hid, 1, train, self.dtype, "pre_conv")
        y = x
        x = _bare_conv(x, hid, self.kernel_sizes[0], self.dtype, "dw0", g=hid, bias=True)
        acc = x
        for i, k in enumerate(self.kernel_sizes[1:]):
            acc = acc + _bare_conv(x, hid, k, self.dtype, f"dw{i + 1}", g=hid, bias=True)
        x = _conv(acc, hid, 1, train, self.dtype, "pw_conv")
        y = _PKICAA(self.caa_k, norm=True, dtype=self.dtype, name="caa")(y, train)
        if add_identity:
            x = x + x * y
        else:
            x = x * y
        return _conv(x, self.c2, 1, train, self.dtype, "post_conv")


class C1(nn.Module):
    """C1 (modules/block.py:174): 1x1 in, n 3x3 convs, residual."""

    c2: int
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(x, self.c2, 1, train, self.dtype, "cv1")
        z = y
        for i in range(self.n):
            z = _conv(z, self.c2, 3, train, self.dtype, f"m{i}")
        return z + y


class C2(nn.Module):
    """C2 (modules/block.py:189): split-channel CSP with n bottlenecks."""

    c2: int
    n: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.modules import Bottleneck

        c = self.c2 // 2
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            a = Bottleneck(c, shortcut=self.shortcut, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m{i}")(a, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], -1), train)


class _LDBottleneck(nn.Module):
    """Bottleneck_LDConv (modules/block.py:611): both convs are LDConv with
    num_param from k."""

    c2: int
    k: Tuple[int, int] = (1, 1)
    e: float = 0.5
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.modules import LDConv

        c_ = int(self.c2 * self.e)
        y = LDConv(c_, self.k[0], dtype=self.dtype, name="cv1")(x, train)
        y = LDConv(self.c2, self.k[1], dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y
