"""Whole-network backbones producing multi-scale feature lists.

Counterpart of the reference's ``nn/backbone/`` zoo (SURVEY §2.5). A
backbone node returns a LIST of pyramid features; heads select levels with
the ``Index`` module — our explicit replacement for the reference's
implicit `i+4` savelist index shifting (tasks.py:1043-1049):

    backbone:
      - [-1, 1, FasterNet, [t0]]   # 0 -> [P2, P3, P4, P5]
      - [0, 1, Index, [1]]         # 1 = P3
      ...

First entry: FasterNet (PConv partial-convolution network, arXiv:2303.03667
— reference nn/backbone/fasternet.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from experiment_yolo_tpu.nn.norm import BatchNorm as MemBatchNorm

Dtype = Any

# variant: (embed_dim, depths, act) — reference faster_cfg/*.yaml
FASTERNET_CFGS = {
    "t0": (40, (1, 2, 8, 2), "gelu"),
    "t1": (64, (1, 2, 8, 2), "gelu"),
    "t2": (96, (1, 2, 8, 2), "relu"),
    "s": (128, (1, 2, 13, 2), "relu"),
    "m": (144, (3, 4, 18, 3), "relu"),
    "l": (192, (3, 4, 18, 3), "relu"),
}


class Index(nn.Module):
    """Select one feature from a backbone's output list."""

    k: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return xs[self.k]


def _bn(x, train, dtype, name):
    return MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                        dtype=dtype, param_dtype=jnp.float32, name=name)(x)


class _PConvMLPBlock(nn.Module):
    """FasterNet block: partial 3x3 conv over dim/4 channels + 1x1 MLP with
    residual (fasternet.py:MLPBlock + Partial_conv3, split_cat form)."""

    dim: int
    n_div: int = 4
    mlp_ratio: float = 2.0
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dc = self.dim // self.n_div
        x1, x2 = x[..., :dc], x[..., dc:]
        x1 = nn.Conv(dc, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                     dtype=self.dtype, param_dtype=jnp.float32, name="pconv")(x1)
        mixed = jnp.concatenate([x1, x2], -1)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="mlp1")(mixed)
        y = _bn(y, train, self.dtype, "mlp_bn")
        y = jax.nn.gelu(y) if self.act == "gelu" else jax.nn.relu(y)
        y = nn.Conv(self.dim, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="mlp2")(y)
        return x + y


CONVNEXTV2_CFGS = {
    "atto": ((40, 80, 160, 320), (2, 2, 6, 2)),
    "femto": ((48, 96, 192, 384), (2, 2, 6, 2)),
    "pico": ((64, 128, 256, 512), (2, 2, 6, 2)),
    "nano": ((80, 160, 320, 640), (2, 2, 8, 2)),
    "tiny": ((96, 192, 384, 768), (3, 3, 9, 3)),
    "base": ((128, 256, 512, 1024), (3, 3, 27, 3)),
    "large": ((192, 384, 768, 1536), (3, 3, 27, 3)),
    "huge": ((352, 704, 1408, 2816), (3, 3, 27, 3)),
}


class _GRN(nn.Module):
    """Global response normalization (the V2 addition, arXiv:2301.00808)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        gx = jnp.sqrt((x**2).sum(axis=(1, 2), keepdims=True) + 1e-12)  # (B,1,1,C)
        nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class _ConvNeXtV2Block(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dwconv")(x)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="pwconv1")(y)
        y = _GRN(4 * self.dim, name="grn")(jax.nn.gelu(y))
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="pwconv2")(y)
        return x + y


class ConvNeXtV2(nn.Module):
    """ConvNeXt V2 backbone (reference nn/backbone/convnextv2.py) ->
    [P2, P3, P4, P5]."""

    variant: str = "atto"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return CONVNEXTV2_CFGS[variant][0]

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths = CONVNEXTV2_CFGS[self.variant]
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype, param_dtype=jnp.float32, name="stem")(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="stem_norm")(x)
        outs = []
        for si, (dim, depth) in enumerate(zip(dims, depths)):
            if si > 0:
                x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name=f"down_norm{si}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype, param_dtype=jnp.float32, name=f"down{si}")(x)
            for bi in range(depth):
                x = _ConvNeXtV2Block(dim, dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# EfficientViT (reference nn/backbone/efficientViT.py — arXiv:2305.07027)
# ---------------------------------------------------------------------------

# variant: (embed_dims, depths, num_heads, window, kernels)
EFFICIENTVIT_CFGS = {
    "m0": ((64, 128, 192), (1, 2, 3), (4, 4, 4), 7, (7, 5, 3, 3)),
    "m1": ((128, 144, 192), (1, 2, 3), (2, 3, 3), 7, (7, 5, 3, 3)),
    "m2": ((128, 192, 224), (1, 2, 3), (4, 3, 2), 7, (7, 5, 3, 3)),
    "m3": ((128, 240, 320), (1, 2, 3), (4, 3, 4), 7, (5, 5, 5, 5)),
    "m4": ((128, 256, 384), (1, 2, 3), (4, 4, 4), 7, (7, 5, 3, 3)),
    "m5": ((192, 288, 384), (1, 3, 4), (3, 3, 4), 7, (7, 5, 3, 3)),
}


def _conv_bn(x, out, k, s, pad, train, dtype, name, groups=1, bn_init=1.0):
    """Conv2d_BN (efficientViT.py:19): conv no-bias + BN (scale init 0 for
    residual tails via bn_init)."""
    y = nn.Conv(out, (k, k), strides=(s, s), padding=[(pad, pad)] * 2, use_bias=False,
                feature_group_count=groups, dtype=dtype, param_dtype=jnp.float32, name=f"{name}_c")(x)
    return MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype,
                        param_dtype=jnp.float32, scale_init=nn.initializers.constant(bn_init),
                        name=f"{name}_bn")(y)


def _squeeze_excite(x, dim, train, dtype, name, rd_ratio=0.25):
    """timm SqueezeExcite: global-avg -> 1x1 reduce -> ReLU -> 1x1 expand ->
    sigmoid gate; rd = make_divisible(dim*ratio, 8, round_limit=0)."""
    rd = max(8, int(dim * rd_ratio + 4) // 8 * 8)
    s = x.mean(axis=(1, 2), keepdims=True)
    s = nn.Conv(rd, (1, 1), dtype=dtype, param_dtype=jnp.float32, name=f"{name}_fc1")(s)
    s = nn.Conv(dim, (1, 1), dtype=dtype, param_dtype=jnp.float32, name=f"{name}_fc2")(jax.nn.relu(s))
    return x * jax.nn.sigmoid(s)


class _CascadedGroupAttention(nn.Module):
    """Cascaded group attention over one window (efficientViT.py:93): heads
    read cascading chunk sums, q gets a per-head dwconv, attention carries a
    learned relative-position bias table indexed by static offsets."""

    dim: int
    key_dim: int
    num_heads: int
    window: int
    kernels: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # x (B', w, w, C)
        import itertools

        import numpy as np

        d = self.dim // self.num_heads  # attn_ratio*key_dim == dim/heads
        w = self.window
        points = list(itertools.product(range(w), range(w)))
        offsets, idxs = {}, []
        for p1 in points:
            for p2 in points:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                if off not in offsets:
                    offsets[off] = len(offsets)
                idxs.append(offsets[off])
        bias_idx = np.asarray(idxs, np.int32).reshape(len(points), len(points))
        biases = self.param("attention_biases", nn.initializers.zeros,
                            (self.num_heads, len(offsets)), jnp.float32)
        ab = biases[:, bias_idx]  # (nh, N, N)

        chunk = self.dim // self.num_heads
        feats_in = [x[..., i * chunk:(i + 1) * chunk] for i in range(self.num_heads)]
        feat = feats_in[0]
        outs = []
        scale = self.key_dim**-0.5
        for i in range(self.num_heads):
            if i > 0:
                feat = feat + feats_in[i]
            qkv = _conv_bn(feat, 2 * self.key_dim + d, 1, 1, 0, train, self.dtype, f"qkv{i}")
            q, k, v = (qkv[..., : self.key_dim], qkv[..., self.key_dim: 2 * self.key_dim],
                       qkv[..., 2 * self.key_dim:])
            ks = self.kernels[i]
            q = _conv_bn(q, self.key_dim, ks, 1, ks // 2, train, self.dtype, f"dw{i}", groups=self.key_dim)
            b = q.shape[0]
            qf = q.reshape(b, -1, self.key_dim)
            kf = k.reshape(b, -1, self.key_dim)
            vf = v.reshape(b, -1, d)
            attn = jax.nn.softmax(qf @ kf.transpose(0, 2, 1) * scale + ab[i].astype(qf.dtype), axis=-1)
            feat = (attn @ vf).reshape(b, w, w, d)
            outs.append(feat)
        y = jax.nn.relu(jnp.concatenate(outs, -1))
        return _conv_bn(y, self.dim, 1, 1, 0, train, self.dtype, "proj", bn_init=0.0)


class _EfficientViTBlock(nn.Module):
    """dw+FFN sandwich around windowed cascaded attention (efficientViT.py:238)."""

    dim: int
    key_dim: int
    num_heads: int
    window: int
    kernels: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    def _ffn(self, x, train, name):
        y = _conv_bn(x, self.dim * 2, 1, 1, 0, train, self.dtype, f"{name}_pw1")
        return x + _conv_bn(jax.nn.relu(y), self.dim, 1, 1, 0, train, self.dtype, f"{name}_pw2", bn_init=0.0)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + _conv_bn(x, self.dim, 3, 1, 1, train, self.dtype, "dw0", groups=self.dim, bn_init=0.0)
        x = self._ffn(x, train, "ffn0")
        # local window attention: pad to a window multiple, partition, attend
        B, H, W, C = x.shape
        w = self.window
        pad_b, pad_r = (w - H % w) % w, (w - W % w) % w
        y = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        pH, pW = H + pad_b, W + pad_r
        nH, nW = pH // w, pW // w
        y = y.reshape(B, nH, w, nW, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(B * nH * nW, w, w, C)
        y = _CascadedGroupAttention(self.dim, self.key_dim, self.num_heads, w,
                                    self.kernels, dtype=self.dtype, name="attn")(y, train)
        y = y.reshape(B, nH, nW, w, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
        x = x + y[:, :H, :W]
        x = x + _conv_bn(x, self.dim, 3, 1, 1, train, self.dtype, "dw1", groups=self.dim, bn_init=0.0)
        return self._ffn(x, train, "ffn1")


class EfficientViT(nn.Module):
    """EfficientViT backbone (reference nn/backbone/efficientViT.py:273,
    registered as EfficientViT_M0..M5 in tasks.py:940) -> [P3, P4, P5]."""

    variant: str = "m0"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return EFFICIENTVIT_CFGS[variant][0]

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths, heads, window, kernels = EFFICIENTVIT_CFGS[self.variant]
        key_dim = 16
        # patch embed: /8 (3 stride-2 convs + 1 stride-1, ReLU between)
        e = dims[0]
        x = jax.nn.relu(_conv_bn(x, e // 8, 3, 2, 1, train, self.dtype, "pe0"))
        x = jax.nn.relu(_conv_bn(x, e // 4, 3, 2, 1, train, self.dtype, "pe1"))
        x = jax.nn.relu(_conv_bn(x, e // 2, 3, 2, 1, train, self.dtype, "pe2"))
        x = _conv_bn(x, e, 3, 1, 1, train, self.dtype, "pe3")
        outs = []
        for si, (dim, depth, nh) in enumerate(zip(dims, depths, heads)):
            if si > 0:
                # subsample bridge: dw+FFN residuals, PatchMerging, dw+FFN
                prev = dims[si - 1]
                x = x + _conv_bn(x, prev, 3, 1, 1, train, self.dtype, f"ds{si}_dw_a", groups=prev)
                y = _conv_bn(x, prev * 2, 1, 1, 0, train, self.dtype, f"ds{si}_ffn_a1")
                x = x + _conv_bn(jax.nn.relu(y), prev, 1, 1, 0, train, self.dtype, f"ds{si}_ffn_a2", bn_init=0.0)
                # PatchMerging: 1x1 expand -> dw3x3 s2 -> SE -> 1x1 project
                hid = prev * 4
                y = jax.nn.relu(_conv_bn(x, hid, 1, 1, 0, train, self.dtype, f"ds{si}_pm1"))
                y = jax.nn.relu(_conv_bn(y, hid, 3, 2, 1, train, self.dtype, f"ds{si}_pm2", groups=hid))
                y = _squeeze_excite(y, hid, train, self.dtype, f"ds{si}_se")
                x = _conv_bn(y, dim, 1, 1, 0, train, self.dtype, f"ds{si}_pm3")
                x = x + _conv_bn(x, dim, 3, 1, 1, train, self.dtype, f"ds{si}_dw_b", groups=dim)
                y = _conv_bn(x, dim * 2, 1, 1, 0, train, self.dtype, f"ds{si}_ffn_b1")
                x = x + _conv_bn(jax.nn.relu(y), dim, 1, 1, 0, train, self.dtype, f"ds{si}_ffn_b2", bn_init=0.0)
            for bi in range(depth):
                x = _EfficientViTBlock(dim, key_dim, nh, window, kernels,
                                       dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# RepViT (reference nn/backbone/repvit.py — arXiv:2307.09283)
# ---------------------------------------------------------------------------

# variant: ((stage_channels, n_blocks), ...) — expanded to the reference's
# per-row cfgs: kernel 3, expand 2x everywhere; stages >0 start with a
# stride-2 downsample row; within a stage SE alternates 1,0,... with the
# last row forced 0 (verified row-for-row against repvit.py:260-456).
REPVIT_CFGS = {
    "m0_9": ((48, 3), (96, 4), (192, 16), (384, 3)),
    "m1_0": ((56, 3), (112, 4), (224, 16), (448, 3)),
    "m1_1": ((64, 3), (128, 4), (256, 14), (512, 3)),
    "m1_5": ((64, 5), (128, 6), (256, 26), (512, 5)),
    "m2_3": ((80, 7), (160, 8), (320, 36), (640, 3)),
}


class _RepViTBlock(nn.Module):
    """RepViTBlock (repvit.py:134): stride-2 form = dw-k3-s2 + SE + 1x1 to
    oup, then residual 1x1 expand/project mixer; stride-1 form = RepVGGDW
    (+SE) token mixer with residual channel mixer."""

    inp: int
    oup: int
    stride: int
    use_se: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 2:
            y = _conv_bn(x, self.inp, 3, 2, 1, train, self.dtype, "tm_dw", groups=self.inp)
            if self.use_se:
                y = _squeeze_excite(y, self.inp, train, self.dtype, "tm_se")
            y = _conv_bn(y, self.oup, 1, 1, 0, train, self.dtype, "tm_pw")
            z = _conv_bn(y, 2 * self.oup, 1, 1, 0, train, self.dtype, "cm_pw1")
            return y + _conv_bn(jax.nn.gelu(z), self.oup, 1, 1, 0, train, self.dtype, "cm_pw2", bn_init=0.0)
        # RepVGGDW: dw3x3+BN + dw1x1(bias) + identity, then BN
        y = _conv_bn(x, self.inp, 3, 1, 1, train, self.dtype, "rvg_dw", groups=self.inp)
        y1 = nn.Conv(self.inp, (1, 1), feature_group_count=self.inp, use_bias=True,
                     dtype=self.dtype, param_dtype=jnp.float32, name="rvg_pw")(x)
        y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="rvg_bn")(y + y1 + x)
        if self.use_se:
            y = _squeeze_excite(y, self.inp, train, self.dtype, "tm_se")
        z = _conv_bn(y, 2 * self.inp, 1, 1, 0, train, self.dtype, "cm_pw1")
        return y + _conv_bn(jax.nn.gelu(z), self.oup, 1, 1, 0, train, self.dtype, "cm_pw2", bn_init=0.0)


class RepViT(nn.Module):
    """RepViT backbone (reference nn/backbone/repvit.py:172, registered as
    repvit_m0_9..m2_3) -> [P2, P3, P4, P5]."""

    variant: str = "m0_9"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return tuple(c for c, _ in REPVIT_CFGS[variant])

    @nn.compact
    def __call__(self, x, train: bool = False):
        stages = REPVIT_CFGS[self.variant]
        c0 = stages[0][0]
        x = _conv_bn(x, c0 // 2, 3, 2, 1, train, self.dtype, "stem0")
        x = _conv_bn(jax.nn.gelu(x), c0, 3, 2, 1, train, self.dtype, "stem1")
        outs = []
        inp = c0
        for si, (c, n) in enumerate(stages):
            rows = []
            if si > 0:
                rows.append((2, False))  # stride-2 transition, no SE
                n -= 1
            rows += [(1, (j % 2 == 0) and (j != n - 1)) for j in range(n)]
            for bi, (s, se) in enumerate(rows):
                x = _RepViTBlock(inp, c, s, se, dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
                inp = c
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# LSKNet (reference nn/backbone/lsknet.py — arXiv:2303.09030)
# ---------------------------------------------------------------------------

LSKNET_CFGS = {
    # embed_dims, depths, mlp_ratios
    "t": ((32, 64, 160, 256), (3, 3, 5, 2), (8, 8, 4, 4)),
    "s": ((64, 128, 256, 512), (2, 2, 4, 2), (8, 8, 4, 4)),
}


class _LSKBlockCore(nn.Module):
    """Large selective kernel unit (lsknet.py:31): 5x5 dw + 7x7 dilated dw
    branches, avg/max-pooled 2-channel squeeze picks per-pixel branch mix."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dim
        a1 = nn.Conv(d, (5, 5), padding=[(2, 2)] * 2, feature_group_count=d,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv0")(x)
        a2 = nn.Conv(d, (7, 7), padding=[(9, 9)] * 2, kernel_dilation=(3, 3), feature_group_count=d,
                     dtype=self.dtype, param_dtype=jnp.float32, name="conv_spatial")(a1)
        a1 = nn.Conv(d // 2, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(a1)
        a2 = nn.Conv(d // 2, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(a2)
        attn = jnp.concatenate([a1, a2], -1)
        agg = jnp.concatenate([attn.mean(-1, keepdims=True), attn.max(-1, keepdims=True)], -1)
        sig = jax.nn.sigmoid(nn.Conv(2, (7, 7), padding=[(3, 3)] * 2, dtype=self.dtype,
                                     param_dtype=jnp.float32, name="conv_squeeze")(agg))
        attn = a1 * sig[..., 0:1] + a2 * sig[..., 1:2]
        return x * nn.Conv(d, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="conv")(attn)


class _LSKStageBlock(nn.Module):
    """LSKNet Block (lsknet.py:78): BN -> proj/GELU/LSK/proj attention and
    BN -> conv-MLP with dw3x3, both residual with layer-scale."""

    dim: int
    mlp_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dim
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-2), (d,), jnp.float32)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-2), (d,), jnp.float32)
        y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm1")(x)
        y = jax.nn.gelu(nn.Conv(d, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="proj_1")(y))
        y = _LSKBlockCore(d, dtype=self.dtype, name="lsk")(y)
        y = nn.Conv(d, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="proj_2")(y)
        x = x + ls1 * y
        y = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm2")(x)
        h = d * self.mlp_ratio
        y = nn.Conv(h, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(y)
        y = nn.Conv(h, (3, 3), padding=[(1, 1)] * 2, feature_group_count=h, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dw")(y)
        y = nn.Conv(d, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(jax.nn.gelu(y))
        return x + ls2 * y


class LSKNet(nn.Module):
    """LSKNet backbone (reference nn/backbone/lsknet.py:117, lsknet_t/_s)
    -> [P2, P3, P4, P5]."""

    variant: str = "t"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return LSKNET_CFGS[variant][0]

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths, ratios = LSKNET_CFGS[self.variant]
        outs = []
        for si, (dim, depth, mr) in enumerate(zip(dims, depths, ratios)):
            k, s = (7, 4) if si == 0 else (3, 2)
            x = nn.Conv(dim, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"pe{si}")(x)
            x = MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"pe{si}_bn")(x)
            for bi in range(depth):
                x = _LSKStageBlock(dim, mr, dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name=f"norm{si}")(x)
            outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# MobileNetV4 (reference nn/backbone/mobilenetv4.py — arXiv:2404.10518)
# ---------------------------------------------------------------------------

# spec rows: ("convbn", (out, k, s)) | ("fused_ib", (out, s, expand)) |
# ("uib", (out, start_dw_k, mid_dw_k, s, expand)). The reference's Hybrid
# variants ship EMPTY spec dicts (mobilenetv4.py:200-205) and cannot build
# there either, so only the three Conv variants exist.
MOBILENETV4_SPECS = {
    "conv_small": (
        ("convbn", (32, 3, 2)), ("convbn", (32, 3, 2)), ("convbn", (32, 1, 1)),
        ("convbn", (96, 3, 2)), ("convbn", (64, 1, 1)),
        ("uib", (96, 5, 5, 2, 3)), ("uib", (96, 0, 3, 1, 2)), ("uib", (96, 0, 3, 1, 2)),
        ("uib", (96, 0, 3, 1, 2)), ("uib", (96, 0, 3, 1, 2)), ("uib", (96, 3, 0, 1, 4)),
        ("uib", (128, 3, 3, 2, 6)), ("uib", (128, 5, 5, 1, 4)), ("uib", (128, 0, 5, 1, 4)),
        ("uib", (128, 0, 5, 1, 3)), ("uib", (128, 0, 3, 1, 4)), ("uib", (128, 0, 3, 1, 4)),
        ("convbn", (960, 1, 1)), ("convbn", (1280, 1, 1)),
    ),
    "conv_medium": (
        ("convbn", (32, 3, 2)),
        ("fused_ib", (48, 2, 4)),
        ("uib", (80, 3, 5, 2, 4)), ("uib", (80, 3, 3, 1, 2)),
        ("uib", (160, 3, 5, 2, 6)), ("uib", (160, 3, 3, 1, 4)), ("uib", (160, 3, 3, 1, 4)),
        ("uib", (160, 3, 5, 1, 4)), ("uib", (160, 3, 3, 1, 4)), ("uib", (160, 3, 0, 1, 4)),
        ("uib", (160, 0, 0, 1, 2)), ("uib", (160, 3, 0, 1, 4)),
        ("uib", (256, 5, 5, 2, 6)), ("uib", (256, 5, 5, 1, 4)), ("uib", (256, 3, 5, 1, 4)),
        ("uib", (256, 3, 5, 1, 4)), ("uib", (256, 0, 0, 1, 4)), ("uib", (256, 3, 0, 1, 4)),
        ("uib", (256, 3, 5, 1, 2)), ("uib", (256, 5, 5, 1, 4)), ("uib", (256, 0, 0, 1, 4)),
        ("uib", (256, 0, 0, 1, 4)), ("uib", (256, 5, 0, 1, 2)),
        ("convbn", (960, 1, 1)), ("convbn", (1280, 1, 1)),
    ),
    "conv_large": (
        ("convbn", (24, 3, 2)),
        ("fused_ib", (48, 2, 4)),
        ("uib", (96, 3, 5, 2, 4)), ("uib", (96, 3, 3, 1, 4)),
        ("uib", (192, 3, 5, 2, 4)), ("uib", (192, 3, 3, 1, 4)), ("uib", (192, 3, 3, 1, 4)),
        ("uib", (192, 3, 3, 1, 4)), ("uib", (192, 3, 5, 1, 4)), ("uib", (192, 5, 3, 1, 4)),
        ("uib", (192, 5, 3, 1, 4)), ("uib", (192, 5, 3, 1, 4)), ("uib", (192, 5, 3, 1, 4)),
        ("uib", (192, 5, 3, 1, 4)), ("uib", (192, 3, 0, 1, 4)),
        ("uib", (512, 5, 5, 2, 4)), ("uib", (512, 5, 5, 1, 4)), ("uib", (512, 5, 5, 1, 4)),
        ("uib", (512, 5, 5, 1, 4)), ("uib", (512, 5, 0, 1, 4)), ("uib", (512, 5, 3, 1, 4)),
        ("uib", (512, 5, 0, 1, 4)), ("uib", (512, 5, 0, 1, 4)), ("uib", (512, 5, 3, 1, 4)),
        ("uib", (512, 5, 5, 1, 4)), ("uib", (512, 5, 0, 1, 4)), ("uib", (512, 5, 0, 1, 4)),
        ("uib", (512, 5, 0, 1, 4)),
        ("convbn", (960, 1, 1)), ("convbn", (1280, 1, 1)),
    ),
}


def _mnv4_divisible(v: float, divisor: int = 8) -> int:
    nv = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if nv < 0.9 * v:
        nv += divisor
    return int(nv)


class MobileNetV4(nn.Module):
    """MobileNetV4 backbone (reference nn/backbone/mobilenetv4.py:347,
    MobileNetV4ConvSmall/Medium/Large) -> [P2, P3, P4, P5]; the final
    stride-1 1x1 tower replaces the P5 feature (1280 channels), matching the
    reference's scale-keyed feature collection."""

    variant: str = "conv_small"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        outs, stride = {}, 1
        for kind, spec in MOBILENETV4_SPECS[variant]:
            if kind == "convbn":
                s = spec[2]
            elif kind == "fused_ib":
                s = spec[1]
            else:  # uib
                s = spec[3]
            stride *= s
            outs[stride] = spec[0]
        return tuple(outs[s] for s in (4, 8, 16, 32))

    def _convbn(self, x, out, k, s, train, name, act=True, groups=1):
        y = _conv_bn(x, out, k, s, (k - 1) // 2, train, self.dtype, name, groups=groups)
        return jax.nn.relu6(y) if act else y

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = {}
        stride = 1
        inp = x.shape[-1]
        for i, (kind, spec) in enumerate(MOBILENETV4_SPECS[self.variant]):
            if kind == "convbn":
                out, k, s = spec
                x = self._convbn(x, out, k, s, train, f"b{i}")
            elif kind == "fused_ib":
                out, s, expand = spec
                hid = int(round(inp * expand))
                y = self._convbn(x, hid, 1, 1, train, f"b{i}_exp")
                y = self._convbn(y, hid, 3, s, train, f"b{i}_dw", groups=hid)
                y = self._convbn(y, out, 1, 1, train, f"b{i}_red", act=True)
                x = x + y if (s == 1 and inp == out) else y
            else:  # uib
                out, sdk, mdk, s, expand = spec
                y = x
                if sdk:
                    y = self._convbn(y, inp, sdk, 1 if mdk else s, train, f"b{i}_sdw", act=False, groups=inp)
                hid = _mnv4_divisible(inp * expand)
                y = self._convbn(y, hid, 1, 1, train, f"b{i}_exp")
                if mdk:
                    y = self._convbn(y, hid, mdk, s, train, f"b{i}_mdw", groups=hid)
                x = self._convbn(y, out, 1, 1, train, f"b{i}_proj", act=False)
            inp = out
            stride *= s
            outs[stride] = x
        return [outs[s] for s in (4, 8, 16, 32)]


class _SwinWindowAttention(nn.Module):
    """W-MSA with relative position bias (SwinTransformer.py:63)."""

    dim: int
    window: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):  # x (B', N, C); mask (nW, N, N) or None
        import numpy as np

        w = self.window
        n = w * w
        hd = self.dim // self.num_heads
        table = self.param("rel_bias_table", nn.initializers.normal(0.02),
                           ((2 * w - 1) ** 2, self.num_heads), jnp.float32)
        ch, cw = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
        coords = np.stack([ch.reshape(-1), cw.reshape(-1)])  # (2, N)
        rel = coords[:, :, None] - coords[:, None, :]
        idx = (rel[0] + w - 1) * (2 * w - 1) + (rel[1] + w - 1)  # (N, N)
        bias = table[idx].transpose(2, 0, 1)  # (nh, N, N)

        b = x.shape[0]
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * hd**-0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(0, 1, 3, 2) + bias.astype(q.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, self.num_heads, n, n) + mask[None, :, None].astype(q.dtype)
            attn = attn.reshape(b, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        y = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(y)


class _SwinBlock(nn.Module):
    """Swin block with optional shifted windows (SwinTransformer.py:146)."""

    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        import numpy as np

        B, H, W, C = x.shape
        w = self.window
        pad_b, pad_r = (w - H % w) % w, (w - W % w) % w
        Hp, Wp = H + pad_b, W + pad_r
        shortcut = x
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        mask = None
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            # attention mask over padded+shifted windows (static numpy)
            img = np.zeros((Hp, Wp), np.int32)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                for ws_ in (slice(0, -w), slice(-w, -self.shift), slice(-self.shift, None)):
                    img[hs, ws_] = cnt
                    cnt += 1
            win = img.reshape(Hp // w, w, Wp // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
            diff = win[:, :, None] - win[:, None, :]
            mask = jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))
        yw = y.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)
        yw = _SwinWindowAttention(self.dim, w, self.num_heads, dtype=self.dtype, name="attn")(yw, mask)
        y = yw.reshape(B, Hp // w, Wp // w, w, w, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :H, :W]
        x = shortcut + y
        z = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        z = nn.Dense(self.dim * 4, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(z)
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(jax.nn.gelu(z))
        return x + z


class SwinTransformer(nn.Module):
    """Swin-T backbone (reference nn/backbone/SwinTransformer.py:436,
    SwinTransformer_Tiny) -> [P2, P3, P4, P5] = (96, 192, 384, 768)ch."""

    variant: str = "tiny"
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return (96, 192, 384, 768)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="patch_norm")(x)
        outs = []
        for si, (depth, nh) in enumerate(zip(self.depths, self.heads)):
            dim = self.embed_dim * 2**si
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else self.window // 2
                x = _SwinBlock(dim, nh, self.window, shift, dtype=self.dtype, name=f"s{si}_b{bi}")(x)
            # per-stage output norm (the backbone's out_indices norms)
            outs.append(nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name=f"out_norm{si}")(x))
            if si < len(self.depths) - 1:  # PatchMerging
                b, h, w, c = x.shape
                hp, wp = h + h % 2, w + w % 2
                y = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
                y = jnp.concatenate(
                    [y[:, 0::2, 0::2], y[:, 1::2, 0::2], y[:, 0::2, 1::2], y[:, 1::2, 1::2]], -1)
                y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name=f"merge_norm{si}")(y)
                x = nn.Dense(dim * 2, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"merge_reduction{si}")(y)
        return outs


UNIREPLK_CFGS = {  # dims, depths
    "a": ((40, 80, 160, 320), (2, 2, 6, 2)),
    "f": ((48, 96, 192, 384), (2, 2, 6, 2)),
    "p": ((64, 128, 256, 512), (2, 2, 6, 2)),
    "n": ((80, 160, 320, 640), (2, 2, 8, 2)),
    "t": ((80, 160, 320, 640), (3, 3, 18, 3)),
    "s": ((96, 192, 384, 768), (3, 3, 27, 3)),
    "b": ((128, 256, 512, 1024), (3, 3, 27, 3)),
    "l": ((192, 384, 768, 1536), (3, 3, 27, 3)),
    "xl": ((256, 512, 1024, 2048), (3, 3, 27, 3)),
}
_UNIREPLK_KS = {  # depths -> per-stage kernel tables (UniRepLKNet.py:336)
    (2, 2, 6, 2): ((3, 3), (13, 13), (13,) * 6, (13, 13)),
    (2, 2, 8, 2): ((3, 3), (13, 13), (13,) * 8, (13, 13)),
    (3, 3, 18, 3): ((3, 3, 3), (13, 13, 13), (13, 3) * 9, (13, 13, 13)),
    (3, 3, 27, 3): ((3, 3, 3), (13, 13, 13), (13, 3, 3) * 9, (13, 13, 13)),
}


class UniRepLKNet(nn.Module):
    """UniRepLKNet backbone (reference nn/backbone/UniRepLKNet.py:364,
    unireplknet_a..s) -> [P2, P3, P4, P5]; dilated-reparam 13x13 blocks."""

    variant: str = "a"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return UNIREPLK_CFGS[variant][0]

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.zoo_blocks import UniRepLKNetBlock

        dims, depths = UNIREPLK_CFGS[self.variant]
        kss = _UNIREPLK_KS[depths]
        ln = lambda t, nm: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name=nm)(t)
        x = nn.Conv(dims[0] // 2, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem0")(x)
        x = jax.nn.gelu(ln(x, "stem0_ln"))
        x = nn.Conv(dims[0], (3, 3), strides=(2, 2), padding=[(1, 1)] * 2, dtype=self.dtype,
                    param_dtype=jnp.float32, name="stem1")(x)
        x = ln(x, "stem1_ln")
        outs = []
        for si in range(4):
            if si > 0:
                x = nn.Conv(dims[si], (3, 3), strides=(2, 2), padding=[(1, 1)] * 2, dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"down{si}")(x)
                x = ln(x, f"down{si}_ln")
            for bi in range(depths[si]):
                x = UniRepLKNetBlock(dims[si], k=kss[si][bi], dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
            outs.append(ln(x, f"out_norm{si}"))
        return outs


VANILLANET_CFGS = {  # dims, strides (VanillaNet.py:224-297)
    "5": ((512, 1024, 2048, 4096), (2, 2, 2)),
    "6": ((512, 1024, 2048, 4096, 4096), (2, 2, 2, 1)),
    "7": ((512, 512, 1024, 2048, 4096, 4096), (1, 2, 2, 2, 1)),
    "8": ((512, 512, 1024, 2048, 2048, 4096, 4096), (1, 2, 2, 1, 2, 1)),
    "9": ((512, 512, 1024, 2048, 2048, 2048, 4096, 4096), (1, 2, 2, 1, 1, 2, 1)),
    "10": ((512, 512, 1024, 2048, 2048, 2048, 2048, 4096, 4096), (1, 2, 2, 1, 1, 1, 2, 1)),
    "11": ((512, 512, 1024, 2048, 2048, 2048, 2048, 2048, 4096, 4096), (1, 2, 2, 1, 1, 1, 1, 2, 1)),
    "12": ((512, 512, 1024, 2048, 2048, 2048, 2048, 2048, 2048, 4096, 4096), (1, 2, 2, 1, 1, 1, 1, 1, 2, 1)),
    "13": ((512, 512, 1024, 2048, 2048, 2048, 2048, 2048, 2048, 2048, 4096, 4096), (1, 2, 2, 1, 1, 1, 1, 1, 1, 2, 1)),
    "13_x1_5": ((768, 768, 1536, 3072, 3072, 3072, 3072, 3072, 3072, 3072, 6144, 6144), (1, 2, 2, 1, 1, 1, 1, 1, 1, 2, 1)),
    # vanillanet_13_x1_5_ada_pool (VanillaNet.py:309) is omitted: its
    # AdaptiveMaxPool2d(40) step jumps /4 -> /16, so the /8 pyramid level
    # never exists and the reference's own channel probe (VanillaNet.py
    # forward scale collection) crashes on it — broken upstream, like the
    # MobileNetV4Hybrid specs.
}


class VanillaNet(nn.Module):
    """VanillaNet backbone (reference nn/backbone/VanillaNet.py:121,
    vanillanet_5..10) -> [P2, P3, P4, P5]; 1x1 conv pairs + learned
    depthwise 'activation' convs, scale-keyed feature collection."""

    variant: str = "5"
    act_num: int = 3
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        dims, strides = VANILLANET_CFGS[variant]
        outs, stride = {}, 4
        outs[4] = dims[0]
        for i, s in enumerate(strides):
            stride *= s
            outs[min(stride, 32)] = dims[i + 1]
        return tuple(outs[s] for s in (4, 8, 16, 32))

    def _act(self, x, train, name):
        """activation (VanillaNet.py:11): ReLU -> learned dw conv -> BN."""
        c = x.shape[-1]
        k = self.act_num * 2 + 1
        y = nn.Conv(c, (k, k), padding=[(self.act_num,) * 2] * 2, feature_group_count=c,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"{name}_aw")(jax.nn.relu(x))
        return MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-6, dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"{name}_abn")(y)

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, strides = VANILLANET_CFGS[self.variant]
        bn = lambda t, nm: MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-6,
                                        dtype=self.dtype, param_dtype=jnp.float32, name=nm)(t)
        x = bn(nn.Conv(dims[0], (4, 4), strides=(4, 4), use_bias=True, dtype=self.dtype,
                       param_dtype=jnp.float32, name="stem1")(x), "stem1_bn")
        # leaky_relu(slope=act_learn=1) is the identity at the trained state
        x = bn(nn.Conv(dims[0], (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                       name="stem2")(x), "stem2_bn")
        x = self._act(x, train, "stem_act")
        outs = {4: x}
        stride = 4
        for i, s in enumerate(strides):
            y = bn(nn.Conv(dims[i], (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                           name=f"b{i}_conv1")(x), f"b{i}_bn1")
            y = bn(nn.Conv(dims[i + 1], (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                           name=f"b{i}_conv2")(y), f"b{i}_bn2")
            if s > 1:
                y = nn.max_pool(y, (s, s), strides=(s, s))
                stride *= s
            x = self._act(y, train, f"b{i}_act")
            outs[min(stride, 32)] = x
        return [outs[s] for s in (4, 8, 16, 32)]


# name -> (class, variant): the reference's callable-name registry
# (tasks.py:939-957) mapped onto our variant-parameterized modules


# --------------------------------------------------------------------------
# RMT (RetNet meets vision transformers) — reference nn/backbone/rmt.py
# --------------------------------------------------------------------------

RMT_CFGS = {  # dims, depths, heads, init_values, heads_ranges, mlp_ratios, chunkwise, layerscales
    "t": ((64, 128, 256, 512), (2, 2, 8, 2), (4, 4, 8, 16), (2, 2, 2, 2), (4, 4, 6, 6),
          (3, 3, 3, 3), (True, True, False, False), (False, False, False, False)),
    "s": ((64, 128, 256, 512), (3, 4, 18, 4), (4, 4, 8, 16), (2, 2, 2, 2), (4, 4, 6, 6),
          (4, 4, 3, 3), (True, True, True, False), (False, False, False, False)),
    "b": ((80, 160, 320, 512), (4, 8, 25, 8), (5, 5, 10, 16), (2, 2, 2, 2), (5, 5, 6, 6),
          (4, 4, 3, 3), (True, True, True, False), (False, False, True, True)),
    "l": ((112, 224, 448, 640), (4, 8, 25, 8), (7, 7, 14, 20), (2, 2, 2, 2), (6, 6, 6, 6),
          (4, 4, 3, 3), (True, True, True, False), (False, False, True, True)),
}


def _rmt_decay(num_heads: int, init_value: float, heads_range: float):
    import numpy as np

    return np.log(1 - 2.0 ** (-init_value - heads_range * np.arange(num_heads) / num_heads))


def _rmt_mask_1d(n: int, decay):
    import numpy as np

    idx = np.arange(n)
    m = np.abs(idx[:, None] - idx[None, :]).astype(np.float32)
    return (m[None] * decay[:, None, None]).astype(np.float32)  # (heads, n, n)


def _rmt_mask_2d(h: int, w: int, decay):
    import numpy as np

    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    g = np.stack([gy, gx], -1).reshape(h * w, 2)
    m = np.abs(g[:, None] - g[None, :]).sum(-1).astype(np.float32)
    return (m[None] * decay[:, None, None]).astype(np.float32)  # (heads, hw, hw)


class _RetBlock(nn.Module):
    """RetBlock (rmt.py:280): dw-conv positional residual, Manhattan
    self-attention with static exponential decay bias — axial (MaSAd,
    rmt.py:102) in 'chunk' retention or full (MaSA, rmt.py:178) — and an
    FFN, each LayerNorm'd with optional layerscale."""

    dim: int
    heads: int
    ffn_dim: int
    init_value: float = 2.0
    heads_range: float = 4.0
    chunk: bool = True
    layerscale: bool = False
    layer_init: float = 1e-6
    dtype: Dtype = jnp.float32

    def _dense(self, c, name):
        return nn.Dense(c, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        nh = self.heads
        kd = c // nh
        decay = _rmt_decay(nh, self.init_value, self.heads_range)
        pos = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2, feature_group_count=c, use_bias=True,
                      dtype=self.dtype, param_dtype=jnp.float32, name="pos")(x)
        x = x + pos
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="retention_layer_norm")(x)
        q = self._dense(c, "q_proj")(y)
        k = self._dense(c, "k_proj")(y) * (kd**-0.5)
        v = self._dense(c, "v_proj")(y)
        lepe = nn.Conv(c, (5, 5), padding=[(2, 2)] * 2, feature_group_count=c, use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32, name="lepe")(v)
        if self.chunk:
            mask_h = jnp.asarray(_rmt_mask_1d(h, decay))
            mask_w = jnp.asarray(_rmt_mask_1d(w, decay))
            qr = q.reshape(b, h, w, nh, kd)
            kr = k.reshape(b, h, w, nh, kd)
            vr = v.reshape(b, h, w, nh, kd)
            # along W: (b h n w w)
            attw = jnp.einsum("bhwnd,bhvnd->bhnwv", qr, kr) + mask_w[None, None].astype(q.dtype)
            attw = jax.nn.softmax(attw, axis=-1)
            vv = jnp.einsum("bhnwv,bhvnd->bhwnd", attw, vr)
            # along H: (b w n h h)
            atth = jnp.einsum("bhwnd,bgwnd->bwnhg", qr, kr) + mask_h[None, None].astype(q.dtype)
            atth = jax.nn.softmax(atth, axis=-1)
            out = jnp.einsum("bwnhg,bgwnd->bhwnd", atth, vv)
            out = out.reshape(b, h, w, c)
        else:
            mask = jnp.asarray(_rmt_mask_2d(h, w, decay))
            qr = q.reshape(b, h * w, nh, kd).transpose(0, 2, 1, 3)
            kr = k.reshape(b, h * w, nh, kd).transpose(0, 2, 1, 3)
            vr = v.reshape(b, h * w, nh, kd).transpose(0, 2, 1, 3)
            att = jax.nn.softmax(qr @ kr.transpose(0, 1, 3, 2) + mask[None].astype(q.dtype), axis=-1)
            out = (att @ vr).transpose(0, 2, 1, 3).reshape(b, h, w, c)
        out = out + lepe
        out = self._dense(c, "out_proj")(out)
        if self.layerscale:
            g1 = self.param("gamma_1", nn.initializers.constant(self.layer_init), (c,), jnp.float32)
            out = out * g1.astype(out.dtype)
        x = x + out
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="final_layer_norm")(x)
        y = self._dense(self.ffn_dim, "ffn_fc1")(y)
        y = self._dense(c, "ffn_fc2")(jax.nn.gelu(y, approximate=False))
        if self.layerscale:
            g2 = self.param("gamma_2", nn.initializers.constant(self.layer_init), (c,), jnp.float32)
            y = y * g2.astype(y.dtype)
        return x + y


class RMT(nn.Module):
    """VisRetNet (rmt.py:452): conv patch embed to /4, four stages of
    RetBlocks with conv-BN patch merging between stages; features at
    /4, /8, /16, /32."""

    variant: str = "t"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return RMT_CFGS[variant][0]

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths, heads, ivs, hrs, mlps, chunks, lss = RMT_CFGS[self.variant]
        d0 = dims[0]

        def conv_bias_bn(z, out, st, name):  # rmt convs keep their bias under BN
            z = nn.Conv(out, (3, 3), strides=(st, st), padding=[(1, 1)] * 2, use_bias=True,
                        dtype=self.dtype, param_dtype=jnp.float32, name=f"{name}_c")(z)
            return MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, param_dtype=jnp.float32, name=f"{name}_bn")(z)

        # patch embed (rmt.py:417): 4 conv-BN (GELU between)
        y = conv_bias_bn(x, d0 // 2, 2, "pe0")
        y = conv_bias_bn(jax.nn.gelu(y, approximate=False), d0 // 2, 1, "pe1")
        y = conv_bias_bn(jax.nn.gelu(y, approximate=False), d0, 2, "pe2")
        y = conv_bias_bn(jax.nn.gelu(y, approximate=False), d0, 1, "pe3")
        feats = [y]
        for i in range(4):
            for j in range(depths[i]):
                y = _RetBlock(dims[i], heads[i], int(mlps[i] * dims[i]), ivs[i], hrs[i],
                              chunk=chunks[i], layerscale=lss[i], dtype=self.dtype,
                              name=f"s{i}_b{j}")(y, train)
            if i < 3:
                y = conv_bias_bn(y, dims[i + 1], 2, f"merge{i}")
                feats.append(y)
        # features: patch-embed map at /4, then the /8 and /16 merges, and
        # the final stage output at /32 (rmt.py:520 forward)
        return (feats[0], feats[1], feats[2], y)


WHOLE_BACKBONES = {
    "RMT_T": (RMT, "t"),
    "RMT_S": (RMT, "s"),
    "RMT_B": (RMT, "b"),
    "RMT_L": (RMT, "l"),
    "EfficientViT_M0": (EfficientViT, "m0"),
    "EfficientViT_M1": (EfficientViT, "m1"),
    "EfficientViT_M2": (EfficientViT, "m2"),
    "EfficientViT_M3": (EfficientViT, "m3"),
    "EfficientViT_M4": (EfficientViT, "m4"),
    "EfficientViT_M5": (EfficientViT, "m5"),
    "repvit_m0_9": (RepViT, "m0_9"),
    "repvit_m1_0": (RepViT, "m1_0"),
    "repvit_m1_1": (RepViT, "m1_1"),
    "repvit_m1_5": (RepViT, "m1_5"),
    "repvit_m2_3": (RepViT, "m2_3"),
    "lsknet_t": (LSKNet, "t"),
    "lsknet_s": (LSKNet, "s"),
    "MobileNetV4ConvSmall": (MobileNetV4, "conv_small"),
    "MobileNetV4ConvMedium": (MobileNetV4, "conv_medium"),
    "MobileNetV4ConvLarge": (MobileNetV4, "conv_large"),
    "SwinTransformer_Tiny": (SwinTransformer, "tiny"),
    "unireplknet_a": (UniRepLKNet, "a"),
    "unireplknet_f": (UniRepLKNet, "f"),
    "unireplknet_p": (UniRepLKNet, "p"),
    "unireplknet_n": (UniRepLKNet, "n"),
    "unireplknet_t": (UniRepLKNet, "t"),
    "unireplknet_s": (UniRepLKNet, "s"),
    "vanillanet_5": (VanillaNet, "5"),
    "vanillanet_6": (VanillaNet, "6"),
    "vanillanet_7": (VanillaNet, "7"),
    "vanillanet_8": (VanillaNet, "8"),
    "vanillanet_9": (VanillaNet, "9"),
    "vanillanet_10": (VanillaNet, "10"),
}


class FasterNet(nn.Module):
    """FasterNet backbone -> [P2, P3, P4, P5] at strides 4/8/16/32."""

    variant: str = "t0"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str) -> Tuple[int, ...]:
        e = FASTERNET_CFGS[variant][0]
        return (e, e * 2, e * 4, e * 8)

    @nn.compact
    def __call__(self, x, train: bool = False):
        embed, depths, act = FASTERNET_CFGS[self.variant]
        # patch embed 4x4 s4
        x = nn.Conv(embed, (4, 4), strides=(4, 4), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed")(x)
        x = _bn(x, train, self.dtype, "patch_bn")
        outs = []
        dim = embed
        for si, depth in enumerate(depths):
            for bi in range(depth):
                x = _PConvMLPBlock(dim, act=act, dtype=self.dtype, name=f"s{si}_b{bi}")(x, train)
            out = _bn(x, train, self.dtype, f"norm{si}")
            outs.append(out)
            if si < len(depths) - 1:  # patch merging 2x2 s2
                dim *= 2
                x = nn.Conv(dim, (2, 2), strides=(2, 2), use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32, name=f"merge{si}")(x)
                x = _bn(x, train, self.dtype, f"merge_bn{si}")
        return outs


# --------------------------------------------------------------------------
# CSWin Transformer — reference nn/backbone/CSwomTramsformer.py
# --------------------------------------------------------------------------

CSWIN_CFGS = {  # embed, depths, splits, heads
    "tiny": (64, (1, 2, 21, 1), (1, 2, 8, 8), (2, 4, 8, 16)),
    "small": (64, (2, 4, 32, 2), (1, 2, 8, 8), (2, 4, 8, 16)),
    "base": (96, (2, 4, 32, 2), (1, 2, 8, 8), (4, 8, 16, 32)),
    "large": (144, (2, 4, 32, 2), (1, 2, 8, 8), (6, 12, 24, 24)),
}


class _LePEAttention(nn.Module):
    """Cross-shaped-window attention branch (CSwomTramsformer.py:43): strip
    windows (full-height x split or split x full-width), locally-enhanced
    positional encoding from a dw conv on v."""

    dim: int
    heads: int
    h_sp: int
    w_sp: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):  # (B, H, W, dim) each
        B, H, W, C = q.shape
        hs, ws = min(self.h_sp, H), min(self.w_sp, W)
        nh, nw = H // hs, W // ws
        hd = C // self.heads

        def part(t):  # windows (B*nh*nw, hs*ws, heads, hd) -> (B', heads, N, hd)
            t = t.reshape(B, nh, hs, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
            t = t.reshape(B * nh * nw, hs * ws, self.heads, hd)
            return t.transpose(0, 2, 1, 3)

        lepe = nn.Conv(C, (3, 3), padding=[(1, 1)] * 2, feature_group_count=C, use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32, name="get_v")(v)
        qf, kf, vf, lf = part(q), part(k), part(v), part(lepe)
        attn = jax.nn.softmax(qf * hd**-0.5 @ kf.transpose(0, 1, 3, 2), axis=-1)
        o = attn @ vf + lf
        o = o.transpose(0, 2, 1, 3).reshape(B, nh, nw, hs, ws, C).transpose(0, 1, 3, 2, 4, 5)
        return o.reshape(B, H, W, C)


class _CSWinBlock(nn.Module):
    """CSWinBlock (CSwomTramsformer.py:122): LN -> qkv -> two half-channel
    strip-attention branches (or one global branch in the last stage) ->
    proj, then LN + MLP, both residual."""

    dim: int
    heads: int
    split: int
    last: bool = False
    mlp_ratio: int = 4
    dtype: Dtype = jnp.float32

    def _dense(self, c, name, bias=True):
        return nn.Dense(c, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        qkv = self._dense(3 * C, "qkv")(y)
        q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
        if self.last or H <= self.split:
            att = _LePEAttention(C, self.heads, H, W, dtype=self.dtype, name="attn0")(q, k, v)
        else:
            h = C // 2
            a1 = _LePEAttention(h, self.heads // 2, H, self.split, dtype=self.dtype, name="attn0")(
                q[..., :h], k[..., :h], v[..., :h])
            a2 = _LePEAttention(h, self.heads // 2, self.split, W, dtype=self.dtype, name="attn1")(
                q[..., h:], k[..., h:], v[..., h:])
            att = jnp.concatenate([a1, a2], -1)
        x = x + self._dense(C, "proj")(att)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        y = self._dense(self.mlp_ratio * C, "mlp_fc1")(y)
        y = self._dense(C, "mlp_fc2")(jax.nn.gelu(y, approximate=False))
        return x + y


class CSWin(nn.Module):
    """CSWin Transformer (CSwomTramsformer.py:228): 7x7/s4 conv embed + LN,
    four stages of cross-shaped-window blocks with conv+LN merges; features
    at /4, /8, /16, /32."""

    variant: str = "tiny"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        e = CSWIN_CFGS[variant][0]
        return (e, e * 2, e * 4, e * 8)

    @nn.compact
    def __call__(self, x, train: bool = False):
        e, depths, splits, heads = CSWIN_CFGS[self.variant]
        y = nn.Conv(e, (7, 7), strides=(4, 4), padding=[(2, 2)] * 2, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, name="embed_conv")(x)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="embed_norm")(y)
        dims = self.channels(self.variant)
        feats = []
        for i in range(4):
            for j in range(depths[i]):
                y = _CSWinBlock(dims[i], heads[i], splits[i], last=(i == 3),
                                dtype=self.dtype, name=f"s{i}_b{j}")(y, train)
            feats.append(y)
            if i < 3:
                y = nn.Conv(dims[i + 1], (3, 3), strides=(2, 2), padding=[(1, 1)] * 2, use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32, name=f"merge{i}_conv")(y)
                y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name=f"merge{i}_norm")(y)
        return tuple(feats)


# --------------------------------------------------------------------------
# PKINet (Poly Kernel Inception Network) — reference nn/backbone/pkinet.py
# --------------------------------------------------------------------------

PKINET_CFGS = {  # per stage: (out, blocks, shortcut_ffn_scale, shortcut_ffn_k)
    "t": (16, ((32, 4, 8.0, 5), (64, 14, 8.0, 7), (128, 22, 4.0, 9), (256, 4, 4.0, 11))),
    "s": (32, ((64, 4, 8.0, 5), (128, 12, 8.0, 7), (256, 20, 4.0, 9), (512, 4, 4.0, 11))),
    "b": (40, ((80, 6, 8.0, 5), (160, 16, 8.0, 7), (320, 24, 4.0, 9), (640, 6, 4.0, 11))),
}


def _pki_conv(x, out, k, s, train, dtype, name, g=1, norm=True, act=True, d=1):
    """mmcv ConvModule (BN momentum 0.03 / SiLU); bias only when norm-free."""
    pad = (d * (k[0] if isinstance(k, tuple) else k) - d + 1) // 2 if not isinstance(k, tuple) else None
    if isinstance(k, tuple):
        kh, kw = k
        padding = [((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)]
    else:
        kh = kw = k
        p = (d * (k - 1)) // 2
        padding = [(p, p)] * 2
    y = nn.Conv(out, (kh, kw), strides=(s, s), padding=padding, feature_group_count=g,
                kernel_dilation=(d, d), use_bias=not norm, dtype=dtype,
                param_dtype=jnp.float32, name=f"{name}_c")(x)
    if norm:
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=dtype, param_dtype=jnp.float32, name=f"{name}_bn")(y)
    return jax.nn.silu(y) if act else y


def _gsilu(x):
    """GSiLU (pkinet.py:111): gate by the sigmoid of the global average."""
    return x * jax.nn.sigmoid(x.mean(axis=(1, 2), keepdims=True))


class _PKICAA(nn.Module):
    """Context anchor attention (pkinet.py:121)."""

    k: int = 11
    norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = nn.avg_pool(x, (7, 7), strides=(1, 1), padding=[(3, 3)] * 2)
        y = _pki_conv(y, c, 1, 1, train, self.dtype, "conv1", norm=self.norm, act=self.norm)
        y = _pki_conv(y, c, (1, self.k), 1, train, self.dtype, "h_conv", g=c, norm=False, act=False)
        y = _pki_conv(y, c, (self.k, 1), 1, train, self.dtype, "v_conv", g=c, norm=False, act=False)
        y = _pki_conv(y, c, 1, 1, train, self.dtype, "conv2", norm=self.norm, act=self.norm)
        return jax.nn.sigmoid(y)


class _PKIConvFFN(nn.Module):
    """ConvFFN (pkinet.py:151): LN -> 1x1 up -> dw kxk -> GSiLU -> 1x1 down."""

    out: int
    scale: float = 4.0
    k: int = 3
    add_identity: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # both reference call sites pass norm_cfg=None/act_cfg=None
        # (pkinet.py:359 ffn, pkinet.py:411 shortcut ffn): bare biased convs
        hid = int(x.shape[-1] * self.scale)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="ln")(x)
        y = _pki_conv(y, hid, 1, 1, train, self.dtype, "fc1", norm=False, act=False)
        y = _pki_conv(y, hid, self.k, 1, train, self.dtype, "dw", g=hid, norm=False, act=False)
        y = _gsilu(y)
        y = _pki_conv(y, self.out, 1, 1, train, self.dtype, "fc2", norm=False, act=False)
        return x + y if self.add_identity else y


class _PKIInception(nn.Module):
    """InceptionBottleneck (pkinet.py:236): 1x1 pre, summed multi-kernel dw
    bank, 1x1 pw, CAA gate on the pre-conv features, 1x1 post."""

    out: int
    caa_k: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.tasks import make_divisible

        hid = make_divisible(self.out, 8)
        add_identity = x.shape[-1] == self.out
        x = _pki_conv(x, hid, 1, 1, train, self.dtype, "pre_conv")
        y = x
        x = _pki_conv(x, hid, 3, 1, train, self.dtype, "dw_conv", g=hid, norm=False, act=False)
        acc = x
        for i, k in enumerate((5, 7, 9, 11)):
            acc = acc + _pki_conv(x, hid, k, 1, train, self.dtype, f"dw_conv{i + 1}", g=hid,
                                  norm=False, act=False)
        x = _pki_conv(acc, hid, 1, 1, train, self.dtype, "pw_conv")
        y = _PKICAA(self.caa_k, norm=False, dtype=self.dtype, name="caa")(y, train)
        if add_identity:
            x = x + x * y
        else:
            x = x * y
        return _pki_conv(x, self.out, 1, 1, train, self.dtype, "post_conv")


class _PKIBlock(nn.Module):
    """PKIBlock (pkinet.py:306): BN -> inception bottleneck, BN -> ConvFFN,
    layer-scaled residuals."""

    out: int
    caa_k: int = 11
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.tasks import make_divisible

        hid = make_divisible(self.out, 8)
        add_identity = x.shape[-1] == self.out
        g1 = self.param("gamma1", nn.initializers.ones, (hid,), jnp.float32)
        g2 = self.param("gamma2", nn.initializers.ones, (self.out,), jnp.float32)
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        y = g1.astype(x.dtype) * _PKIInception(hid, self.caa_k, dtype=self.dtype, name="block")(y, train)
        x = x + y if add_identity else y
        z = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        z = g2.astype(x.dtype) * _PKIConvFFN(self.out, 4.0, 3, add_identity=False,
                                             dtype=self.dtype, name="ffn")(z, train)
        return x + z if add_identity else z


class PKINet(nn.Module):
    """PKINet (pkinet.py:436): conv stem to /2 plus four PKI stages; outputs
    all five levels (/2, /4, /8, /16, /32) like the reference's
    out_indices=(0,1,2,3,4)."""

    variant: str = "t"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        stem, stages = PKINET_CFGS[variant]
        return tuple([stem] + [s[0] for s in stages])

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.tasks import make_divisible

        stem_c, stages = PKINET_CFGS[self.variant]
        y = _pki_conv(x, stem_c, 3, 2, train, self.dtype, "stem_down")
        y = _pki_conv(y, stem_c, 3, 1, train, self.dtype, "stem_c1")
        y = _pki_conv(y, stem_c, 3, 1, train, self.dtype, "stem_c2")
        outs = [y]
        for si, (out, nblocks, sc_scale, sc_k) in enumerate(stages):
            hid = make_divisible(out // 2, 8)
            y = _pki_conv(y, out, 3, 2, train, self.dtype, f"s{si}_down")
            y = _pki_conv(y, 2 * hid, 1, 1, train, self.dtype, f"s{si}_conv1")
            a, b = y[..., :hid], y[..., hid:]
            a = _PKIConvFFN(hid, sc_scale, sc_k, add_identity=True, dtype=self.dtype,
                            name=f"s{si}_ffn")(a, train)
            t = jnp.zeros_like(b)
            for bi in range(nblocks):
                t = t + _PKIBlock(hid, 11 + 2 * bi, dtype=self.dtype, name=f"s{si}_b{bi}")(b, train)
            y = jnp.concatenate([a, t], -1)
            y = _pki_conv(y, out, 1, 1, train, self.dtype, f"s{si}_conv2")
            y = _pki_conv(y, out, 1, 1, train, self.dtype, f"s{si}_conv3")
            outs.append(y)
        return tuple(outs)



# --------------------------------------------------------------------------
# EfficientFormerV2 — reference nn/backbone/EfficientFormerV2.py
# --------------------------------------------------------------------------

EFV2_CFGS = {  # dims, depths, vit_num, e_ratios per stage
    "s0": ((32, 48, 96, 176), (2, 2, 6, 4), 2,
           ((4, 4), (4, 4), (4, 3, 3, 3, 4, 4), (4, 3, 3, 4))),
    "s1": ((32, 48, 120, 224), (3, 3, 9, 6), 2,
           ((4, 4, 4), (4, 4, 4), (4, 4, 3, 3, 3, 3, 4, 4, 4), (4, 4, 3, 3, 4, 4))),
    "s2": ((32, 64, 144, 288), (4, 4, 12, 8), 4,
           ((4, 4, 4, 4), (4, 4, 4, 4), (4, 4, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4), (4, 4, 3, 3, 3, 3, 4, 4))),
    "l": ((40, 80, 192, 384), (5, 5, 15, 10), 6,
          ((4, 4, 4, 4, 4), (4, 4, 4, 4, 4), (4, 4, 4, 4, 3, 3, 3, 3, 3, 3, 3, 4, 4, 4, 4),
           (4, 4, 4, 3, 3, 3, 3, 4, 4, 4))),
}


def _efv2_cbn(x, out, k, st, pad, train, dtype, name, groups=1):
    """EFv2 conv+BN: the reference keeps conv bias=True under BN."""
    y = nn.Conv(out, (k, k), strides=(st, st), padding=[(pad, pad)] * 2, use_bias=True,
                feature_group_count=groups, dtype=dtype, param_dtype=jnp.float32,
                name=f"{name}_c")(x)
    return MemBatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=dtype,
                        param_dtype=jnp.float32, name=f"{name}_bn")(y)


def _efv2_bias(res: int, res_q: int, q_stride: int):
    """Offset dictionary + index table for the 7x7-style rel-pos bias
    (EfficientFormerV2.py:108/239). Returns (n_offsets, idx (Nq, Nk))."""
    import itertools

    import numpy as np

    pk = list(itertools.product(range(res), range(res)))
    pq = list(itertools.product(range(res_q), range(res_q)))
    offsets, idxs = {}, []
    for p1 in pq:
        for p2 in pk:
            off = (abs(p1[0] * q_stride - p2[0]), abs(p1[1] * q_stride - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return len(offsets), np.asarray(idxs, np.int32).reshape(len(pq), len(pk))


class _EFv2Attention4D(nn.Module):
    """Attention4D (EfficientFormerV2.py:64): conv-BN qkv with a dw local-v
    branch, talking heads, learned rel-pos bias; optional stride-2 pre-conv
    + bilinear upsample."""

    dim: int
    table_res: int  # bias table resolution (640-based, per reference)
    stride: int = 0
    key_dim: int = 32
    heads: int = 8
    attn_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H0, W0, C = x.shape
        if self.stride:
            x = _efv2_cbn(x, C, 3, self.stride, 1, train, self.dtype, "stride_conv", groups=C)
        B, H, W, _ = x.shape
        d = self.attn_ratio * self.key_dim
        dh = d * self.heads
        nhkd = self.key_dim * self.heads
        q = _efv2_cbn(x, nhkd, 1, 1, 0, train, self.dtype, "q")
        k = _efv2_cbn(x, nhkd, 1, 1, 0, train, self.dtype, "k")
        v = _efv2_cbn(x, dh, 1, 1, 0, train, self.dtype, "v")
        v_local = _efv2_cbn(v, dh, 3, 1, 1, train, self.dtype, "v_local", groups=dh)
        res = self.table_res if self.stride == 0 else -(-self.table_res // self.stride)
        n_off, idx = _efv2_bias(res, res, 1)
        biases = self.param("attention_biases", nn.initializers.zeros, (self.heads, n_off), jnp.float32)
        if H == res and W == res:
            ab = biases[:, idx]
        else:  # off-size map: rebuild the index at runtime size, clipped
            n2, idx2 = _efv2_bias(max(H, W), max(H, W), 1)
            idx2 = jnp.clip(jnp.asarray(idx2), 0, n_off - 1)
            ab = biases[:, idx2].reshape(self.heads, max(H, W) ** 2, max(H, W) ** 2)
            ab = ab[:, : H * W, : H * W]
        # NCHW channel-major head split (the torch flatten(2).reshape path)
        qf = q.transpose(0, 3, 1, 2).reshape(B, self.heads, self.key_dim, H * W).transpose(0, 1, 3, 2)
        kf = k.transpose(0, 3, 1, 2).reshape(B, self.heads, self.key_dim, H * W)
        vf = v.transpose(0, 3, 1, 2).reshape(B, self.heads, d, H * W).transpose(0, 1, 3, 2)
        attn = qf @ kf * self.key_dim**-0.5 + ab.astype(qf.dtype)
        # talking heads: 1x1 convs over the head axis
        th1 = self.param("talking_head1", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                         (self.heads, self.heads), jnp.float32)
        th1b = self.param("talking_head1_bias", nn.initializers.zeros, (self.heads,), jnp.float32)
        th2 = self.param("talking_head2", nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                         (self.heads, self.heads), jnp.float32)
        th2b = self.param("talking_head2_bias", nn.initializers.zeros, (self.heads,), jnp.float32)
        attn = jnp.einsum("bhnm,gh->bgnm", attn, th1.astype(attn.dtype)) + th1b.astype(attn.dtype)[None, :, None, None]
        attn = jax.nn.softmax(attn, axis=-1)
        attn = jnp.einsum("bhnm,gh->bgnm", attn, th2.astype(attn.dtype)) + th2b.astype(attn.dtype)[None, :, None, None]
        out = (attn @ vf).transpose(0, 1, 3, 2).reshape(B, dh, H, W).transpose(0, 2, 3, 1) + v_local
        if self.stride:
            out = jax.image.resize(out, (B, H0, W0, dh), "bilinear")
        out = jax.nn.gelu(out, approximate=False)
        return _efv2_cbn(out, self.dim, 1, 1, 0, train, self.dtype, "proj")


class _EFv2AttnDownsample(nn.Module):
    """Attention4DDownsample (EfficientFormerV2.py:194): LGQuery stride-2
    queries attend over full-res keys, plus a stride-2 dw local-v path."""

    out_dim: int
    table_res: int
    key_dim: int = 16
    heads: int = 8
    attn_ratio: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        H2, W2 = -(-H // 2), -(-W // 2)
        d = self.attn_ratio * self.key_dim
        dh = d * self.heads
        nhkd = self.key_dim * self.heads
        # LGQuery: dw stride-2 + avgpool(1,2) sum, 1x1+BN
        lq = nn.Conv(C, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2, feature_group_count=C,
                     use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="q_local")(x)
        pq = nn.avg_pool(x, (1, 1), strides=(2, 2))
        q = _efv2_cbn(lq + pq, nhkd, 1, 1, 0, train, self.dtype, "q_proj")
        k = _efv2_cbn(x, nhkd, 1, 1, 0, train, self.dtype, "k")
        v = _efv2_cbn(x, dh, 1, 1, 0, train, self.dtype, "v")
        v_local = _efv2_cbn(v, dh, 3, 2, 1, train, self.dtype, "v_local", groups=dh)
        res = self.table_res
        res2 = -(-res // 2)
        n_off, idx = _efv2_bias(res, res2, 2)
        biases = self.param("attention_biases", nn.initializers.zeros, (self.heads, n_off), jnp.float32)
        if H == res and W == res:
            ab = biases[:, idx]
        else:
            n2, idx2 = _efv2_bias(max(H, W), -(-max(H, W) // 2), 2)
            idx2 = jnp.clip(jnp.asarray(idx2), 0, n_off - 1)
            ab = biases[:, idx2].reshape(self.heads, (-(-max(H, W) // 2)) ** 2, max(H, W) ** 2)
            ab = ab[:, : H2 * W2, : H * W]
        qf = q.transpose(0, 3, 1, 2).reshape(B, self.heads, self.key_dim, H2 * W2).transpose(0, 1, 3, 2)
        kf = k.transpose(0, 3, 1, 2).reshape(B, self.heads, self.key_dim, H * W)
        vf = v.transpose(0, 3, 1, 2).reshape(B, self.heads, d, H * W).transpose(0, 1, 3, 2)
        attn = jax.nn.softmax(qf @ kf * self.key_dim**-0.5 + ab.astype(qf.dtype), axis=-1)
        out = (attn @ vf).transpose(0, 1, 3, 2).reshape(B, dh, H2, W2).transpose(0, 2, 3, 1) + v_local
        out = jax.nn.gelu(out, approximate=False)
        return _efv2_cbn(out, self.out_dim, 1, 1, 0, train, self.dtype, "proj")


class _EFv2Mlp(nn.Module):
    """Mlp with mid dw conv (EfficientFormerV2.py:343)."""

    dim: int
    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _bare_conv_bias(x, self.hidden, 1, self.dtype, "fc1")
        y = _bn(y, train, self.dtype, "norm1")
        y = jax.nn.gelu(y, approximate=False)
        m = _bare_conv_bias(y, self.hidden, 3, self.dtype, "mid", g=self.hidden)
        m = _bn(m, train, self.dtype, "mid_norm")
        y = jax.nn.gelu(m, approximate=False)
        y = _bare_conv_bias(y, self.dim, 1, self.dtype, "fc2")
        return _bn(y, train, self.dtype, "norm2")


def _bare_conv_bias(x, out, k, dtype, name, g=1):
    return nn.Conv(out, (k, k), padding=[(k // 2, k // 2)] * 2, feature_group_count=g,
                   use_bias=True, dtype=dtype, param_dtype=jnp.float32, name=name)(x)


class EfficientFormerV2(nn.Module):
    """EfficientFormerV2 (EfficientFormerV2.py:489, fork_feat): conv stem to
    /4, four stages of FFN/AttnFFN meta blocks (the last vit_num of stages
    3-4 carry Attention4D mixers), attention-assisted downsampling between
    the later stages, BN on each forked level."""

    variant: str = "s0"
    base_res: int = 640  # the reference builds its bias tables at 640
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return EFV2_CFGS[variant][0]

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths, vit_num, eratios = EFV2_CFGS[self.variant]
        y = _efv2_cbn(x, dims[0] // 2, 3, 2, 1, train, self.dtype, "stem0")
        y = jax.nn.gelu(y, approximate=False)
        y = _efv2_cbn(y, dims[0], 3, 2, 1, train, self.dtype, "stem1")
        y = jax.nn.gelu(y, approximate=False)
        outs = []
        for i in range(4):
            res_i = -(-self.base_res // (2 ** (i + 2)))
            for b in range(depths[i]):
                mlp_ratio = eratios[i][b]
                ls1 = None
                if i >= 2 and b > depths[i] - 1 - vit_num:
                    stride = 2 if i == 2 else 0
                    ls1 = self.param(f"s{i}_b{b}_ls1", nn.initializers.constant(1e-5), (dims[i],), jnp.float32)
                    att = _EFv2Attention4D(dims[i], res_i, stride=stride, dtype=self.dtype,
                                           name=f"s{i}_b{b}_attn")(y, train)
                    y = y + ls1.astype(y.dtype) * att
                ls2 = self.param(f"s{i}_b{b}_ls2", nn.initializers.constant(1e-5), (dims[i],), jnp.float32)
                mlp = _EFv2Mlp(dims[i], int(dims[i] * mlp_ratio), dtype=self.dtype,
                               name=f"s{i}_b{b}_mlp")(y, train)
                y = y + ls2.astype(y.dtype) * mlp
            outs.append(_bn(y, train, self.dtype, f"norm{2 * i}"))
            if i < 3:
                conv = _efv2_cbn(y, dims[i + 1], 3, 2, 1, train, self.dtype, f"down{i}_conv")
                if i >= 2:
                    attn = _EFv2AttnDownsample(dims[i + 1], res_i, dtype=self.dtype,
                                               name=f"down{i}_attn")(y, train)
                    y = conv + attn
                else:
                    y = conv
        return tuple(outs)



class _RevColLevel(nn.Module):
    """RevCol Level (revcol.py:186): fusion (stride-2 down + nearest up) and
    a chain of C2f/C3 blocks."""

    level: int
    channels: Tuple[int, ...]
    layers: Tuple[int, ...]
    kernel: str = "C2f"
    first_col: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c_down, c_up, train: bool = False):
        from experiment_yolo_tpu.nn.modules import C2f, C3, ConvBN

        ch = self.channels[self.level]
        if self.level > 0:
            down = ConvBN(ch, 2, 2, p=0, act=False, dtype=self.dtype, name="down")(c_down, train)
        else:
            down = c_down
        if self.first_col or self.level == 3:
            x = down
        else:
            up = ConvBN(ch, 1, 1, dtype=self.dtype, name="up")(c_up, train)
            b, h, w, c = up.shape
            up = jax.image.resize(up, (b, h * 2, w * 2, c), "nearest")
            x = up + down
        cls = {"C2f": C2f, "C3": C3}[self.kernel]
        for i in range(self.layers[self.level]):
            x = cls(ch, n=1, dtype=self.dtype, name=f"blocks{i}")(x, train)
        return x


class RevCol(nn.Module):
    """RevCol (revcol.py:252): multi-column reversible network. The
    reference's custom ReverseFunction is a hand-written activation-recompute
    autograd; here each subnet column is wrapped in jax.checkpoint (remat),
    which gives the same memory/recompute trade under XLA with the plain
    functional forward (_forward_nonreverse semantics, revcol.py:221)."""

    kernel: str = "C2f"
    chans: Tuple[int, ...] = (32, 64, 96, 128)
    layers: Tuple[int, ...] = (2, 3, 6, 3)
    num_subnet: int = 5
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant=None, chans=(32, 64, 96, 128)):
        return tuple(chans)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from experiment_yolo_tpu.nn.modules import ConvBN

        x = ConvBN(self.chans[0], 4, 4, p=0, dtype=self.dtype, name="stem")(x, train)
        c0 = c1 = c2 = c3 = None
        for i in range(self.num_subnet):
            first = i == 0
            alphas = [self.param(f"subnet{i}_alpha{l}", nn.initializers.constant(0.5),
                                 (self.chans[l],), jnp.float32) for l in range(4)]
            # runtime |alpha| >= 1e-3 clamp (revcol.py:246)
            alphas = [jnp.sign(a) * jnp.maximum(jnp.abs(a), 1e-3) for a in alphas]
            lv = [
                _RevColLevel(l, self.chans, self.layers, self.kernel, first,
                             dtype=self.dtype, name=f"subnet{i}_level{l}")
                for l in range(4)
            ]
            n0 = lv[0](x, c1, train) + (0 if first else alphas[0].astype(x.dtype) * c0)
            n1 = lv[1](n0, c2, train) + (0 if first else alphas[1].astype(x.dtype) * c1)
            n2 = lv[2](n1, c3, train) + (0 if first else alphas[2].astype(x.dtype) * c2)
            n3 = lv[3](n2, None, train) + (0 if first else alphas[3].astype(x.dtype) * c3)
            c0, c1, c2, c3 = n0, n1, n2, n3
        return (c0, c1, c2, c3)



# --------------------------------------------------------------------------
# TransNeXt — reference nn/backbone/TransNeXt/TransNext_native.py
# --------------------------------------------------------------------------

TRANSNEXT_CFGS = {  # dims, heads, mlp_ratios, depths
    "micro": ((48, 96, 192, 384), (2, 4, 8, 16), (8, 8, 4, 4), (2, 2, 15, 2)),
    "tiny": ((72, 144, 288, 576), (3, 6, 12, 24), (8, 8, 4, 4), (2, 2, 15, 2)),
    "small": ((72, 144, 288, 576), (3, 6, 12, 24), (8, 8, 4, 4), (5, 5, 22, 5)),
    "base": ((96, 192, 384, 768), (4, 8, 16, 32), (8, 8, 4, 4), (5, 5, 23, 5)),
}


def _cpb_table(qh, qw, kh, kw):
    """get_relative_position_cpb (TransNext_native.py:47) in numpy: unique
    log-scaled relative offsets between the query grid and the pooled key
    grid, plus the (Nq*Nk,) index map."""
    import numpy as np

    def adaptive_1d(n, k):
        src = np.arange(n, dtype=np.float32)
        return np.array([src[(i * n) // k: -((-(i + 1) * n) // k)].mean() for i in range(k)],
                        np.float32)

    akh, akw = adaptive_1d(qh, kh), adaptive_1d(qw, kw)
    kyy, kxx = np.meshgrid(akh, akw, indexing="ij")
    qyy, qxx = np.meshgrid(np.arange(qh, dtype=np.float32), np.arange(qw, dtype=np.float32),
                           indexing="ij")
    rh = (qyy.reshape(-1)[:, None] - kyy.reshape(-1)[None, :]) / max(qh - 1, 1) * 8
    rw = (qxx.reshape(-1)[:, None] - kxx.reshape(-1)[None, :]) / max(qw - 1, 1) * 8
    rel = np.stack([rh, rw], -1).reshape(-1, 2)
    table, idx = np.unique(rel, axis=0, return_inverse=True)
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
    return table.astype(np.float32), idx.astype(np.int32)


def _local_mask(h, w, ws):
    """get_seqlen_and_mask (TransNext_native.py:74): per-position count of
    valid window taps and the out-of-bounds mask (N, ws*ws)."""
    import numpy as np

    pad = ws // 2
    ok = np.zeros((h, w, ws * ws), bool)
    for i, (dy, dx) in enumerate([(a, b) for a in range(ws) for b in range(ws)]):
        yy = np.arange(h) + dy - pad
        xx = np.arange(w) + dx - pad
        ok[:, :, i] = ((yy >= 0) & (yy < h))[:, None] & ((xx >= 0) & (xx < w))[None, :]
    ok = ok.reshape(h * w, ws * ws)
    return ok.sum(-1).astype(np.float32), ~ok


class _TNAggregatedAttention(nn.Module):
    """AggregatedAttention (TransNext_native.py:80): L2-normalized queries
    with a learned query embedding and softplus temperature attend jointly
    over a 3x3 local unfold and a pooled global sequence under one softmax,
    with continuous (MLP) relative position bias on the pooled half and a
    learnable dynamic bias on the local half."""

    dim: int
    heads: int
    sr_ratio: int
    window: int = 3
    dtype: Dtype = jnp.float32

    def _dense(self, c, name, bias=True):
        return nn.Dense(c, use_bias=bias, dtype=self.dtype, param_dtype=jnp.float32, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):  # x (B, H, W, C)
        import numpy as np

        B, H, W, C = x.shape
        nh, hd = self.heads, C // self.heads
        ws = self.window
        L = ws * ws
        ph, pw = H // self.sr_ratio, W // self.sr_ratio
        pool_len = ph * pw
        seq_valid, pad_mask = _local_mask(H, W, ws)
        seq_scale = jnp.asarray(np.log(seq_valid + pool_len), jnp.float32)  # (N,)
        table, idx = _cpb_table(H, W, ph, pw)

        temp = self.param("temperature", lambda *_: jnp.full((nh, 1, 1), float(np.log(np.expm1(1 / 0.24)))),
                          (nh, 1, 1))
        qemb = self.param("query_embedding", nn.initializers.normal(0.02), (nh, 1, hd), jnp.float32)
        rpb_local = self.param("relative_pos_bias_local", nn.initializers.normal(0.0004), (nh, L), jnp.float32)
        ltok = self.param("learnable_tokens", nn.initializers.normal(0.02), (nh, hd, L), jnp.float32)
        lbias = self.param("learnable_bias", nn.initializers.zeros, (nh, 1, L), jnp.float32)

        N = H * W
        xt = x.reshape(B, N, C)
        q = self._dense(C, "q")(xt).reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        qn = q * jax.lax.rsqrt((q * q).sum(-1, keepdims=True) + 1e-12)
        qs = (qn + qemb.astype(qn.dtype)) * jax.nn.softplus(temp).astype(qn.dtype) \
            * seq_scale.astype(qn.dtype)[None, None, :, None]
        kv_dense = self._dense(2 * C, "kv")
        kv = kv_dense(xt)
        k_loc, v_loc = kv[..., :C], kv[..., C:]
        k_loc = k_loc.reshape(B, N, nh, hd)
        k_loc = k_loc * jax.lax.rsqrt((k_loc * k_loc).sum(-1, keepdims=True) + 1e-12)
        k_map = k_loc.reshape(B, H, W, C)
        v_map = v_loc.reshape(B, H, W, C)
        pad = ws // 2
        kp = jnp.pad(k_map, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        vp = jnp.pad(v_map, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        k_win = jnp.stack([kp[:, dy:dy + H, dx:dx + W] for dy in range(ws) for dx in range(ws)], 3)
        v_win = jnp.stack([vp[:, dy:dy + H, dx:dx + W] for dy in range(ws) for dx in range(ws)], 3)
        k_win = k_win.reshape(B, N, L, nh, hd).transpose(0, 3, 1, 2, 4)  # (B,nh,N,L,hd)
        v_win = v_win.reshape(B, N, L, nh, hd).transpose(0, 3, 1, 2, 4)
        attn_local = jnp.einsum("bhnd,bhnld->bhnl", qs, k_win) + rpb_local.astype(qs.dtype)[None, :, None]
        attn_local = jnp.where(jnp.asarray(pad_mask)[None, None], -jnp.inf, attn_local)

        # pooled branch: 1x1 sr conv + GELU + adaptive pool + LN
        sp = _bare_conv_bias(x, C, 1, self.dtype, "sr")
        sp = _adaptive_pool_nhwc(jax.nn.gelu(sp, approximate=False), ph, pw)
        sp = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm")(
            sp.reshape(B, pool_len, C))
        kv_pool = kv_dense(sp).reshape(B, pool_len, 2 * nh, hd).transpose(0, 2, 1, 3)
        k_pool, v_pool = kv_pool[:, :nh], kv_pool[:, nh:]
        k_pool = k_pool * jax.lax.rsqrt((k_pool * k_pool).sum(-1, keepdims=True) + 1e-12)
        cpb = self._dense(nh, "cpb_fc2")(jax.nn.relu(self._dense(512, "cpb_fc1")(
            jnp.asarray(table))))  # (n_off, nh)
        pool_bias = cpb.T[:, jnp.asarray(idx)].reshape(nh, N, pool_len)
        attn_pool = qs @ k_pool.transpose(0, 1, 3, 2) + pool_bias.astype(qs.dtype)[None]

        attn = jax.nn.softmax(jnp.concatenate([attn_local, attn_pool], -1), axis=-1)
        a_loc, a_pool = attn[..., :L], attn[..., L:]
        dyn = jnp.einsum("bhnd,hdl->bhnl", qn, ltok.astype(qn.dtype)) + lbias.astype(qn.dtype)[None, :, None].reshape(1, nh, 1, L)
        x_local = jnp.einsum("bhnl,bhnld->bhnd", a_loc + dyn, v_win)
        x_pool = a_pool @ v_pool
        out = (x_local + x_pool).transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return self._dense(C, "proj")(out)


def _adaptive_pool_nhwc(x, oh, ow):
    from experiment_yolo_tpu.nn.extra_modules import _adaptive_avg_pool

    return _adaptive_avg_pool(x, oh, ow)


class _TNAttention(nn.Module):
    """Full attention with cosine qk + cpb bias (TransNext_native.py:188)."""

    dim: int
    heads: int
    dtype: Dtype = jnp.float32

    def _dense(self, c, name):
        return nn.Dense(c, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        import numpy as np

        B, H, W, C = x.shape
        nh, hd = self.heads, C // self.heads
        N = H * W
        table, idx = _cpb_table(H, W, H, W)
        temp = self.param("temperature", lambda *_: jnp.full((nh, 1, 1), float(np.log(np.expm1(1 / 0.24)))),
                          (nh, 1, 1))
        qemb = self.param("query_embedding", nn.initializers.normal(0.02), (nh, 1, hd), jnp.float32)
        xt = x.reshape(B, N, C)
        qkv = self._dense(3 * C, "qkv")(xt).reshape(B, N, 3 * nh, hd).transpose(0, 2, 1, 3)
        q, k, v = qkv[:, :nh], qkv[:, nh:2 * nh], qkv[:, 2 * nh:]
        qn = q * jax.lax.rsqrt((q * q).sum(-1, keepdims=True) + 1e-12)
        kn = k * jax.lax.rsqrt((k * k).sum(-1, keepdims=True) + 1e-12)
        cpb = self._dense(nh, "cpb_fc2")(jax.nn.relu(self._dense(512, "cpb_fc1")(jnp.asarray(table))))
        bias = cpb.T[:, jnp.asarray(idx)].reshape(nh, N, N)
        scale = jax.nn.softplus(temp).astype(qn.dtype) * jnp.float32(np.log(N)).astype(qn.dtype)
        attn = ((qn + qemb.astype(qn.dtype)) * scale) @ kn.transpose(0, 1, 3, 2) + bias.astype(qn.dtype)[None]
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, C)
        return self._dense(C, "proj")(out)


class _TNBlock(nn.Module):
    """TransNeXt Block (TransNext_native.py:233): attention + conv GLU."""

    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x)
        if self.sr_ratio == 1:
            y = _TNAttention(self.dim, self.heads, dtype=self.dtype, name="attn")(y, train)
        else:
            y = _TNAggregatedAttention(self.dim, self.heads, self.sr_ratio,
                                       dtype=self.dtype, name="attn")(y, train)
        x = x + y
        z = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x)
        hidden = int(2 * int(self.dim * self.mlp_ratio) / 3)
        g = nn.Dense(hidden * 2, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc1")(z)
        a, v = g[..., :hidden], g[..., hidden:]
        a = nn.Conv(hidden, (3, 3), padding=[(1, 1)] * 2, feature_group_count=hidden, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, name="mlp_dwconv")(a)
        a = jax.nn.gelu(a, approximate=False) * v
        z = nn.Dense(self.dim, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_fc2")(a)
        return x + z


class TransNeXt(nn.Module):
    """TransNeXt (TransNext_native.py:295): overlap patch embeds + four
    stages of aggregated/full attention blocks with convolutional GLU FFNs;
    features at /4, /8, /16, /32."""

    variant: str = "micro"
    dtype: Dtype = jnp.float32

    @staticmethod
    def channels(variant: str):
        return TRANSNEXT_CFGS[variant][0]

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, heads, mlps, depths = TRANSNEXT_CFGS[self.variant]
        srs = (8, 4, 2, 1)
        feats = []
        y = x
        for i in range(4):
            k = 7 if i == 0 else 3
            s = 4 if i == 0 else 2
            y = nn.Conv(dims[i], (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
                        use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"patch_embed{i + 1}")(y)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"embed_norm{i + 1}")(y)
            for j in range(depths[i]):
                y = _TNBlock(dims[i], heads[i], srs[i], mlps[i], dtype=self.dtype,
                             name=f"s{i}_b{j}")(y, train)
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"norm{i + 1}")(y)
            feats.append(y)
        return tuple(feats)


WHOLE_BACKBONES.update({
    "vanillanet_11": (VanillaNet, "11"),
    "vanillanet_12": (VanillaNet, "12"),
    "vanillanet_13": (VanillaNet, "13"),
    "vanillanet_13_x1_5": (VanillaNet, "13_x1_5"),
    "unireplknet_b": (UniRepLKNet, "b"),
    "unireplknet_l": (UniRepLKNet, "l"),
    "unireplknet_xl": (UniRepLKNet, "xl"),
    "convnextv2_base": (ConvNeXtV2, "base"),
    "convnextv2_large": (ConvNeXtV2, "large"),
    "convnextv2_huge": (ConvNeXtV2, "huge"),
    "transnext_micro": (TransNeXt, "micro"),
    "transnext_tiny": (TransNeXt, "tiny"),
    "transnext_small": (TransNeXt, "small"),
    "transnext_base": (TransNeXt, "base"),
    "efficientformerv2_s0": (EfficientFormerV2, "s0"),
    "efficientformerv2_s1": (EfficientFormerV2, "s1"),
    "efficientformerv2_s2": (EfficientFormerV2, "s2"),
    "efficientformerv2_l": (EfficientFormerV2, "l"),
    # reference-style function names resolve to the variant classes
    "convnextv2_atto": (ConvNeXtV2, "atto"),
    "convnextv2_femto": (ConvNeXtV2, "femto"),
    "convnextv2_pico": (ConvNeXtV2, "pico"),
    "convnextv2_nano": (ConvNeXtV2, "nano"),
    "convnextv2_tiny": (ConvNeXtV2, "tiny"),
    "fasternet_t0": (FasterNet, "t0"),
    "fasternet_t1": (FasterNet, "t1"),
    "fasternet_t2": (FasterNet, "t2"),
    "fasternet_s": (FasterNet, "s"),
    "fasternet_m": (FasterNet, "m"),
    "fasternet_l": (FasterNet, "l"),
    "PKINET_T": (PKINet, "t"),
    "PKINET_S": (PKINet, "s"),
    "PKINET_B": (PKINet, "b"),
    "CSWin_tiny": (CSWin, "tiny"),
    "CSWin_small": (CSWin, "small"),
    "CSWin_base": (CSWin, "base"),
    "CSWin_large": (CSWin, "large"),
})
