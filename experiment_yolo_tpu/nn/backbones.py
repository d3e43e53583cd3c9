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
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
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
