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
