"""DCNv3 deformable sampling core + module — pure jnp.

Rebuild of the reference's DCNv3 CUDA extension
(``nn/extra_modules/ops_dcnv3/``: im2col kernels + ``dcnv3_core_pytorch``
fallback). The core is grouped bilinear sampling at offset-deformed kernel
taps with a softmax modulation mask — expressed as one fused XLA program
(gathers + weighted sums), equivalence-tested against the reference's
pure-torch fallback in tests/test_dcnv3.py.

Layout: channels-last throughout (the reference's DCNv3 is also NHWC).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from experiment_yolo_tpu.nn.transformer import _bilinear_sample_zeros

Dtype = Any


def dcnv3_core(
    x: jnp.ndarray,  # (B, H, W, g*gc) channels-last input (pre-padding)
    offset: jnp.ndarray,  # (B, Ho, Wo, g*P*2)
    mask: jnp.ndarray,  # (B, Ho, Wo, g*P), already softmaxed over P
    kernel: int = 3,
    stride: int = 1,
    pad: int = 1,
    dilation: int = 1,
    group: int = 1,
    offset_scale: float = 1.0,
) -> jnp.ndarray:
    """Deformable grouped sampling (dcnv3_func.py:dcnv3_core_pytorch)."""
    b, h, w, c = x.shape
    gc = c // group
    p = kernel * kernel
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    ho, wo = offset.shape[1:3]

    # reference points: output centers in normalized padded coords
    base = (dilation * (kernel - 1)) // 2 + 0.5
    ref_y = (base + jnp.arange(ho, dtype=jnp.float32) * stride) / hp
    ref_x = (base + jnp.arange(wo, dtype=jnp.float32) * stride) / wp
    ref = jnp.stack(jnp.meshgrid(ref_x, ref_y, indexing="xy"), -1)  # (Ho, Wo, 2) (x, y)

    # dilation grid: kernel tap offsets, normalized; tap order (x-major like
    # torch.meshgrid(x, y) flatten)
    lin_w = -((dilation * (kernel - 1)) // 2) + jnp.arange(kernel, dtype=jnp.float32) * dilation
    gx, gy = jnp.meshgrid(lin_w, lin_w, indexing="ij")  # torch meshgrid(x, y)
    grid = jnp.stack([gx.reshape(-1) / wp, gy.reshape(-1) / hp], -1)  # (P, 2)

    loc = ref[None, :, :, None, None] + grid[None, None, None, None] * offset_scale  # (1,Ho,Wo,1,P,2)
    loc = jnp.broadcast_to(loc, (b, ho, wo, group, p, 2)).reshape(b, ho, wo, group * p, 2)
    spatial_norm = jnp.asarray([wp, hp], jnp.float32)
    loc = loc + offset.reshape(b, ho, wo, group * p, 2) * offset_scale / spatial_norm

    # per-group bilinear sampling (normalized [0,1] coords, zero padding)
    xg = xp.reshape(b, hp, wp, group, gc).transpose(0, 3, 1, 2, 4).reshape(b * group, hp, wp, gc)
    locg = loc.reshape(b, ho * wo, group, p, 2).transpose(0, 2, 1, 3, 4).reshape(b * group, ho * wo * p, 2)
    sampled = _bilinear_sample_zeros(xg, locg).reshape(b, group, ho * wo, p, gc)
    m = mask.reshape(b, ho * wo, group, p).transpose(0, 2, 1, 3)[..., None]  # (B,g,HoWo,P,1)
    out = (sampled * m).sum(3)  # (B, g, HoWo, gc)
    return out.transpose(0, 2, 1, 3).reshape(b, ho, wo, group * gc)


def dcnv2_core(
    x: jnp.ndarray,  # (B, H, W, C) channels-last
    offset: jnp.ndarray,  # (B, Ho, Wo, 2*K) per-tap (dy, dx) interleaved
    mask: jnp.ndarray,  # (B, Ho, Wo, K) sigmoided modulation
    weight: jnp.ndarray,  # (kh, kw, C, Cout)
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    pad: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """Modulated deformable conv v2 (mmcv ModulatedDeformConv2d semantics,
    the reference's DyDCNv2 backend — extra block.py:57): sample the input
    at each kernel tap's offset location, modulate by the sigmoid mask, and
    contract with the conv weights. Gather + one MXU matmul here instead of
    the CUDA im2col kernel."""
    b, h, w, c = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    hp, wp = h + 2 * pad, w + 2 * pad
    ho, wo = offset.shape[1:3]

    # tap base positions in padded pixel coords (row-major taps, mmcv order)
    oy = jnp.arange(ho, dtype=jnp.float32) * stride
    ox = jnp.arange(wo, dtype=jnp.float32) * stride
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation
    tap_dy = jnp.repeat(ky, kw)  # (K,)
    tap_dx = jnp.tile(kx, kh)  # (K,)
    off = offset.reshape(b, ho, wo, k, 2)
    loc_y = (oy[:, None] + tap_dy[None, :])[None, :, None, :] + off[..., 0]  # (B,Ho,Wo,K)
    loc_x = (ox[:, None] + tap_dx[None, :])[None, None, :, :] + off[..., 1]
    # normalized [0,1] coords over the padded map ((x, y) order)
    loc = jnp.stack([(loc_x + 0.5) / wp, (loc_y + 0.5) / hp], -1)  # (B,Ho,Wo,K,2)
    loc = jnp.broadcast_to(loc, (b, ho, wo, k, 2)).reshape(b, ho * wo * k, 2)

    sampled = _bilinear_sample_zeros(xp, loc).reshape(b, ho, wo, k, c)
    sampled = sampled * mask.reshape(b, ho, wo, k, 1)
    if groups == 1:
        out = jnp.einsum("bhwkc,kco->bhwo", sampled, weight.reshape(k, c, cout))
    else:
        # grouped conv: weight (kh, kw, c//groups, cout), flax layout
        cg, og = c // groups, cout // groups
        sg = sampled.reshape(b, ho, wo, k, groups, cg)
        wg = weight.reshape(k, cg, groups, og)
        out = jnp.einsum("bhwkgc,kcgo->bhwgo", sg, wg).reshape(b, ho, wo, cout)
    if bias is not None:
        out = out + bias
    return out


class ModulatedDeformConv(nn.Module):
    """DCNv2 layer with its own conv weights (offsets/mask supplied by the
    caller — the DyHead pattern)."""

    c2: int
    k: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset, mask):
        c1 = x.shape[-1]
        weight = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (self.k, self.k, c1, self.c2), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.c2,), jnp.float32) if self.use_bias else None
        return dcnv2_core(
            x.astype(self.dtype), offset.astype(jnp.float32), mask.astype(self.dtype),
            weight.astype(self.dtype), None if bias is None else bias.astype(self.dtype),
            stride=self.stride, pad=self.k // 2,
        )


class DyDCNv2(nn.Module):
    """DyDCNv2 (reference extra block.py:179): ModulatedDeformConv2d +
    GroupNorm(16), offsets/mask computed by the caller from mid-level
    features (the DyHead/TADDH alignment pattern)."""

    c2: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, offset, mask):
        y = ModulatedDeformConv(self.c2, 3, stride=self.stride, dtype=self.dtype, name="conv")(x, offset, mask)
        return nn.GroupNorm(num_groups=16, dtype=self.dtype, param_dtype=jnp.float32, name="gn")(y)


class DCNv4(nn.Module):
    """DCNv4 block (reference DCNv4_op/DCNv4/modules/dcnv4.py): like DCNv3
    but with UNNORMALIZED aggregation weights (no softmax over the taps —
    the v4 paper's main change) and a fused offset+mask head."""

    channels: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 4
    offset_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel * self.kernel
        y = nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32, name="value_proj")(x)
        ctx = nn.Conv(
            self.channels, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2, feature_group_count=self.channels,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="dw_conv",
        )(y)
        ctx = jax.nn.gelu(nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="dw_norm")(ctx))
        om = nn.Dense(self.group * p * 3, kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, param_dtype=jnp.float32, name="offset_mask")(ctx)
        b, ho, wo, _ = om.shape
        om = om.reshape(b, ho, wo, self.group, p, 3)
        offset = om[..., :2].reshape(b, ho, wo, self.group * p * 2)
        mask = om[..., 2].reshape(b, ho, wo, self.group * p)  # raw, no softmax
        out = dcnv3_core(
            y, offset, mask, self.kernel, self.stride, self.pad, self.dilation,
            self.group, self.offset_scale,
        )
        return nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32, name="output_proj")(out)


class DCNv3(nn.Module):
    """DCNv3 block (reference ops_dcnv3/modules/dcnv3.py): depthwise context
    conv -> offset/mask heads -> deformable core -> output projection."""

    channels: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    group: int = 4
    offset_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        p = self.kernel * self.kernel
        y = nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32, name="input_proj")(x)
        ctx = nn.Conv(
            self.channels, (self.kernel, self.kernel), strides=(self.stride, self.stride),
            padding=[(self.pad, self.pad)] * 2, feature_group_count=self.channels,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="dw_conv",
        )(y)
        ctx = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="dw_norm")(ctx)
        ctx = jax.nn.gelu(ctx)
        offset = nn.Dense(self.group * p * 2, kernel_init=nn.initializers.zeros,
                          dtype=self.dtype, param_dtype=jnp.float32, name="offset")(ctx)
        mask = nn.Dense(self.group * p, kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, param_dtype=jnp.float32, name="mask")(ctx)
        mask = jax.nn.softmax(mask.reshape(*mask.shape[:-1], self.group, p), -1).reshape(mask.shape)
        out = dcnv3_core(
            y, offset, mask, self.kernel, self.stride, self.pad, self.dilation,
            self.group, self.offset_scale,
        )
        return nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32, name="output_proj")(out)
