"""Core NN modules (flax.linen, NHWC, TPU-first).

Rebuild of the reference's module library (``ultralytics/nn/modules/conv.py``,
``block.py``, ``head.py`` and the DEAL additions in
``nn/extra_modules/block.py:3402-3547``) as functional flax modules:

- NHWC layout everywhere (TPU-native; the reference is NCHW).
- Explicit symmetric padding (k//2) matching torch's Conv2d arithmetic, so
  feature-map shapes line up with the reference for stride-2 downsampling.
- BatchNorm momentum 0.97 / eps 1e-3 (torch momentum 0.03 as in Ultralytics).
  In inference mode BN is a constant scale+shift which XLA fuses into the
  convolution epilogue, so a separate conv+BN "fuse" pass (reference
  ``torch_utils.py:171``) is unnecessary on TPU.
- Every module takes ``(x, train: bool)``; modules that consume several graph
  nodes (Concat, Zoom_cat, ScalSeq, Add, Detect, ...) take a list.

Compute dtype is configurable (bf16 for MXU-friendly training/inference);
params stay fp32.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from experiment_yolo_tpu.nn.norm import BatchNorm as MemBatchNorm

Dtype = Any


def autopad(k: int, p: Optional[int] = None, d: int = 1) -> int:
    """'same'-shape padding for odd kernels (reference: conv.py:autopad)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


def _act(name, x):
    if name in (True, "silu"):
        return jax.nn.silu(x)
    if name in (False, None, "identity"):
        return x
    if name == "relu":
        return jax.nn.relu(x)
    if name == "leaky_relu_0.1":
        return jax.nn.leaky_relu(x, 0.1)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    raise ValueError(f"unknown activation {name!r}")


def _s2d_stride2_conv(x, kernel, dtype):
    """Exact k=3/s=2/p=1 conv computed on a space-to-depth input.

    TPU's vector lanes pad the channel dim to 128, so a 640x640x3 or
    x16 stride-2 conv wastes ~40x/8x of its bandwidth. Packing 2x2 pixel
    blocks into channels quarters the padded traffic; the k3/s2/p1 conv is
    algebraically a k2/s1 conv on the packed image with the 3x3 kernel
    scattered into (block, in-block) tap positions:
        row index u = 2i + ky - 1 = 2(i + by) + dy  =>  ky -> (by+1, dy):
        0 -> (0, 1), 1 -> (1, 0), 2 -> (1, 1); tap (0, 0) is never read.
    Same parameters, identical output (tested to fp tolerance).
    """
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, h // 2, w // 2, 4 * c)  # channel = (dy, dx, c)
    kh = jnp.zeros((2, 2, 3, kernel.shape[2], kernel.shape[3]), kernel.dtype)
    # scatter rows: (ky2, dy) <- ky
    kh = kh.at[0, 1].set(kernel[0])  # ky=0 -> block -1, dy=1
    kh = kh.at[1, 0].set(kernel[1])  # ky=1 -> block 0, dy=0
    kh = kh.at[1, 1].set(kernel[2])  # ky=2 -> block 0, dy=1
    k2 = jnp.zeros((2, 2, 2, 2, kernel.shape[2], kernel.shape[3]), kernel.dtype)
    k2 = k2.at[:, 0, :, 1].set(kh[:, :, 0])  # kx=0 -> block -1, dx=1
    k2 = k2.at[:, 1, :, 0].set(kh[:, :, 1])  # kx=1 -> block 0, dx=0
    k2 = k2.at[:, 1, :, 1].set(kh[:, :, 2])  # kx=2 -> block 0, dx=1
    # (ky2, kx2, dy, dx, c, o) -> (ky2, kx2, 4c, o), channel order (dy, dx, c)
    k2 = k2.transpose(0, 1, 2, 3, 4, 5).reshape(2, 2, 4 * kernel.shape[2], kernel.shape[3])
    return jax.lax.conv_general_dilated(
        y.astype(dtype),
        k2.astype(dtype),
        window_strides=(1, 1),
        padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation — the reference's ``Conv``.

    Reference: ultralytics/nn/modules/conv.py:Conv (default_act = SiLU).
    Small-channel stride-2 3x3 convs take the space-to-depth fast path
    (see ``_s2d_stride2_conv``) — same parameters, identical math.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: Optional[int] = None
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        # NOTE: a space-to-depth fast path for small-channel stride-2 convs
        # (_s2d_stride2_conv) was measured SLOWER in-graph: the packing
        # transpose costs 2.5 ms/batch32@640 vs 1.0 ms for the whole plain
        # conv. It wins only if the input pipeline delivers pre-packed
        # blocks; kept for that future use.
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        # activation fused into the BN custom-vjp: neither BN nor the act
        # saves an extra activation-sized residual (norm.py)
        return MemBatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            act=self.act,
            name="bn",
        )(x)


class DWConv(ConvBN):
    """Depthwise conv: groups = c2 (inputs must have c1 == c2 multiples)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=g,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        return MemBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, param_dtype=jnp.float32, act=self.act, name="bn",
        )(x)


class Focus(nn.Module):
    """Space-to-depth (2x2) then conv (reference: conv.py:Focus)."""

    c2: int
    k: int = 1
    s: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        return ConvBN(self.c2, self.k, self.s, act=self.act, dtype=self.dtype, name="conv")(x, train)


class GhostConv(nn.Module):
    """Ghost convolution (reference: conv.py:GhostConv)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBN(c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype, name="cv1")(x, train)
        y2 = ConvBN(c_, 5, 1, None, c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class Bottleneck(nn.Module):
    """Standard YOLO bottleneck (reference: block.py:Bottleneck)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C2f(nn.Module):
    """CSP bottleneck with 2 convs, fast (reference: block.py:C2f).

    cv1 -> split in two -> chain n bottlenecks on the running tail ->
    concat everything -> cv2.
    """

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype, name=f"m{i}")(ys[-1], train)
            )
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference: block.py:C3)."""

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
            y1 = Bottleneck(c_, self.shortcut, self.g, k=(1, 3), e=1.0, dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([y1, y2], -1), train)


def _max_pool_same(x, k):
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=[(p, p), (p, p)])


class SPPF(nn.Module):
    """Spatial pyramid pooling, fast (reference: block.py:SPPF)."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        y1 = _max_pool_same(y, self.k)
        y2 = _max_pool_same(y1, self.k)
        y3 = _max_pool_same(y2, self.k)
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([y, y1, y2, y3], -1), train)


class SPP(nn.Module):
    """Spatial pyramid pooling (reference: block.py:SPP)."""

    c2: int
    k: Tuple[int, ...] = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y] + [_max_pool_same(y, k) for k in self.k]
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class Upsample(nn.Module):
    """Nearest-neighbour 2x upsample (the configs' ``nn.Upsample``)."""

    scale: int = 2
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.mode == "nearest", "only nearest upsampling is used by the configs"
        return _nearest_upsample(x, self.scale, self.scale)


class Concat(nn.Module):
    """Channel concat of a list of feature maps (reference: conv.py:Concat)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return jnp.concatenate(xs, axis=-1)


class Silence(nn.Module):
    """Identity passthrough (v9 input anchor; reference extra_modules/block.py:4721)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class Add(nn.Module):
    """Elementwise sum of a list (DEAL ASF fusion; reference block.py:3479)."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        out = xs[0]
        for x in xs[1:]:
            out = out + x
        return out


class SPDConv(nn.Module):
    """Space-to-depth conv for small objects (reference: block.py:2497)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2], x[:, 1::2, ::2], x[:, ::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        return ConvBN(self.c2, 3, 1, dtype=self.dtype, name="conv")(x, train)


# ---------------------------------------------------------------------------
# DEAL-YOLO: LDConv (Linear Deformable Convolution)
# ---------------------------------------------------------------------------


def _ldconv_grid_pts(num_param: int) -> list:
    """Static python-int grid points behind ldconv_sample_grid."""
    base = round(math.sqrt(num_param))
    rows = num_param // base
    rem = num_param % base
    pts = [(r, c) for r in range(rows) for c in range(base)]
    pts += [(rows, c) for c in range(rem)]
    return pts


def ldconv_sample_grid(num_param: int) -> jnp.ndarray:
    """Initial sampling offsets p_n for N sampling points (reference conv.py:414).

    Row-major grid of round(sqrt(N)) columns plus a remainder row.
    Returns (N, 2) float32 (row, col) offsets.
    """
    return jnp.asarray(_ldconv_grid_pts(num_param), dtype=jnp.float32)  # (N, 2)


def ldconv_pack_corners(x):
    """(B,H,W,C) -> (B*H*W, 4C) corner-packed gather source.

    Row ``b*H*W + r*W + c`` holds the four bilinear corners for base (r, c):
    ``[x[r,c], x[r,c1], x[r1,c], x[r1,c1]]`` with r1=min(r+1,H-1) and
    c1=min(c+1,W-1) — the border replication IS the corner clamping, so the
    math stays bit-identical to the clipped 4-corner form.

    Why this shape (chip-measured, round 4): on TPU, XLA only vectorizes a
    gather/scatter whose every index selects exactly ONE full row of a 2-D
    operand (slice (1, C), collapsed); any windowed or two-dim-indexed form
    (e.g. a (2, 2C) window from (H+1, (W+1)C)) lowers to a serial
    while/dynamic-slice loop over ALL windows — 6.6 s/step for LD-P2 at
    batch 8, ~5000x off the roofline (scripts/chip_gather_ab.py). Packing
    all four corners into one row turns the whole bilinear fetch into a
    single vectorized row-take, at 4x the source memory (inputs are small).
    """
    b, hx, wx, c = x.shape
    xr = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
    xd = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    xdr = jnp.concatenate([xd[:, :, 1:], xd[:, :, -1:]], axis=2)
    return jnp.concatenate([x, xr, xd, xdr], axis=-1).reshape(b * hx * wx, 4 * c)


def _ldconv_flat_idx(r0, c0, hx, wx):
    """(B,h,w,N) corner bases -> (B*Q,) int32 flat rows into the packed source."""
    b = r0.shape[0]
    # r0*wx + c0 <= H*W - 1 (< 2^24 at any shape here) stays f32-exact
    fi = (r0 * wx + c0).astype(jnp.int32).reshape(b, -1)
    return (fi + (jnp.arange(b, dtype=jnp.int32) * (hx * wx))[:, None]).reshape(-1)


def _ldconv_corner_gather(s4, r0, c0, hx, wx):
    """Packed source + corner bases -> (B,h,w,N,4,C) corner values via ONE
    vectorized row-take (corner order: 00, 01, 10, 11)."""
    c = s4.shape[-1] // 4
    g = jnp.take(s4, _ldconv_flat_idx(r0, c0, hx, wx), axis=0)
    return g.reshape(*r0.shape, 4, c)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def ldconv_gather_packed(hx: int, wx: int, s4: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling from a corner-packed source (see ldconv_pack_corners).

    TPU-native formulation of the reference's 4-corner gather
    (conv.py:389-470). Forward: one vectorized row-take of all four corners.
    Backward is hand-written: XLA's gather transpose materializes
    full-array temporaries per window slice (measured 28 GB HBM at
    (8,320,320,16)!), so ds4 is a single row scatter-add of the 4 weighted
    corner contributions (all four live in ONE packed row) and dp comes
    from a cheap re-gather — exact gradients, no pathological temps. The
    pack's own transpose (4 shifted slice-adds) is left to autodiff.

    Args:
        hx, wx: static source spatial dims.
        s4: (B*hx*wx, 4C) corner-packed features.
        p: (B, h, w, N, 2) sampling positions as (row, col) floats.

    Returns:
        (B, h, w, N, C) sampled features.
    """
    out, _ = _ldconv_gather_fwd(hx, wx, s4, p)
    return out


def _ldconv_weights(p, hx, wx):
    """Clipped corner bases and bilinear weights (shared fwd/bwd geometry)."""
    pr = jnp.clip(p[..., 0], 0.0, hx - 1)
    pc = jnp.clip(p[..., 1], 0.0, wx - 1)
    r0 = jnp.clip(jnp.floor(pr), 0, hx - 1)
    c0 = jnp.clip(jnp.floor(pc), 0, wx - 1)
    wr1 = pr - r0
    wc1 = pc - c0
    return r0, c0, 1.0 - wr1, wr1, 1.0 - wc1, wc1


def _ldconv_gather_fwd(hx, wx, s4, p):
    r0, c0, wr0, wr1, wc0, wc1 = _ldconv_weights(p, hx, wx)
    g = _ldconv_corner_gather(s4, r0, c0, hx, wx)
    out = (
        (wr0 * wc0)[..., None] * g[..., 0, :]
        + (wr0 * wc1)[..., None] * g[..., 1, :]
        + (wr1 * wc0)[..., None] * g[..., 2, :]
        + (wr1 * wc1)[..., None] * g[..., 3, :]
    )
    return out, (s4, p)


def _ldconv_gather_bwd(hx, wx, res, dy):
    s4, p = res
    b = p.shape[0]
    c = s4.shape[-1] // 4
    r0, c0, wr0, wr1, wc0, wc1 = _ldconv_weights(p, hx, wx)
    g = _ldconv_corner_gather(s4, r0, c0, hx, wx)  # recompute (fast fwd op)
    g00, g01, g10, g11 = (g[..., i, :] for i in range(4))

    # offset gradients: d out / d pr = (g10-g00)*wc0 + (g11-g01)*wc1, and the
    # clip/floor chain passes 1 inside the valid range, 0 at the rails
    dpr = (dy * ((g10 - g00) * wc0[..., None] + (g11 - g01) * wc1[..., None])).sum(-1)
    dpc = (dy * ((g01 - g00) * wr0[..., None] + (g11 - g10) * wr1[..., None])).sum(-1)
    # inclusive bounds; NOTE at positions sitting EXACTLY on a rail, autodiff
    # of clip halves the gradient (max/min tie-splitting) — we pass it whole,
    # an equally valid subgradient on a measure-zero set
    in_r = ((p[..., 0] >= 0.0) & (p[..., 0] <= hx - 1)).astype(dpr.dtype)
    in_c = ((p[..., 1] >= 0.0) & (p[..., 1] <= wx - 1)).astype(dpc.dtype)
    dp = jnp.stack([dpr * in_r, dpc * in_c], axis=-1)

    # ds4: all four corners of a sample live in ONE packed row, so the whole
    # backward is a single vectorized row scatter-add of (Q, 4C) updates —
    # the only gather/scatter form XLA vectorizes on TPU (chip-measured,
    # scripts/chip_gather_ab.py case F). Duplicate rows accumulate, matching
    # the forward's clamping; the pack transpose (into dx) is autodiff's.
    w4 = jnp.stack([wr0 * wc0, wr0 * wc1, wr1 * wc0, wr1 * wc1], axis=-1)
    upd = (w4[..., None] * dy[..., None, :]).reshape(b, -1, 4 * c).reshape(-1, 4 * c)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,),
    )
    ds4 = jax.lax.scatter_add(
        jnp.zeros(s4.shape, dy.dtype),
        _ldconv_flat_idx(r0, c0, hx, wx)[:, None],
        upd, dn, mode=jax.lax.GatherScatterMode.CLIP,
    )
    return ds4.astype(s4.dtype), dp.astype(p.dtype)


ldconv_gather_packed.defvjp(_ldconv_gather_fwd, _ldconv_gather_bwd)


def ldconv_bilinear_gather(x: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling of x (B,H,W,C) at fractional positions p (clamped at
    borders) -> (B,h,w,N,C). Convenience composition of pack + packed gather;
    LDConv builds the pack once outside its row-chunk scan instead."""
    b, hx, wx, c = x.shape
    return ldconv_gather_packed(hx, wx, ldconv_pack_corners(x), p)


def ldconv_hat_taps(off: jnp.ndarray, window_r: int) -> jnp.ndarray:
    """Per-axis bilinear weights over the static tap range [-R, R+1].

    Returns (..., 2R+2) where tap k (= shift k-R) gets hat(off - (k-R)) —
    but built in the one-hot floor form ``[fl==s](1-f) + [fl==s-1]f`` rather
    than ``relu(1-|t|)``: the two are equal in value, yet autodiff of the
    floor form yields exactly the exact-gather VJP convention
    ``d/d off = x[fl+1] - x[fl]`` (the right-derivative at integer offsets),
    whereas the hat's kink at off==0 — the zero-init point of LDConv's offset
    conv — would give a zero gradient and freeze offset learning.
    """
    fl = jnp.floor(off)
    f = (off - fl)[..., None]
    taps = jnp.arange(-window_r, window_r + 2, dtype=off.dtype)
    flt = fl[..., None]
    return jnp.where(flt == taps, 1.0 - f, 0.0) + jnp.where(flt == taps - 1.0, f, 0.0)


def ldconv_hat_sample(
    xw: jnp.ndarray,
    off_r: jnp.ndarray,
    off_c: jnp.ndarray,
    num_param: int,
    stride: int,
    window_r: int,
) -> jnp.ndarray:
    """Dense hat-window bilinear sampling — LDConv's gather-free hot path.

    The exact-gather formulation (ldconv_gather_packed) is a random row-take:
    64-128B HBM accesses that no amount of packing makes fast on TPU
    (chip-measured ~70 img/s for LD-P2 vs a ~7.6k roofline). But LDConv's
    offsets are zero-init and stay small, so every sample lies inside a small
    STATIC window around its grid point — and bilinear sampling becomes a sum
    of (2R+2)^2 shifted strided slices of the input weighted by per-pixel hat
    weights: pure contiguous loads + VPU FMAs that XLA fuses into one kernel.
    Replicate padding of the source IS the reference's border clamping
    (corners past an edge read the edge value, and the offset gradient there
    collapses to x[edge]-x[edge] = 0, matching the exact path's rail gating).

    Args:
        xw: (B, Hw, Ww, C) replicate-padded source window whose origin sits
            window_r rows/cols before the first output pixel's base position;
            requires Hw >= (h-1)*stride + max_p_row + 2R+2 (cols analogous).
        off_r, off_c: (B, h, w, N) learned offsets, |off| within [-R, R+1)
            for exactness (LDConv guards this and falls back to the gather).
        num_param: N (static grid points from _ldconv_grid_pts).
        stride: base-grid stride.
        window_r: R, the static window radius.

    Returns:
        (B, h, w, N*C) sampled features, f32, n-major — the same layout the
        packed gather's reshape produces, term-order-matched so interior
        results agree bitwise.

    Reference: ultralytics/nn/modules/conv.py:389-470 (the 4-corner gather
    this reformulates).
    """
    b, _, _, c = xw.shape
    _, h, w, _ = off_r.shape
    taps = 2 * window_r + 2
    wr = ldconv_hat_taps(off_r, window_r)  # (B,h,w,N,T) f32
    wc = ldconv_hat_taps(off_c, window_r)
    outs = []
    for i, (pr_, pc_) in enumerate(_ldconv_grid_pts(num_param)):
        acc = jnp.zeros((b, h, w, c), jnp.float32)
        for kr in range(taps):
            r0 = pr_ + kr
            rows = jax.lax.slice(
                xw,
                (0, r0, pc_, 0),
                (b, r0 + (h - 1) * stride + 1, pc_ + (w - 1) * stride + taps, c),
                (1, stride, 1, 1),
            )
            for kc in range(taps):
                cols = jax.lax.slice(
                    rows,
                    (0, 0, kc, 0),
                    (b, h, kc + (w - 1) * stride + 1, c),
                    (1, 1, stride, 1),
                )
                acc = acc + (wr[:, :, :, i, kr] * wc[:, :, :, i, kc])[..., None] * cols
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


class LDConv(nn.Module):
    """Linear Deformable Convolution — the DEAL-YOLO core op.

    Reference: ultralytics/nn/modules/conv.py:350-480. A 3x3 conv predicts
    2N per-pixel offsets (zero-init so training starts from the regular
    grid); features are bilinearly resampled at N deformed points; the
    (N,1)-kernel conv of the reference is algebraically a dense layer over
    the N*C sampled features, which we implement as a single MXU matmul.

    Note: the reference registers a backward hook intended to scale offset
    grads by 0.1, but the hook builds generators and returns None, so it is
    a no-op in the original — we intentionally do not scale offset grads.

    Border semantics (``border``): the reference clamps the corner indices
    ``q_lt``/``q_rb`` AND the position ``p`` independently
    (conv.py:379-393), so once a sample's unclamped coordinate leaves
    ``[0, size-1)`` on an axis BOTH corner weights on that axis evaluate to
    1 on the same clamped edge pixel — the sampled value is 2x the
    replicate-pad bilinear value per out-of-border axis (4x at corners),
    and the doubling fires already at ``p == size-1`` exactly (q_rb clamps
    back onto q_lt). Probe-verified against the torch module: torch value
    == unity bilinear x 2^(#OOB axes) to 5e-7. Since zero-init offsets plus
    the base grid (p_n spans 0..+2) already go OOB at image edges, trained
    torch weights depend on this amplification, so bug-compatible
    ``border='torch'`` (a pure output multiplier on the sampled features —
    both samplers stay partition-of-unity) is the DEFAULT; ``'unity'``
    keeps plain replicate-pad bilinear.
    """

    c2: int
    num_param: int = 3
    stride: int = 1
    dtype: Dtype = jnp.float32
    # Static hat-window radius R: the dense path is exact while every learned
    # offset stays in [-R, R+1). Zero-init offsets start at 0 and drift
    # slowly; R=2 gives a 6x6-tap window with plenty of headroom.
    window_r: int = 2
    # "auto": dense hat-window, lax.cond fallback to the exact gather the
    # moment any offset leaves the window (exactness always). "dense"/
    # "gather" force one path (A/B benching, tests). EY_LDCONV_SAMPLING
    # overrides the default for models built from YAML (fleet-wide A/B).
    sampling: str = os.environ.get("EY_LDCONV_SAMPLING", "auto")
    # Out-of-border weighting: "torch" replicates the reference's
    # double-counting quirk (see class docstring), "unity" is plain
    # replicate-pad bilinear. EY_LDCONV_BORDER overrides for A/B runs.
    border: str = os.environ.get("EY_LDCONV_BORDER", "torch")
    # Cap on the sampled-feature temporary per chunk (padded bytes). The
    # sampler + projection run chunked over output rows under lax.scan so
    # peak HBM stays flat in batch; 96 MB keeps the temp comfortably under
    # the v5e per-step working set while chunks stay wide enough to DMA well.
    chunk_budget: int = 96 * 1024 * 1024

    def _project(self, feat):
        """The (N,1)-kernel conv of the reference as ONE MXU matmul. Split
        out as a method so every code path (dense/gather x chunked/not)
        creates the 'proj' Dense at the SAME param path — checkpoint and
        torch-converter compatibility."""
        return nn.Dense(
            features=self.c2, use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="proj",
        )(feat.astype(self.dtype))

    def _border_mul(self, abs_r, abs_c, hx, wx):
        """Reference out-of-border amplification (conv.py:379-393): x2 per
        axis whose unclamped position leaves [0, size-1) — fires at
        ``size-1`` exactly. Positions in ORIGINAL (unpadded) coords."""
        oob_r = (abs_r < 0.0) | (abs_r >= hx - 1)
        oob_c = (abs_c < 0.0) | (abs_c >= wx - 1)
        return (1.0 + oob_r.astype(jnp.float32)) * (1.0 + oob_c.astype(jnp.float32))

    def _dense_chunk(self, it, xp, off, ws_r, hx, wx):
        """One row-chunk of the dense hat-window path -> MXU projection."""
        b, hc, w = off.shape[0], off.shape[1], off.shape[2]
        win = jax.lax.dynamic_slice(
            xp, (0, it * hc * self.stride, 0, 0),
            (b, ws_r, xp.shape[2], xp.shape[-1]))
        feat = ldconv_hat_sample(
            win, off[..., 0, :], off[..., 1, :],
            self.num_param, self.stride, self.window_r)
        if self.border == "torch":
            p_n = jnp.asarray(_ldconv_grid_pts(self.num_param), jnp.float32)
            gr = (it * hc + jnp.arange(hc, dtype=jnp.float32))[:, None] * self.stride
            gc = jnp.arange(w, dtype=jnp.float32)[None, :] * self.stride
            abs_r = gr[None, :, :, None] + p_n[None, None, None, :, 0] + off[..., 0, :]
            abs_c = gc[None, :, :, None] + p_n[None, None, None, :, 1] + off[..., 1, :]
            mul = self._border_mul(abs_r, abs_c, hx, wx)  # (b,hc,w,N)
            c_in = feat.shape[-1] // self.num_param
            feat = (feat.reshape(b, hc, w, self.num_param, c_in) * mul[..., None]
                    ).reshape(b, hc, w, self.num_param * c_in)
        return it + 1, self._project(feat)

    def _gather_chunk(self, carry, s4, p, hx_p, wx_p, hx, wx):
        """One row-chunk of the exact packed-gather path -> projection."""
        b, hc, w, n, _ = p.shape
        c_in = s4.shape[-1] // 4
        g = ldconv_gather_packed(hx_p, wx_p, s4, p)
        if self.border == "torch":
            # p is in padded coords (shifted by window_r); un-shift for the
            # original-image border test
            mul = self._border_mul(
                p[..., 0] - self.window_r, p[..., 1] - self.window_r, hx, wx)
            g = g * mul[..., None].astype(g.dtype)
        return carry, self._project(g.reshape(b, hc, w, n * c_in))

    def _dense_all(self, xp, off, hc, ws_r, hx, wx):
        """Dense path over all rows, scan-chunked when hc < h.

        Kept branch-local (see __call__): anything loop-invariant XLA hoists
        out of the chunk scan's while-loop must stay INSIDE this branch of
        the sampling cond — a per-chunk cond lets LICM drag the untaken
        fallback's corner pack to top level, executing it unconditionally
        (chip-measured: that alone held full-model LD-P2 at ~70 img/s)."""
        b, h, w = off.shape[0], off.shape[1], off.shape[2]
        if hc == h:
            _, y = self._dense_chunk(0, xp, off, ws_r, hx, wx)
            return y
        och = jnp.moveaxis(off.reshape(b, h // hc, hc, w, 2, off.shape[-1]), 1, 0)

        def body(mdl, carry, xpb, ob):
            return type(mdl)._dense_chunk(mdl, carry, xpb, ob, ws_r, hx, wx)

        scan = nn.scan(
            nn.remat(body, prevent_cse=False),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
        )
        _, ych = scan(self, jnp.int32(0), xp, och)
        return jnp.moveaxis(ych, 0, 1).reshape(b, h, w, self.c2)

    def _gather_all(self, xp, p, hc, hx_p, wx_p, hx, wx):
        """Exact-gather path over all rows; corner pack built ONCE here —
        inside the branch, so the auto mode only pays it when taken."""
        b, h, w = p.shape[0], p.shape[1], p.shape[2]
        s4 = ldconv_pack_corners(xp)
        if hc == h:
            _, y = self._gather_chunk(None, s4, p, hx_p, wx_p, hx, wx)
            return y
        pch = jnp.moveaxis(p.reshape(b, h // hc, hc, w, p.shape[3], 2), 1, 0)

        def body(mdl, carry, s4b, pb):
            return type(mdl)._gather_chunk(mdl, carry, s4b, pb, hx_p, wx_p, hx, wx)

        scan = nn.scan(
            nn.remat(body, prevent_cse=False),
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
        )
        _, ych = scan(self, None, s4, pch)
        return jnp.moveaxis(ych, 0, 1).reshape(b, h, w, self.c2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.sampling not in ("auto", "dense", "gather"):
            raise ValueError(
                f"LDConv sampling={self.sampling!r}: expected 'auto', 'dense' "
                "or 'gather' (check EY_LDCONV_SAMPLING)")
        if self.border not in ("torch", "unity"):
            raise ValueError(
                f"LDConv border={self.border!r}: expected 'torch' or 'unity' "
                "(check EY_LDCONV_BORDER)")
        n = self.num_param
        R = self.window_r
        # The reference zero-inits ONLY p_conv.weight (conv.py:357); the BIAS
        # keeps torch Conv2d's default uniform(+-1/sqrt(fan_in)) — so initial
        # offsets are small random per-channel constants, not exactly zero.
        # Replicate: exactly-integer starting offsets sit on the bilinear
        # hat's derivative kink and train differently.
        fan_in = x.shape[-1] * 9

        def _torch_bias_init(key, shape, dtype=jnp.float32):
            b = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -b, b)

        offset = nn.Conv(
            features=2 * n,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,
            bias_init=_torch_bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="p_conv",
        )(x)  # (B, h, w, 2N)
        b, h, w, _ = offset.shape
        off = offset.reshape(b, h, w, 2, n).astype(jnp.float32)
        off_r, off_c = off[..., 0, :], off[..., 1, :]  # first N = rows, last N = cols

        # Replicate-pad the source once: pad R before the base grid plus
        # enough after that every static tap (and the last chunk's window)
        # stays in bounds. Sample in the compute dtype: layer 0 receives the
        # f32 image and would otherwise move f32 windows (2x the bytes of
        # every other bandwidth-bound op in a bf16 model).
        x = x.astype(self.dtype)
        _, hx, wx, c_in = x.shape
        pts = _ldconv_grid_pts(n)
        max_pr = max(pt[0] for pt in pts)
        max_pc = max(pt[1] for pt in pts)
        pad_r = max(0, (h - 1) * self.stride + max_pr + R + 2 - hx)
        pad_c = max(0, (w - 1) * self.stride + max_pc + R + 2 - wx)
        xp = jnp.pad(x, ((0, 0), (R, pad_r), (R, pad_c), (0, 0)), mode="edge")
        hx_p, wx_p = xp.shape[1], xp.shape[2]

        # absolute sample positions in xp coords (base grid p_0 + kernel grid
        # p_n + learned offsets + R pad shift) for the exact-gather fallback;
        # positions stay f32 (bf16's 8 mantissa bits can't hold row 320.7)
        p_n = ldconv_sample_grid(n)  # (N, 2)
        gr = jnp.arange(h, dtype=jnp.float32)[:, None] * self.stride + R
        gc = jnp.arange(w, dtype=jnp.float32)[None, :] * self.stride + R
        pr = gr[None, :, :, None] + p_n[None, None, None, :, 0] + off_r
        pc = gc[None, :, :, None] + p_n[None, None, None, :, 1] + off_c
        p = jnp.stack([pr, pc], axis=-1)  # (B, h, w, N, 2)

        # dense path is exact iff floor(off) lands in [-R, R] on both axes
        inside = (off >= -float(R)) & (off < float(R) + 1.0)
        pred = jnp.all(inside)
        # Observability for the auto-cond (ADVICE r4): once ONE offset
        # anywhere drifts past R the whole layer silently takes the ~100x
        # slower gather fallback forever. Sow the in-window fraction so
        # training/val loops can surface the regression (readable via
        # mutable=['intermediates'] -> '.../dense_ok_frac').
        self.sow("intermediates", "dense_ok_frac",
                 jnp.mean(inside.astype(jnp.float32)))

        # Chunk output rows so the sampled-feature temporary stays under
        # chunk_budget regardless of batch (unchunked, DEAL-LD layer 0 at
        # batch 32/640px is a 9.8M-window, multi-GB tensor). Lane padding:
        # the trailing N*C (or the fallback's 4C rows) pads up to 128 lanes.
        lane = max(n * c_in, 4 * c_in, 128)
        bytes_per_row = b * w * lane * 4  # f32 pre-cast accumulators
        hc = max(1, min(h, self.chunk_budget // max(bytes_per_row, 1)))
        while h % hc:  # largest divisor of h <= budget rows (no pad rows)
            hc -= 1
        ws_r = (hc - 1) * self.stride + max_pr + 2 * R + 2

        if self.sampling == "dense":
            y = self._dense_all(xp, off, hc, ws_r, hx, wx)
        elif self.sampling == "gather":
            y = self._gather_all(xp, p, hc, hx_p, wx_p, hx, wx)
        else:
            # ONE layer-level cond: the fallback's cost stays inside its
            # branch (see _dense_all docstring for why per-chunk conds lose)
            y = nn.cond(
                pred,
                lambda mdl, xpb, ob, pb: mdl._dense_all(xpb, ob, hc, ws_r, hx, wx),
                lambda mdl, xpb, ob, pb: mdl._gather_all(
                    xpb, pb, hc, hx_p, wx_p, hx, wx),
                self, xp, off, p,
            )

        # LDConv wraps a bare nn.BatchNorm2d (conv.py:355), but the
        # reference's initialize_weights (torch_utils.py:348-350) resets
        # EVERY BatchNorm2d in the built model to eps=1e-3/momentum=0.03 —
        # so LDConv's BN matches the repo-wide Conv BN after all.
        y = MemBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn",
        )(y)
        return jax.nn.silu(y)


class BottleneckLD(nn.Module):
    """Bottleneck built from LDConv units (reference: block.py:611)."""

    c2: int
    shortcut: bool = True
    num_param: int = 4
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = LDConv(c_, self.num_param, 1, dtype=self.dtype, name="cv1")(x, train)
        y = LDConv(self.c2, self.num_param, 1, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            return x + y
        return y


class C2fLD(nn.Module):
    """C2f rebuilt from LDConv bottlenecks (reference: block.py:636)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    num_param: int = 4
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBN(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(BottleneckLD(c, self.shortcut, self.num_param, e=1.0, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        return ConvBN(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


# ---------------------------------------------------------------------------
# DEAL-YOLO: SSFF / ASF fusion (Zoom_cat, ScalSeq, asf attention)
# ---------------------------------------------------------------------------


def _adaptive_pool2x(x, mode: str):
    """Adaptive (max|avg) pool to exactly half spatial size (factor-2 inputs)."""
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, "Zoom_cat expects factor-2 pyramid levels"
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.max(axis=(2, 4)) if mode == "max" else x.mean(axis=(2, 4))


def _nearest_upsample(x, fh, fw):
    """Nearest-neighbour upsample by integer factors as ONE broadcast +
    reshape: two sequential ``jnp.repeat`` calls materialize the H-repeated
    intermediate (a full extra sweep fwd and a reduce sweep bwd — ~4% of the
    DEAL-P2 train step's estimated cycles, docs/KERNELS.md)."""
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, fh, w, fw, c))
    return y.reshape(b, h * fh, w * fw, c)


def _upsample_to(x, h, w):
    """Nearest-neighbour upsample to (h, w) — integer factors only."""
    return _nearest_upsample(x, h // x.shape[1], w // x.shape[2])


class ZoomCat(nn.Module):
    """Scale-zoomed concat of (large, mid, small) levels (reference block.py:3402).

    large -> adaptive max+avg pool to mid size; small -> nearest upsample;
    concat on channels.
    """

    @nn.compact
    def __call__(self, xs, train: bool = False):
        l, m, s = xs
        h, w = m.shape[1:3]
        l = _adaptive_pool2x(l, "max") + _adaptive_pool2x(l, "avg")
        s = _upsample_to(s, h, w)
        return jnp.concatenate([l, m, s], axis=-1)


class ScalSeq(nn.Module):
    """Scale-sequence fusion (SSFF) — reference block.py:3414-3443.

    Project 3 pyramid levels to a common width, upsample to the finest,
    stack along a scale axis, 1x1x1 conv + BN + LeakyReLU over it, then
    max over the scale axis. The Conv3d(1,1,1) is a pointwise channel map
    shared across scales — i.e. a single dense matmul (MXU) here.
    """

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
        h, w = p3.shape[1:3]
        p4 = _upsample_to(p4, h, w)
        p5 = _upsample_to(p5, h, w)
        # stack scales NEXT TO the channel axis, not at axis 1: a 5D
        # (B, 3, H, W, C) tensor forces XLA layout copies on every producer/
        # consumer (measured ~5 GB/step of pure copy traffic at DEAL-P2
        # shapes); (B, H, W, 3, C) keeps the minor dims contiguous. The
        # Dense/BN/max math is identical — BN still normalizes per channel
        # over (batch, scale, H, W).
        stack = jnp.stack([p3, p4, p5], axis=3)  # (B, H, W, 3, C)
        stack = nn.Dense(self.c2, use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="conv3d")(stack)
        stack = MemBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            dtype=self.dtype, param_dtype=jnp.float32, name="bn",
        )(stack)
        stack = jax.nn.leaky_relu(stack, 0.1)
        return stack.max(axis=3)  # MaxPool3d((3,1,1)) over the scale axis


class AsfChannelAtt(nn.Module):
    """ECA-style channel attention (reference: block.py:asf_channel_att)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        k = int(abs((math.log2(c) + 1) / 2))
        k = k if k % 2 else k + 1
        y = x.mean(axis=(1, 2))  # (B, C)
        y = nn.Conv(1, (k,), padding=[(k // 2, k // 2)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(y[..., None])  # (B, C, 1)
        y = jax.nn.sigmoid(y[..., 0])  # (B, C)
        return x * y[:, None, None, :]


class AsfLocalAtt(nn.Module):
    """Coordinate (H/W factorized) attention (reference: block.py:asf_local_att)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        cr = max(c // self.reduction, 1)
        x_h = x.mean(axis=2)[:, None]  # (B, 1, H, C)
        x_w = x.mean(axis=1)[:, None]  # (B, 1, W, C)
        y = jnp.concatenate([x_h, x_w], axis=2)  # (B, 1, H+W, C)
        y = nn.Conv(cr, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="conv_1x1")(y)
        y = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype, param_dtype=jnp.float32, name="bn")(y)
        y = jax.nn.relu(y)
        y_h, y_w = y[:, :, :h], y[:, :, h:]
        s_h = jax.nn.sigmoid(nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="F_h")(y_h))
        s_w = jax.nn.sigmoid(nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="F_w")(y_w))
        s_h = jnp.transpose(s_h, (0, 2, 1, 3))  # (B, H, 1, C)
        return x * s_h * s_w  # broadcast over W and H


class AsfAttention(nn.Module):
    """ASF attention fusion of two branches (reference: asf_attention_model)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        a, b = xs
        a = AsfChannelAtt(dtype=self.dtype, name="channel_att")(a, train)
        y = a + b
        return AsfLocalAtt(dtype=self.dtype, name="local_att")(y, train)


# ---------------------------------------------------------------------------
# EfficientNet MBConv (used by the fork's yolov8.yaml backbone)
# ---------------------------------------------------------------------------


class MBConv(nn.Module):
    """Mobile inverted bottleneck with internal repeats.

    Reference: ultralytics/nn/modules/conv.py:517 (MBConv +
    _ResidualMBConvBlock): optional pointwise expansion -> depthwise 3x3
    (stride on first repeat) -> pointwise projection (BN gamma zero-init),
    residual when channels match and stride == 1.
    """

    c2: int
    n: int = 1
    e: float = 6
    act: str = "silu"
    drop_path: float = 0.0
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = self.act.lower() if isinstance(self.act, str) else self.act
        for i in range(self.n):
            s = self.stride if i == 0 else 1
            c_out = self.c2 if i == self.n - 1 else x.shape[-1]
            x = _MBBlock(c_out, self.e, act, s, dtype=self.dtype, name=f"block{i}")(x, train)
        return x


class _MBBlock(nn.Module):
    c2: int
    e: float
    act: str
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        hidden = int(c1 * self.e)
        y = x
        if self.e != 1:
            y = ConvBN(hidden, 1, 1, act=self.act, dtype=self.dtype, name="expand")(y, train)
        y = ConvBN(hidden, 3, self.stride, g=hidden, act=self.act, dtype=self.dtype, name="dw")(y, train)
        y = ConvBN(self.c2, 1, 1, act=False, dtype=self.dtype, name="project")(y, train)
        if c1 == self.c2 and self.stride == 1:
            y = x + y
        return y


# ---------------------------------------------------------------------------
# Detect head
# ---------------------------------------------------------------------------


class Detect(nn.Module):
    """Decoupled anchor-free detection head (reference: nn/modules/head.py:19).

    Per level: cv2 (box branch -> 4*reg_max) and cv3 (cls branch -> nc).
    Returns the list of raw (B, H, W, 4*reg_max + nc) maps; decoding
    (make_anchors + DFL + dist2bbox + sigmoid) lives in
    ``ops.anchors.decode_detections`` so train and predict paths share one
    pure apply function.
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @property
    def no(self) -> int:
        return self.nc + 4 * self.reg_max

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(xs):
            box = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            box = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"cv2_{i}_2")(box)
            cls = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            cls = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(cls, train)
            cls = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"cv3_{i}_2")(cls)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs
