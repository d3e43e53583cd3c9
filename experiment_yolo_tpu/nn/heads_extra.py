"""Segmentation / Pose / OBB heads.

Rebuild of the reference's other task heads (nn/modules/head.py: Segment:90,
OBB:116, Pose:147) and Proto (block.py). Each returns the Detect maps plus
its task branch; decode helpers turn raw outputs into task predictions
(mask assembly, keypoint decode, rotated boxes). Training losses for these
tasks are queued (SURVEY §2.6 v8Segmentation/Pose/OBB losses).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from experiment_yolo_tpu.nn.modules import ConvBN, Detect

Dtype = Any


class Proto(nn.Module):
    """Mask prototype generator (reference block.py:Proto): conv -> 2x
    transposed upsample -> conv -> conv to nm prototype channels."""

    c_: int = 256
    nm: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(self.c_, (2, 2), strides=(2, 2), use_bias=True,
                             dtype=self.dtype, param_dtype=jnp.float32, name="upsample")(x)
        x = ConvBN(self.c_, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBN(self.nm, 1, dtype=self.dtype, name="cv3")(x, train)


class Segment(nn.Module):
    """Detect + per-level mask coefficients + prototypes (head.py:90).

    Returns (detect_maps, coeff_maps, protos): detect maps per level
    (B,H,W,4*reg_max+nc); coeffs per level (B,H,W,nm); protos
    (B, H0*2, W0*2, nm).
    """

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = Detect(nc=self.nc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.nm)
        coeffs = []
        for i, x in enumerate(xs):
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.nm, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            coeffs.append(y)
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        return det, coeffs, protos


class Pose(nn.Module):
    """Detect + keypoint regression branch (head.py:147).

    kpt_shape (nk, dims): 17x3 COCO default. Returns (detect_maps,
    kpt_maps) with kpt maps (B,H,W,nk*dims).
    """

    nc: int = 1
    kpt_shape: Tuple[int, int] = (17, 3)
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = Detect(nc=self.nc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kpts = []
        for i, x in enumerate(xs):
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(nk, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            kpts.append(y)
        return det, kpts


class OBB(nn.Module):
    """Detect + rotation-angle branch (head.py:116). Angle maps
    (B,H,W,ne); decode maps sigmoid to (-pi/4, 3pi/4)."""

    nc: int = 80
    ne: int = 1
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = Detect(nc=self.nc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.ne)
        angles = []
        for i, x in enumerate(xs):
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.ne, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            angles.append(y)
        return det, angles


class DetectEfficient(nn.Module):
    """Lightweight shared-stem detect head (extra head.py:175
    Detect_Efficient): two shared 3x3 convs per level feed bare 1x1 box/cls
    projections (vs Detect's two branches x two convs each). Same output
    contract as Detect — raw (B, H, W, 4*reg_max+nc) maps."""

    nc: int = 80
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @property
    def no(self) -> int:
        return self.nc + 4 * self.reg_max

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            c = self.ch[i]
            y = ConvBN(c, 3, dtype=self.dtype, name=f"stem_{i}_0")(x, train)
            y = ConvBN(c, 3, dtype=self.dtype, name=f"stem_{i}_1")(y, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"cv2_{i}_2")(y)
            cls = nn.Conv(self.nc, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"cv3_{i}_2")(y)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs


class ConvGN(nn.Module):
    """Conv (no bias) + GroupNorm(16) + SiLU (reference extra head.py:481
    Conv_GN) — the norm of choice for shared detection-head convs."""

    c2: int
    k: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        y = nn.Conv(self.c2, (self.k, self.k), padding=[(p, p)] * 2, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        y = nn.GroupNorm(num_groups=16, dtype=self.dtype, param_dtype=jnp.float32, name="gn")(y)
        return jax.nn.silu(y) if self.act else y


class DetectLSCD(nn.Module):
    """Lightweight shared-conv detection head (extra head.py:497
    Detect_LSCD): per-level 1x1 ConvGN into hidc, one SHARED 3x3 ConvGN
    tower and SHARED 1x1 box/cls projections, per-level learnable scale on
    the box branch. Returns raw (B,H,W,4*reg_max+nc) maps like Detect."""

    nc: int = 80
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @property
    def no(self) -> int:
        return self.nc + 4 * self.reg_max

    @nn.compact
    def __call__(self, xs, train: bool = False):
        share0 = ConvGN(self.hidc, 3, dtype=self.dtype, name="share_conv_0")
        share1 = ConvGN(self.hidc, 3, dtype=self.dtype, name="share_conv_1")
        cv2 = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32, name="cv2")
        cv3 = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32, name="cv3")
        outs = []
        for i, x in enumerate(xs):
            scale = self.param(f"scale_{i}", nn.initializers.ones, (), jnp.float32)
            y = ConvGN(self.hidc, 1, dtype=self.dtype, name=f"conv_{i}")(x, train)
            y = share1(share0(y, train), train)
            outs.append(jnp.concatenate([cv2(y) * scale, cv3(y)], axis=-1))
        return outs


class SegmentLSCD(nn.Module):
    """Segment_LSCD (extra head.py:570): DetectLSCD + mask coeffs + protos."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectLSCD(nc=self.nc, hidc=self.hidc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.nm)
        coeffs = []
        for i, x in enumerate(xs):
            y = ConvGN(c4, 1, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvGN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.nm, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            coeffs.append(y)
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        return det, coeffs, protos


class PoseLSCD(nn.Module):
    """Pose_LSCD (extra head.py:595): DetectLSCD + keypoint branch (the kpt
    branch keeps the reference's BN Convs)."""

    nc: int = 80
    kpt_shape: Tuple[int, int] = (17, 3)
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectLSCD(nc=self.nc, hidc=self.hidc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kmaps = []
        for i, x in enumerate(xs):
            y = ConvBN(c4, 1, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(nk, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            kmaps.append(y)
        return det, kmaps


class OBBLSCD(nn.Module):
    """OBB_LSCD (extra head.py:635): DetectLSCD + angle branch."""

    nc: int = 80
    ne: int = 1
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectLSCD(nc=self.nc, hidc=self.hidc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.ne)
        amaps = []
        for i, x in enumerate(xs):
            y = ConvGN(c4, 1, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvGN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.ne, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            amaps.append(y)
        return det, amaps


class DetectSEAM(nn.Module):
    """Detect_SEAM / Detect_MultiSEAM (extra head.py:304/366): Detect with a
    SEAM (or MultiSEAM) attention between the 3x3 stem and the projection."""

    nc: int = 80
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    multi: bool = False
    dtype: Dtype = jnp.float32

    @property
    def no(self) -> int:
        return self.nc + 4 * self.reg_max

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.nn.zoo_blocks import SEAM, MultiSEAM

        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        att = MultiSEAM if self.multi else SEAM
        outs = []
        for i, x in enumerate(xs):
            box = ConvBN(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            box = att(c2, dtype=self.dtype, name=f"cv2_{i}_att")(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"cv2_{i}_2")(box)
            cls = ConvBN(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            cls = att(c3, dtype=self.dtype, name=f"cv3_{i}_att")(cls, train)
            cls = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"cv3_{i}_2")(cls)
            outs.append(jnp.concatenate([box, cls], axis=-1))
        return outs


class SegmentEfficient(nn.Module):
    """Segment_Efficient (extra head.py:439): DetectEfficient + mask branch."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectEfficient(nc=self.nc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.nm)
        coeffs = []
        for i, x in enumerate(xs):
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            y = nn.Conv(self.nm, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)
            coeffs.append(y)
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        return det, coeffs, protos


class DetectLADH(nn.Module):
    """Lightweight asymmetric detection head (extra head.py:900
    Detect_LADH): box branch = 3x DSConv + 1x1 Conv; cls branch = 2x 1x1
    Conv. Same raw-map output contract as Detect."""

    nc: int = 80
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @property
    def no(self) -> int:
        return self.nc + 4 * self.reg_max

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import DSConv

        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(xs):
            b = DSConv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = DSConv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = DSConv(c2, 3, dtype=self.dtype, name=f"cv2_{i}_2d")(b, train)
            b = ConvBN(c2, 1, dtype=self.dtype, name=f"cv2_{i}_3")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"cv2_{i}_2")(b)
            c = ConvBN(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
            c = ConvBN(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1")(c, train)
            c = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"cv3_{i}_2")(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


def _ladh_cv4(x, c4, out_ch, i, train, dtype):
    """LADH task branch: 2x DSConv3 + Conv1 + 1x1 proj (extra head.py:974)."""
    from experiment_yolo_tpu.nn.extra_modules import DSConv

    y = DSConv(c4, 3, dtype=dtype, name=f"cv4_{i}_0")(x, train)
    y = DSConv(c4, 3, dtype=dtype, name=f"cv4_{i}_1")(y, train)
    y = ConvBN(c4, 1, dtype=dtype, name=f"cv4_{i}_pw")(y, train)
    return nn.Conv(out_ch, (1, 1), dtype=dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)


class SegmentLADH(nn.Module):
    """Segment_LADH (extra head.py:970)."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectLADH(nc=self.nc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.nm)
        coeffs = [_ladh_cv4(x, c4, self.nm, i, train, self.dtype) for i, x in enumerate(xs)]
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        return det, coeffs, protos


class PoseLADH(nn.Module):
    """Pose_LADH (extra head.py:995)."""

    nc: int = 80
    kpt_shape: Tuple[int, int] = (17, 3)
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectLADH(nc=self.nc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kmaps = [_ladh_cv4(x, c4, nk, i, train, self.dtype) for i, x in enumerate(xs)]
        return det, kmaps


class OBBLADH(nn.Module):
    """OBB_LADH (extra head.py:1035)."""

    nc: int = 80
    ne: int = 1
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.nn.extra_modules import DSConv

        det = DetectLADH(nc=self.nc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.ne)
        amaps = []
        for i, x in enumerate(xs):  # OBB branch is shorter: 1 DSConv (head.py:1045)
            y = DSConv(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 1, dtype=self.dtype, name=f"cv4_{i}_pw")(y, train)
            amaps.append(nn.Conv(self.ne, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y))
        return det, amaps


class _TaskDecomposition(nn.Module):
    """TaskDecomposition (extra head.py:665, TOOD): layer attention over the
    stacked features folds into the reduction conv's weights per sample."""

    feat_ch: int
    stacked: int = 2
    la_down_rate: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat, avg_feat, train: bool = False):
        in_ch = self.feat_ch * self.stacked
        w = nn.Conv(in_ch // self.la_down_rate, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="la_conv1")(avg_feat)
        w = jax.nn.sigmoid(nn.Conv(self.stacked, (1, 1), dtype=self.dtype,
                                   param_dtype=jnp.float32, name="la_conv2")(jax.nn.relu(w)))
        # (B,1,1,stacked) layer attention folded into the reduction weights:
        # kernel (1,1,in_ch,feat_ch) viewed as (stacked, feat_ch, feat_ch)
        kernel = self.param("reduction_kernel",
                            nn.initializers.normal(0.01), (1, 1, in_ch, self.feat_ch), jnp.float32)
        b, h, ww, _ = feat.shape
        kb = kernel.reshape(1, self.stacked, self.feat_ch, self.feat_ch) * w.reshape(b, self.stacked, 1, 1)
        kb = kb.reshape(b, in_ch, self.feat_ch)
        y = jnp.einsum("bhwc,bco->bhwo", feat.astype(self.dtype), kb.astype(self.dtype))
        y = nn.GroupNorm(num_groups=16, dtype=self.dtype, param_dtype=jnp.float32, name="gn")(y)
        return jax.nn.silu(y)


class DetectTADDH(nn.Module):
    """Task-dynamic-align detection head (extra head.py:710 Detect_TADDH):
    shared ConvGN tower, task decomposition for cls/reg, DCNv2 alignment of
    the reg features, cls-probability gating, shared projections + per-level
    scales."""

    nc: int = 80
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @property
    def no(self) -> int:
        return self.nc + 4 * self.reg_max

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.ops.dcnv3 import DyDCNv2

        h2 = self.hidc // 2
        share0 = ConvGN(h2, 3, dtype=self.dtype, name="share_conv_0")
        share1 = ConvGN(h2, 3, dtype=self.dtype, name="share_conv_1")
        cls_dec = _TaskDecomposition(h2, 2, 16, dtype=self.dtype, name="cls_decomp")
        reg_dec = _TaskDecomposition(h2, 2, 16, dtype=self.dtype, name="reg_decomp")
        dydcn = DyDCNv2(h2, dtype=self.dtype, name="DyDCNV2")
        off_conv = nn.Conv(3 * 3 * 3, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                           param_dtype=jnp.float32, name="spatial_conv_offset")
        prob1 = nn.Conv(self.hidc // 4, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="cls_prob_conv1")
        prob2 = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype, param_dtype=jnp.float32, name="cls_prob_conv2")
        cv2 = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="cv2")
        cv3 = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32, name="cv3")
        outs = []
        for i, x in enumerate(xs):
            scale = self.param(f"scale_{i}", nn.initializers.ones, (), jnp.float32)
            f0 = share0(x, train)
            f1 = share1(f0, train)
            feat = jnp.concatenate([f0, f1], axis=-1)  # (B,H,W,hidc)
            avg = feat.mean(axis=(1, 2), keepdims=True)
            cls_feat = cls_dec(feat, avg, train)
            reg_feat = reg_dec(feat, avg, train)
            om = off_conv(feat)
            offset, mask = om[..., :18], jax.nn.sigmoid(om[..., 18:])
            reg_feat = dydcn(reg_feat, offset, mask)
            cls_prob = jax.nn.sigmoid(prob2(jax.nn.relu(prob1(feat))))
            outs.append(jnp.concatenate([cv2(reg_feat) * scale, cv3(cls_feat * cls_prob)], axis=-1))
        return outs


def _gn_cv4(x, c4, out_ch, i, train, dtype):
    """LSCD/TADDH task branch: ConvGN 1x1 + ConvGN 3x3 + 1x1 proj."""
    y = ConvGN(c4, 1, dtype=dtype, name=f"cv4_{i}_0")(x, train)
    y = ConvGN(c4, 3, dtype=dtype, name=f"cv4_{i}_1")(y, train)
    return nn.Conv(out_ch, (1, 1), dtype=dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y)


class SegmentTADDH(nn.Module):
    """Segment_TADDH (extra head.py:805)."""

    nc: int = 80
    nm: int = 32
    npr: int = 256
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectTADDH(nc=self.nc, hidc=self.hidc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.nm)
        coeffs = [_gn_cv4(x, c4, self.nm, i, train, self.dtype) for i, x in enumerate(xs)]
        protos = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")(xs[0], train)
        return det, coeffs, protos


class PoseTADDH(nn.Module):
    """Pose_TADDH (extra head.py:830) — kpt branch keeps BN Convs."""

    nc: int = 80
    kpt_shape: Tuple[int, int] = (17, 3)
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectTADDH(nc=self.nc, hidc=self.hidc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        nk = self.kpt_shape[0] * self.kpt_shape[1]
        c4 = max(self.ch[0] // 4, nk)
        kmaps = []
        for i, x in enumerate(xs):
            y = ConvBN(c4, 1, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            y = ConvBN(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(y, train)
            kmaps.append(nn.Conv(nk, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name=f"cv4_{i}_2")(y))
        return det, kmaps


class OBBTADDH(nn.Module):
    """OBB_TADDH (extra head.py:870)."""

    nc: int = 80
    ne: int = 1
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        det = DetectTADDH(nc=self.nc, hidc=self.hidc, ch=self.ch, dtype=self.dtype, name="detect")(xs, train)
        c4 = max(self.ch[0] // 4, self.ne)
        amaps = [_gn_cv4(x, c4, self.ne, i, train, self.dtype) for i, x in enumerate(xs)]
        return det, amaps


class _AFPNBasic(nn.Module):
    """AFPN BasicBlock (afpn.py:11): two 3x3 convs, residual, SiLU."""

    c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.c, 3, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBN(self.c, 3, act=False, dtype=self.dtype, name="conv2")(y, train)
        return jax.nn.silu(x + y)


class _ASFF(nn.Module):
    """Adaptive spatial feature fusion over n levels (afpn.py:76-172)."""

    c: int
    n: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        ws = [ConvBN(8, 1, dtype=self.dtype, name=f"weight_level_{i}")(x, train) for i, x in enumerate(inputs)]
        lw = nn.Conv(self.n, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                     name="weight_levels")(jnp.concatenate(ws, -1))
        lw = jax.nn.softmax(lw, axis=-1)
        fused = sum(x * lw[..., i : i + 1] for i, x in enumerate(inputs))
        return ConvBN(self.c, 3, dtype=self.dtype, name="conv")(fused, train)


def _afpn_up(x, c, factor, train, dtype, name):
    """Upsample (afpn.py:29): 1x1 conv then bilinear x factor."""
    y = ConvBN(c, 1, dtype=dtype, name=name)(x, train)
    b, h, w, cc = y.shape
    return jax.image.resize(y, (b, h * factor, w * factor, cc), "bilinear")


class _AFPNBody345(nn.Module):
    """BlockBody_P345 (afpn.py:173) / _Custom (afpn.py:265 with C2f
    groups): progressive 2-level then 3-level ASFF fusion."""

    chans: Tuple[int, int, int]
    custom: bool = False
    dtype: Dtype = jnp.float32

    def _group(self, x, c, train, name):
        if self.custom:  # Custom variant: one C2f per group
            from experiment_yolo_tpu.nn.modules import C2f

            return C2f(c, n=1, dtype=self.dtype, name=f"{name}_c2f")(x, train)
        for i in range(4):
            x = _AFPNBasic(c, dtype=self.dtype, name=f"{name}_b{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c0, c1, c2 = self.chans
        x0, x1, x2 = xs
        x0 = ConvBN(c0, 1, dtype=self.dtype, name="scalezero1")(x0, train)
        x1 = ConvBN(c1, 1, dtype=self.dtype, name="scaleone1")(x1, train)
        x2 = ConvBN(c2, 1, dtype=self.dtype, name="scaletwo1")(x2, train)
        s0 = _ASFF(c0, 2, dtype=self.dtype, name="asff_scalezero1")(
            [x0, _afpn_up(x1, c0, 2, train, self.dtype, "up_one1")], train)
        s1 = _ASFF(c1, 2, dtype=self.dtype, name="asff_scaleone1")(
            [ConvBN(c1, 2, 2, p=0, dtype=self.dtype, name="down_zero1")(x0, train), x1], train)
        x0 = self._group(s0, c0, train, "scalezero2")
        x1 = self._group(s1, c1, train, "scaleone2")
        s0 = _ASFF(c0, 3, dtype=self.dtype, name="asff_scalezero2")(
            [x0, _afpn_up(x1, c0, 2, train, self.dtype, "up_one2"),
             _afpn_up(x2, c0, 4, train, self.dtype, "up_two2_4")], train)
        s1 = _ASFF(c1, 3, dtype=self.dtype, name="asff_scaleone2")(
            [ConvBN(c1, 2, 2, p=0, dtype=self.dtype, name="down_zero2_2")(x0, train), x1,
             _afpn_up(x2, c1, 2, train, self.dtype, "up_two2_2")], train)
        s2 = _ASFF(c2, 3, dtype=self.dtype, name="asff_scaletwo2")(
            [ConvBN(c2, 4, 4, p=0, dtype=self.dtype, name="down_zero2_4")(x0, train),
             ConvBN(c2, 2, 2, p=0, dtype=self.dtype, name="down_one2_2")(x1, train), x2], train)
        x0 = self._group(s0, c0, train, "scalezero3")
        x1 = self._group(s1, c1, train, "scaleone3")
        x2 = self._group(s2, c2, train, "scaletwo3")
        # the reference BlockBody_P345 also constructs six stage-3 fusion
        # convs it never calls in forward (afpn.py:228-233) — params kept
        # for state-dict parity, dead-code-eliminated by XLA
        zero = jnp.zeros_like
        _ = ConvBN(c1, 2, 2, p=0, dtype=self.dtype, name="down_zero3_2")(zero(x0), train)
        _ = ConvBN(c2, 4, 4, p=0, dtype=self.dtype, name="down_zero3_4")(zero(x0), train)
        _ = _afpn_up(zero(x1), c0, 2, train, self.dtype, "up_one3_2")
        _ = ConvBN(c2, 2, 2, p=0, dtype=self.dtype, name="down_one3_2")(zero(x1), train)
        _ = _afpn_up(zero(x2), c0, 4, train, self.dtype, "up_two3_4")
        _ = _afpn_up(zero(x2), c1, 2, train, self.dtype, "up_two3_2")
        return x0, x1, x2


class DetectAFPN(nn.Module):
    """Detect_AFPN_P345 / _Custom (extra head.py:86/139): AFPN fusion neck
    inside the head, then standard box/cls towers on the equalized levels."""

    nc: int = 80
    hidc: int = 256
    ch: Tuple[int, ...] = ()
    custom: bool = False
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @property
    def no(self) -> int:
        return self.nc + 4 * self.reg_max

    @nn.compact
    def __call__(self, xs, train: bool = False):
        factor = 4
        red = [c // factor for c in self.ch]
        xs = [ConvBN(red[i], 1, dtype=self.dtype, name=f"conv{i}")(x, train) for i, x in enumerate(xs)]
        body_cls = _AFPNBody345 if len(self.ch) == 3 else _AFPNBody2345
        xs = list(body_cls(tuple(red), custom=self.custom, dtype=self.dtype, name="body")(xs, train))
        xs = [ConvBN(self.hidc, 1, dtype=self.dtype, name=f"conv{i}{i}")(x, train) for i, x in enumerate(xs)]
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], self.nc)
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


class _DyReLU(nn.Module):
    """DyReLU (extra block.py:96, default K2+bias): channel-pooled MLP emits
    per-channel (a1, b1, a2, b2); out = max(x*a1+b1, x*a2+b2)."""

    c: int
    reduction: int = 4
    lambda_a: float = 2.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        sq = self.c // self.reduction
        y = x.mean(axis=(1, 2))
        y = nn.Dense(sq, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(y)
        y = nn.Dense(self.c * 4, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(jax.nn.relu(y))
        y = jax.nn.relu6(y + 3.0) / 6.0  # h_sigmoid
        a1, b1, a2, b2 = jnp.split(y[:, None, None, :], 4, axis=-1)
        a1 = (a1 - 0.5) * self.lambda_a + 1.0
        a2 = (a2 - 0.5) * self.lambda_a
        b1 = b1 - 0.5
        b2 = b2 - 0.5
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


def _resize_align_corners(x, H, W):
    """Bilinear resize with align_corners=True (the DyHead upsample,
    extra block.py:273)."""
    from experiment_yolo_tpu.nn.transformer import _bilinear_sample_zeros

    b, h, w, c = x.shape
    ys = jnp.arange(H, dtype=jnp.float32) * ((h - 1) / max(H - 1, 1))
    xs = jnp.arange(W, dtype=jnp.float32) * ((w - 1) / max(W - 1, 1))
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    loc = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1).reshape(1, -1, 2)
    loc = jnp.broadcast_to(loc, (b, H * W, 2))
    return _bilinear_sample_zeros(x, loc).reshape(b, H, W, c)


class DyHeadBlock(nn.Module):
    """DyHeadBlock (extra block.py:213): scale-aware (shared pooled gate),
    spatial-aware (DCNv2 across neighbor levels, offsets from the mid
    level), task-aware (DyReLU) attention over the level pyramid."""

    c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.ops.dcnv3 import DyDCNv2

        high = DyDCNv2(self.c, dtype=self.dtype, name="spatial_conv_high")
        mid = DyDCNv2(self.c, dtype=self.dtype, name="spatial_conv_mid")
        low = DyDCNv2(self.c, stride=2, dtype=self.dtype, name="spatial_conv_low")
        off_conv = nn.Conv(27, (3, 3), padding=[(1, 1)] * 2,
                           kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                           dtype=self.dtype, param_dtype=jnp.float32, name="spatial_conv_offset")
        scale_conv = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="scale_attn")
        task = _DyReLU(self.c, dtype=self.dtype, name="task_attn")

        def scale_gate(f):
            s = scale_conv(f.mean(axis=(1, 2), keepdims=True))
            return jax.nn.relu6(jax.nn.relu(s) + 3.0) / 6.0  # HSigmoid(bias 3, div 6)

        outs = []
        n = len(xs)
        for lvl in range(n):
            om = off_conv(xs[lvl])
            offset, mask = om[..., :18], jax.nn.sigmoid(om[..., 18:])
            mid_f = mid(xs[lvl], offset, mask)
            sum_f = mid_f * scale_gate(mid_f)
            summed = 1
            if lvl > 0:  # finer level, stride-2 DCN down to this level
                low_f = low(xs[lvl - 1], offset, mask)
                sum_f = sum_f + low_f * scale_gate(low_f)
                summed += 1
            if lvl < n - 1:  # coarser level, DCN then align-corners upsample
                hi = high(xs[lvl + 1], offset, mask)
                hi = _resize_align_corners(hi, xs[lvl].shape[1], xs[lvl].shape[2])
                sum_f = sum_f + hi * scale_gate(hi)
                summed += 1
            outs.append(task(sum_f / summed))
        return outs


class DetectDyHead(nn.Module):
    """Detect_DyHead (extra head.py:20): per-level 1x1 into hidc, block_num
    DyHeadBlocks over the pyramid, then standard box/cls branches."""

    nc: int = 80
    hidc: int = 256
    block_num: int = 2
    ch: Tuple[int, ...] = ()
    reg_max: int = 16
    block: str = "dcnv2"  # dcnv2 | dcnv3 | dcnv4 | prune (extra head.py:76-81/380)
    dtype: Dtype = jnp.float32

    @property
    def no(self) -> int:
        return self.nc + 4 * self.reg_max

    @nn.compact
    def __call__(self, xs, train: bool = False):
        xs = [ConvBN(self.hidc, 1, dtype=self.dtype, name=f"conv_{i}")(x, train) for i, x in enumerate(xs)]
        blk_cls = {"dcnv2": DyHeadBlock, "dcnv3": DyHeadBlockDCNv3,
                   "dcnv4": DyHeadBlockDCNv4, "prune": DyHeadBlock}[self.block]
        nblocks = 1 if self.block == "prune" else self.block_num
        for b in range(nblocks):
            xs = blk_cls(self.hidc, dtype=self.dtype, name=f"dyhead_{b}")(xs, train)
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], self.nc)
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


class DetectAux(nn.Module):
    """Detect with an auxiliary one-to-many training head (reference
    extra_modules/head.py:235 DetectAux).

    Takes 2*nl feature maps: the main Detect branches read the first nl, the
    aux cv4/cv5 branches the last nl. Training returns all 2*nl raw maps
    (``detection_loss`` splits them and applies the looser topk-13 aux
    assignment at 0.25 weight); eval returns only the main nl maps, so
    decode, NMS and stride calibration are untouched and XLA dead-code
    eliminates the aux convs from the compiled predict program — the
    jit-era equivalent of the reference's ``switch_to_deploy``.
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
        nl = len(self.ch) // 2
        main = Detect(nc=self.nc, ch=tuple(self.ch[:nl]), reg_max=self.reg_max,
                      dtype=self.dtype, name="detect")(xs[:nl], train)
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], self.nc)
        aux = []
        for i, x in enumerate(xs[nl:]):
            box = ConvBN(c2, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            box = ConvBN(c2, 3, dtype=self.dtype, name=f"cv4_{i}_1")(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"cv4_{i}_2")(box)
            cls = ConvBN(c3, 3, dtype=self.dtype, name=f"cv5_{i}_0")(x, train)
            cls = ConvBN(c3, 3, dtype=self.dtype, name=f"cv5_{i}_1")(cls, train)
            cls = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"cv5_{i}_2")(cls)
            aux.append(jnp.concatenate([box, cls], axis=-1))
        if not train:
            return main
        return list(main) + aux


# ---------------------------------------------------------------------------
# decode helpers
# ---------------------------------------------------------------------------


def assemble_masks(coeffs: jnp.ndarray, protos: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(coeff . protos) per detection (reference ops.py:process_mask).

    coeffs (B, K, nm) for K selected detections; protos (B, Hp, Wp, nm).
    Returns (B, K, Hp, Wp) mask probabilities.
    """
    return jax.nn.sigmoid(jnp.einsum("bkn,bhwn->bkhw", coeffs, protos))


def decode_kpts(kpt_maps, strides, kpt_shape=(17, 3)):
    """Decode per-level keypoint maps to image coordinates.

    Reference Pose.kpts_decode: xy = (2*sigmoid-ish offsets + anchor-0.5) *
    stride — here the raw regression form (2*pred + anchor - 0.5) * stride,
    visibility sigmoided. Returns (B, A, nk, dims).
    """
    from experiment_yolo_tpu.ops.anchors import make_anchors

    b = kpt_maps[0].shape[0]
    nk, nd = kpt_shape
    flat = jnp.concatenate([k.reshape(b, -1, nk, nd) for k in kpt_maps], axis=1)  # (B, A, nk, nd)
    feat_shapes = [k.shape[1:3] for k in kpt_maps]
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    xy = (flat[..., :2] * 2.0 + (anchors[None, :, None] - 0.5)) * stride_t[None, :, None]
    if nd == 3:
        vis = jax.nn.sigmoid(flat[..., 2:3])
        return jnp.concatenate([xy, vis], -1)
    return xy


def decode_obb_angle(angle_maps):
    """(B, A, ne) angles in (-pi/4, 3pi/4) (reference OBB.forward)."""
    b = angle_maps[0].shape[0]
    flat = jnp.concatenate([a.reshape(b, -1, a.shape[-1]) for a in angle_maps], axis=1)
    return (jax.nn.sigmoid(flat) - 0.25) * jnp.pi


class DyHeadBlockDCNv3(nn.Module):
    """DyHeadBlockWithDCNV3 (extra block.py:283): DyHead whose spatial convs
    are DCNv3 group-4 deformable samplers fed by per-neighbor dw-conv offset
    features; the level's own mask uses sigmoid, the neighbours' use the
    per-group softmax (reference get_offset_mask quirk)."""

    c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        from experiment_yolo_tpu.nn.modules import ConvBN
        from experiment_yolo_tpu.ops.dcnv3 import dcnv3_core

        g, p = 4, 9
        dw_high = ConvBN(self.c, 3, g=self.c, dtype=self.dtype, name="dw_conv_high")
        dw_mid = ConvBN(self.c, 3, g=self.c, dtype=self.dtype, name="dw_conv_mid")
        dw_low = ConvBN(self.c, 3, g=self.c, dtype=self.dtype, name="dw_conv_low")
        off_conv = nn.Conv(3 * g * p, (3, 3), padding=[(1, 1)] * 2, feature_group_count=g,
                           kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                           dtype=self.dtype, param_dtype=jnp.float32, name="spatial_conv_offset")
        scale_conv = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                             name="scale_attn")
        out_high = nn.Dense(self.c, dtype=self.dtype, param_dtype=jnp.float32, name="high_proj")
        out_mid = nn.Dense(self.c, dtype=self.dtype, param_dtype=jnp.float32, name="mid_proj")
        out_low = nn.Dense(self.c, dtype=self.dtype, param_dtype=jnp.float32, name="low_proj")
        task = _DyReLU(self.c, dtype=self.dtype, name="task_attn")

        def scale_gate(f):
            s = scale_conv(f.mean(axis=(1, 2), keepdims=True))
            return jax.nn.relu6(jax.nn.relu(s) + 3.0) / 6.0

        def off_mask(f, sigmoid_quirk):
            om = off_conv(f)
            offset = om[..., : 2 * g * p]
            m = om[..., 2 * g * p:]
            if sigmoid_quirk:
                return offset, jax.nn.sigmoid(m)
            m = jax.nn.softmax(m.reshape(*m.shape[:-1], g, p), -1)
            return offset, m.reshape(*m.shape[:-2], g * p)

        outs = []
        n = len(xs)
        for lvl in range(n):
            o, m = off_mask(dw_mid(xs[lvl], train), True)
            mid_f = out_mid(dcnv3_core(xs[lvl], o, m, group=g))
            sum_f = mid_f * scale_gate(mid_f)
            summed = 1
            if lvl > 0:
                o, m = off_mask(dw_low(xs[lvl - 1], train), False)
                # stride-2 sampler: offsets computed at full res are taken at
                # the stride-2 output grid (the reference feeds a full-res
                # offset map to its stride-2 CUDA op, which reads the
                # output-grid subset)
                low_f = out_low(dcnv3_core(xs[lvl - 1], o[:, ::2, ::2], m[:, ::2, ::2],
                                           stride=2, group=g))
                sum_f = sum_f + low_f * scale_gate(low_f)
                summed += 1
            if lvl < n - 1:
                o, m = off_mask(dw_high(xs[lvl + 1], train), False)
                hi = out_high(dcnv3_core(xs[lvl + 1], o, m, group=g))
                hi = _resize_align_corners(hi, xs[lvl].shape[1], xs[lvl].shape[2])
                sum_f = sum_f + hi * scale_gate(hi)
                summed += 1
            outs.append(task(sum_f / summed))
        return outs


class DyHeadBlockDCNv4(nn.Module):
    """DyHeadBlockWithDCNV4 (extra block.py:373): group-1 DCNv4 samplers with
    a fused 1x1 offset+mask head (channels padded to a multiple of 8) and
    UNNORMALIZED v4 masks; the low path samples at stride 1 then max-pools.
    The reference depends on the external DCNv4 CUDA package (absent there
    too); sampler internals follow the published DCNv4 module layout."""

    c: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        import math as _m

        from experiment_yolo_tpu.nn.modules import ConvBN
        from experiment_yolo_tpu.ops.dcnv3 import dcnv3_core

        p = 9
        om_dim = int(_m.ceil((p * 3) / 8) * 8)
        dw_high = ConvBN(self.c, 3, g=self.c, dtype=self.dtype, name="dw_conv_high")
        dw_mid = ConvBN(self.c, 3, g=self.c, dtype=self.dtype, name="dw_conv_mid")
        dw_low = ConvBN(self.c, 3, g=self.c, dtype=self.dtype, name="dw_conv_low")
        off_conv = nn.Conv(om_dim, (1, 1), kernel_init=nn.initializers.zeros,
                           bias_init=nn.initializers.zeros, use_bias=True,
                           dtype=self.dtype, param_dtype=jnp.float32, name="spatial_conv_offset")
        scale_conv = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                             name="scale_attn")
        out_high = nn.Dense(self.c, dtype=self.dtype, param_dtype=jnp.float32, name="high_proj")
        out_mid = nn.Dense(self.c, dtype=self.dtype, param_dtype=jnp.float32, name="mid_proj")
        out_low = nn.Dense(self.c, dtype=self.dtype, param_dtype=jnp.float32, name="low_proj")
        task = _DyReLU(self.c, dtype=self.dtype, name="task_attn")

        def scale_gate(f):
            s = scale_conv(f.mean(axis=(1, 2), keepdims=True))
            return jax.nn.relu6(jax.nn.relu(s) + 3.0) / 6.0

        def off_mask(f):
            om = off_conv(f)
            return om[..., : 2 * p], om[..., 2 * p: 3 * p]

        outs = []
        n = len(xs)
        for lvl in range(n):
            o, m = off_mask(dw_mid(xs[lvl], train))
            mid_f = out_mid(dcnv3_core(xs[lvl], o, m, group=1))
            sum_f = mid_f * scale_gate(mid_f)
            summed = 1
            if lvl > 0:
                o, m = off_mask(dw_low(xs[lvl - 1], train))
                low_f = out_low(dcnv3_core(xs[lvl - 1], o, m, group=1))
                low_f = nn.max_pool(low_f, (2, 2), strides=(2, 2))
                sum_f = sum_f + low_f * scale_gate(low_f)
                summed += 1
            if lvl < n - 1:
                o, m = off_mask(dw_high(xs[lvl + 1], train))
                hi = out_high(dcnv3_core(xs[lvl + 1], o, m, group=1))
                hi = _resize_align_corners(hi, xs[lvl].shape[1], xs[lvl].shape[2])
                sum_f = sum_f + hi * scale_gate(hi)
                summed += 1
            outs.append(task(sum_f / summed))
        return outs


class _AFPNBody2345(nn.Module):
    """BlockBody_P2345 (afpn.py:329) / _Custom (afpn.py:472): progressive
    2-, 3-, then 4-level ASFF fusion over a P2-P5 pyramid."""

    chans: Tuple[int, int, int, int]
    custom: bool = False
    dtype: Dtype = jnp.float32

    def _group(self, x, c, train, name):
        if self.custom:
            from experiment_yolo_tpu.nn.modules import C2f

            return C2f(c, n=1, dtype=self.dtype, name=f"{name}_c2f")(x, train)
        for i in range(4):
            x = _AFPNBasic(c, dtype=self.dtype, name=f"{name}_b{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c0, c1, c2, c3 = self.chans
        x0, x1, x2, x3 = xs
        x0 = ConvBN(c0, 1, dtype=self.dtype, name="scalezero1")(x0, train)
        x1 = ConvBN(c1, 1, dtype=self.dtype, name="scaleone1")(x1, train)
        x2 = ConvBN(c2, 1, dtype=self.dtype, name="scaletwo1")(x2, train)
        x3 = ConvBN(c3, 1, dtype=self.dtype, name="scalethree1")(x3, train)

        s0 = _ASFF(c0, 2, dtype=self.dtype, name="asff_scalezero1")(
            [x0, _afpn_up(x1, c0, 2, train, self.dtype, "up_one1_2")], train)
        s1 = _ASFF(c1, 2, dtype=self.dtype, name="asff_scaleone1")(
            [ConvBN(c1, 2, 2, p=0, dtype=self.dtype, name="down_zero1_2")(x0, train), x1], train)
        x0 = self._group(s0, c0, train, "scalezero2")
        x1 = self._group(s1, c1, train, "scaleone2")

        s0 = _ASFF(c0, 3, dtype=self.dtype, name="asff_scalezero2")(
            [x0, _afpn_up(x1, c0, 2, train, self.dtype, "up_one2_2"),
             _afpn_up(x2, c0, 4, train, self.dtype, "up_two2_4")], train)
        s1 = _ASFF(c1, 3, dtype=self.dtype, name="asff_scaleone2")(
            [ConvBN(c1, 2, 2, p=0, dtype=self.dtype, name="down_zero2_2")(x0, train), x1,
             _afpn_up(x2, c1, 2, train, self.dtype, "up_two2_2")], train)
        s2 = _ASFF(c2, 3, dtype=self.dtype, name="asff_scaletwo2")(
            [ConvBN(c2, 4, 4, p=0, dtype=self.dtype, name="down_zero2_4")(x0, train),
             ConvBN(c2, 2, 2, p=0, dtype=self.dtype, name="down_one2_2")(x1, train), x2], train)
        x0 = self._group(s0, c0, train, "scalezero3")
        x1 = self._group(s1, c1, train, "scaleone3")
        x2 = self._group(s2, c2, train, "scaletwo3")

        s0 = _ASFF(c0, 4, dtype=self.dtype, name="asff_scalezero3")(
            [x0, _afpn_up(x1, c0, 2, train, self.dtype, "up_one3_2"),
             _afpn_up(x2, c0, 4, train, self.dtype, "up_two3_4"),
             _afpn_up(x3, c0, 8, train, self.dtype, "up_three3_8")], train)
        s1 = _ASFF(c1, 4, dtype=self.dtype, name="asff_scaleone3")(
            [ConvBN(c1, 2, 2, p=0, dtype=self.dtype, name="down_zero3_2")(x0, train), x1,
             _afpn_up(x2, c1, 2, train, self.dtype, "up_two3_2"),
             _afpn_up(x3, c1, 4, train, self.dtype, "up_three3_4")], train)
        s2 = _ASFF(c2, 4, dtype=self.dtype, name="asff_scaletwo3")(
            [ConvBN(c2, 4, 4, p=0, dtype=self.dtype, name="down_zero3_4")(x0, train),
             ConvBN(c2, 2, 2, p=0, dtype=self.dtype, name="down_one3_2")(x1, train), x2,
             _afpn_up(x3, c2, 2, train, self.dtype, "up_three3_2")], train)
        s3 = _ASFF(c3, 4, dtype=self.dtype, name="asff_scalethree3")(
            [ConvBN(c3, 8, 8, p=0, dtype=self.dtype, name="down_zero3_8")(x0, train),
             ConvBN(c3, 4, 4, p=0, dtype=self.dtype, name="down_one3_4")(x1, train),
             ConvBN(c3, 2, 2, p=0, dtype=self.dtype, name="down_two3_2")(x2, train), x3], train)
        x0 = self._group(s0, c0, train, "scalezero4")
        x1 = self._group(s1, c1, train, "scaleone4")
        x2 = self._group(s2, c2, train, "scaletwo4")
        x3 = self._group(s3, c3, train, "scalethree4")
        return x0, x1, x2, x3
