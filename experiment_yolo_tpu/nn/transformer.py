"""Transformer modules: AIFI encoder and the RT-DETR deformable decoder.

Rebuild of the reference's ``nn/modules/transformer.py`` (AIFI:86,
MSDeformAttn:216, DeformableTransformerDecoder(Layer):310/373) and
``nn/modules/head.py:RTDETRDecoder:210``, plus ``nn/modules/utils.py``'s
pure-torch multi-scale deformable attention fallback — here the deformable
sampling is a batched jnp bilinear gather with zero padding (one fused
XLA program; no CUDA extension needed).

Layout: feature maps NHWC; token sequences (B, L, C).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from experiment_yolo_tpu.nn.norm import BatchNorm as MemBatchNorm

from experiment_yolo_tpu.nn.modules import ConvBN

Dtype = Any


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


class MLP(nn.Module):
    """n-layer perceptron with ReLU between layers (transformer.py:MLP)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"l{i}")(x))
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"l{self.num_layers - 1}")(x)


def sincos_2d(w: int, h: int, dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """2D sine-cosine position embedding (AIFI.build_2d_sincos...)."""
    assert dim % 4 == 0
    gw, gh = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="ij")
    pos_dim = dim // 4
    omega = 1.0 / (temperature ** (jnp.arange(pos_dim, dtype=jnp.float32) / pos_dim))
    out_w = gw.reshape(-1, 1) * omega[None]
    out_h = gh.reshape(-1, 1) * omega[None]
    return jnp.concatenate([jnp.sin(out_w), jnp.cos(out_w), jnp.sin(out_h), jnp.cos(out_h)], 1)[None]


class AIFI(nn.Module):
    """Attention-based intra-scale feature interaction on the P5 map.

    Reference transformer.py:86 — one post-norm transformer encoder layer
    over flattened tokens with 2D sincos positions. YAML args: [cm, nheads].
    """

    cm: int = 2048
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        # NOTE: torch flattens NCHW as h-major tokens; NHWC flatten matches
        pos = sincos_2d(w, h, c)
        # torch meshgrid(w,h,'ij') flattens w-major; our tokens are h-major:
        pos = pos.reshape(1, w, h, c).transpose(0, 2, 1, 3).reshape(1, h * w, c)
        src = x.reshape(b, h * w, c)
        q = k = src + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, param_dtype=jnp.float32, name="ma"
        )(q, k, src)
        src = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(src + attn)
        ffn = nn.Dense(self.cm, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(src)
        ffn = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(jax.nn.gelu(ffn))
        src = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(src + ffn)
        return src.reshape(b, h, w, c)


def _bilinear_sample_zeros(value: jnp.ndarray, loc: jnp.ndarray) -> jnp.ndarray:
    """grid_sample(align_corners=False, padding=zeros) equivalent.

    value: (B, H, W, C); loc: (B, Q, 2) normalized [0,1] (x, y).
    Returns (B, Q, C).
    """
    b, h, w, c = value.shape
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    out = 0.0
    vflat = value.reshape(b, h * w, c)
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (1 - jnp.abs(x - xi)) * (1 - jnp.abs(y - yi))
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = (jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
            g = jnp.take_along_axis(vflat, idx[..., None], axis=1)
            out = out + jnp.where(valid[..., None], wgt[..., None] * g, 0.0)
    return out


class MSDeformAttn(nn.Module):
    """Multi-scale deformable attention (transformer.py:216).

    Query-conditioned sampling offsets around reference boxes; bilinear
    samples from each level's value map, attention-weighted sum.
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Dtype = jnp.float32

    def _offset_bias_init(self, rng, shape, dtype=jnp.float32):
        """Reference _reset_parameters: ring-of-directions bias so initial
        sampling points fan out around the reference."""
        thetas = np.arange(self.n_heads) * (2.0 * math.pi / self.n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, self.n_levels, self.n_points, 1))
        for i in range(self.n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    @nn.compact
    def __call__(self, query, refer_bbox, value_tokens, value_shapes):
        """query (B,Q,C); refer_bbox (B,Q,4) normalized cxcywh;
        value_tokens (B,L,C); value_shapes [(H,W), ...]."""
        b, q, c = query.shape
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        dh = self.d_model // nh
        value = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="value_proj")(value_tokens)
        offsets = nn.Dense(
            nh * nl * npts * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=self._offset_bias_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="sampling_offsets",
        )(query).reshape(b, q, nh, nl, npts, 2)
        attn = nn.Dense(
            nh * nl * npts, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="attention_weights",
        )(query).reshape(b, q, nh, nl * npts)
        attn = jax.nn.softmax(attn, -1).reshape(b, q, nh, nl, npts)

        # sampling locations from 4-coord reference boxes (head.py path)
        add = offsets / npts * refer_bbox[:, :, None, None, None, 2:4] * 0.5
        loc = refer_bbox[:, :, None, None, None, :2] + add  # (B,Q,nh,nl,np,2)

        # sample per level
        start = 0
        outs = []
        for li, (hh, ww) in enumerate(value_shapes):
            v = value[:, start : start + hh * ww].reshape(b, hh, ww, nh, dh)
            v = v.transpose(0, 3, 1, 2, 4).reshape(b * nh, hh, ww, dh)
            l_loc = loc[:, :, :, li].transpose(0, 2, 1, 3, 4).reshape(b * nh, q * npts, 2)
            sampled = _bilinear_sample_zeros(v, l_loc).reshape(b, nh, q, npts, dh)
            outs.append(sampled)
            start += hh * ww
        stacked = jnp.stack(outs, axis=3)  # (B, nh, Q, nl, np, dh)
        weighted = (stacked * attn.transpose(0, 2, 1, 3, 4)[..., None]).sum(axis=(3, 4))  # (B,nh,Q,dh)
        out = weighted.transpose(0, 2, 1, 3).reshape(b, q, self.d_model)
        return nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="output_proj")(out)


class DeformableDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (transformer.py:310)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, shapes, query_pos, attn_mask=None):
        q = k = embed + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, param_dtype=jnp.float32, name="self_attn"
        )(q, k, embed, mask=attn_mask)
        embed = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(embed + attn)
        cross = MSDeformAttn(
            self.d_model, self.n_levels, self.n_heads, self.n_points, dtype=self.dtype, name="cross_attn"
        )(embed + query_pos, refer_bbox, feats, shapes)
        embed = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(embed + cross)
        ffn = nn.Dense(self.d_ffn, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(embed)
        ffn = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32, name="linear2")(jax.nn.relu(ffn))
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="norm3")(embed + ffn)


class RTDETRDecoder(nn.Module):
    """RT-DETR head: encoder query selection + deformable decoder.

    Reference head.py:210. Returns, at inference, (B, nq, 4 + nc) with
    normalized cxcywh boxes and sigmoided scores; in train mode, the
    per-layer decoder boxes/scores plus encoder outputs (for a DETR loss),
    and — when `dn_gt`/`dn_rng` are supplied — the contrastive denoising
    group outputs (reference models/utils/ops.py:153 get_cdn_group),
    rebuilt with STATIC shapes: the padded GT width M fixes the group size,
    so 2*num_group*M denoising queries join the decoder under a block
    self-attention mask and padded slots mask out of the loss.
    """

    nc: int = 80
    ch: Tuple[int, ...] = ()
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    num_dn: int = 100
    cls_noise_ratio: float = 0.5
    box_noise_scale: float = 1.0
    dtype: Dtype = jnp.float32

    dn_aware = True  # GraphModel threads dn_gt/dn_rng to this head

    def _cdn(self, dn_gt, dn_rng, class_embed):
        """Static-shape get_cdn_group: noised positive + shifted negative
        copies of every (padded) GT slot, num_group copies each."""
        gt_bboxes = dn_gt["bboxes"].astype(jnp.float32)  # (B, M, 4) cxcywh
        gt_cls = dn_gt["cls"].astype(jnp.int32)  # (B, M)
        mask_gt = dn_gt["mask"].astype(jnp.bool_)
        B, M = gt_cls.shape
        num_group = max(1, self.num_dn // max(M, 1))
        D = 2 * num_group * M
        k1, k2, k3, k4 = jax.random.split(dn_rng, 4)
        cls_r = jnp.tile(gt_cls, (1, 2 * num_group))  # (B, D)
        box_r = jnp.tile(gt_bboxes, (1, 2 * num_group, 1))  # (B, D, 4)
        # class noise on half of cls_noise_ratio slots
        flip = jax.random.uniform(k1, (B, D)) < (self.cls_noise_ratio * 0.5)
        rand_lbl = jax.random.randint(k2, (B, D), 0, self.nc)
        cls_r = jnp.where(flip, rand_lbl, cls_r)
        # box noise: positives jitter within the box, negatives are pushed
        # one box-width outside (the contrastive part)
        xy, wh = box_r[..., :2], box_r[..., 2:]
        xyxy = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        diff = jnp.tile(wh * 0.5, (1, 1, 2)) * self.box_noise_scale
        sign = jax.random.randint(k3, (B, D, 4), 0, 2).astype(jnp.float32) * 2.0 - 1.0
        part = jax.random.uniform(k4, (B, D, 4))
        is_neg = (jnp.arange(D) // (num_group * M)) == 1  # second half
        part = part + is_neg[None, :, None].astype(part.dtype)
        xyxy = jnp.clip(xyxy + part * sign * diff, 0.0, 1.0)
        nxy = (xyxy[..., :2] + xyxy[..., 2:]) / 2
        nwh = xyxy[..., 2:] - xyxy[..., :2]
        box_n = jnp.concatenate([nxy, nwh], -1)
        box_logit = jnp.log(jnp.clip(box_n, 1e-6, 1) / jnp.clip(1 - box_n, 1e-6, 1))
        dn_embed = class_embed[cls_r]  # (B, D, hd)
        # block mask (True = may attend): matching queries never see dn;
        # dn groups see only their own group (2M-wide pos+neg pair blocks
        # in the reference use per-group isolation of the positive+negative
        # pair block; reference masks groups of size 2*M... its layout is
        # [g0..g{n-1} positives][g0..g{n-1} negatives]; each group index is
        # isolated per i in both halves)
        T = D + self.nq
        grp = jnp.arange(D) % (num_group * M) // M  # group id within half
        same = grp[:, None] == grp[None, :]
        allow = jnp.ones((T, T), bool)
        allow = allow.at[:D, :D].set(same)
        allow = allow.at[D:, :D].set(False)
        return dn_embed, box_logit, allow, {"num_group": num_group, "M": M, "D": D}

    @nn.compact
    def __call__(self, xs, train: bool = False, dn_gt=None, dn_rng=None):
        b = xs[0].shape[0]
        nl = len(xs)
        class_embed = self.param("denoising_class_embed", nn.initializers.normal(1.0),
                                 (self.nc, self.hd), jnp.float32)
        # input projection + flatten (NHWC tokens are h-major like torch)
        feats_l, shapes = [], []
        for i, x in enumerate(xs):
            p = nn.Conv(self.hd, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"input_proj_{i}")(x)
            p = MemBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                             dtype=self.dtype, param_dtype=jnp.float32, name=f"input_proj_bn_{i}")(p)
            h, w = p.shape[1:3]
            feats_l.append(p.reshape(b, h * w, self.hd))
            shapes.append((h, w))
        feats = jnp.concatenate(feats_l, 1)  # (B, L, hd)

        # anchors in logit space (head.py:_generate_anchors)
        anchors, valid = [], []
        for i, (h, w) in enumerate(shapes):
            gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
            xy = (jnp.stack([gx, gy], -1) + 0.5) / jnp.asarray([w, h], jnp.float32)
            wh = jnp.full((h, w, 2), 0.05 * 2.0**i, jnp.float32)
            anchors.append(jnp.concatenate([xy, wh], -1).reshape(h * w, 4))
        anchors = jnp.concatenate(anchors, 0)  # (L, 4)
        eps = 1e-2
        valid_mask = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors = jnp.where(valid_mask, jnp.log(anchors / (1 - anchors)), jnp.inf)

        # encoder head + query selection
        enc_feats = nn.Dense(self.hd, dtype=self.dtype, param_dtype=jnp.float32, name="enc_output")(
            feats * valid_mask[None].astype(feats.dtype)
        )
        enc_feats = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32, name="enc_output_norm")(enc_feats)
        bias_cls = float(-np.log((1 - 0.01) / 0.01)) / 80 * self.nc
        enc_scores = nn.Dense(self.nc, bias_init=nn.initializers.constant(bias_cls),
                              dtype=self.dtype, param_dtype=jnp.float32, name="enc_score_head")(enc_feats)
        nq = min(self.nq, enc_scores.shape[1])  # tiny inputs: fewer tokens than queries
        _, topk_idx = jax.lax.top_k(enc_scores.max(-1), nq)  # (B, nq)
        top_feats = jnp.take_along_axis(enc_feats, topk_idx[..., None], axis=1)  # (B, nq, hd)
        top_anchors = anchors[topk_idx]  # (B, nq, 4)
        enc_box_delta = MLP(self.hd, 4, 3, dtype=self.dtype, name="enc_bbox_head")(top_feats)
        refer_bbox = enc_box_delta + top_anchors
        enc_bboxes = jax.nn.sigmoid(refer_bbox)
        enc_top_scores = jnp.take_along_axis(enc_scores, topk_idx[..., None], axis=1)

        # decoder with iterative box refinement (+ optional denoising)
        embed = jax.lax.stop_gradient(top_feats) if train else top_feats
        refer_l = jax.lax.stop_gradient(refer_bbox) if train else refer_bbox
        attn_mask = None
        dn_meta = None
        if train and dn_gt is not None and dn_rng is not None:
            dn_embed, dn_logit, allow, dn_meta = self._cdn(dn_gt, dn_rng, class_embed)
            D = dn_meta["D"]
            embed = jnp.concatenate([dn_embed.astype(embed.dtype), embed], 1)
            refer_l = jnp.concatenate([dn_logit.astype(refer_l.dtype), refer_l], 1)
            T = D + nq
            attn_mask = allow[:T, :T][None, None]  # (1, 1, T, T)
        refer = jax.nn.sigmoid(refer_l)
        dec_bboxes, dec_scores = [], []
        out = embed
        qpos_head = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype, name="query_pos_head")
        for i in range(self.ndl):
            qpos = qpos_head(refer)
            out = DeformableDecoderLayer(
                self.hd, self.nh, self.d_ffn, nl, self.ndp, dtype=self.dtype, name=f"layer{i}"
            )(out, refer, feats, shapes, qpos, attn_mask)
            delta = MLP(self.hd, 4, 3, dtype=self.dtype, name=f"dec_bbox_head{i}")(out)
            refined = jax.nn.sigmoid(delta + inverse_sigmoid(refer))
            score = nn.Dense(self.nc, bias_init=nn.initializers.constant(bias_cls),
                             dtype=self.dtype, param_dtype=jnp.float32, name=f"dec_score_head{i}")(out)
            dec_bboxes.append(refined)
            dec_scores.append(score)
            refer = jax.lax.stop_gradient(refined) if train else refined
        if train:
            dbox = jnp.stack(dec_bboxes)
            dscore = jnp.stack(dec_scores)
            outd = {
                "dec_bboxes": dbox,
                "dec_scores": dscore,
                "enc_bboxes": enc_bboxes,
                "enc_scores": enc_top_scores,
            }
            if dn_meta is not None:
                D = dn_meta["D"]
                outd["dn_bboxes"] = dbox[:, :, :D]
                outd["dn_scores"] = dscore[:, :, :D]
                outd["dec_bboxes"] = dbox[:, :, D:]
                outd["dec_scores"] = dscore[:, :, D:]
                outd["dn_num_group"] = dn_meta["num_group"]
            return outd
        return jnp.concatenate([dec_bboxes[-1], jax.nn.sigmoid(dec_scores[-1])], -1)  # (B, nq, 4+nc)
