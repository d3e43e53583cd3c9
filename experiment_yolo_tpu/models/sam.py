"""SAM — Segment Anything in flax (reference ultralytics/models/sam/).

Rebuild of the reference's SAM stack (modules/encoders.py: ImageEncoderViT,
PromptEncoder; modules/transformer.py: TwoWayTransformer; modules/
decoders.py: MaskDecoder; modules/sam.py: Sam; build.py: vit_b/l/h
configurations; predict.py: the prompt/inference flow). NHWC, static
shapes; the whole encode+prompt+decode path jits into one XLA program per
(image size, prompt count).

MobileSAM's TinyViT encoder is not included (its checkpoints target the
torch hub); the three ViT variants cover the reference's SAM surface.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# encoder_embed_dim, depth, num_heads, global_attn_indexes (build.py:21-52)
SAM_CFGS = {
    "vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "vit_l": (1024, 24, 16, (5, 11, 17, 23)),
    "vit_h": (1280, 32, 16, (7, 15, 23, 31)),
}


def _ln(x, dtype, name):
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, param_dtype=jnp.float32, name=name)(x)


class _ViTAttention(nn.Module):
    """ViTDet attention with decomposed relative positions
    (encoders.py:397 Attention + add_decomposed_rel_pos)."""

    dim: int
    num_heads: int
    input_size: Tuple[int, int]
    use_rel_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        b, h, w, c = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        qkv = qkv.reshape(3, b * self.num_heads, h * w, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd**-0.5) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd), jnp.float32)
            # q == k size: relative index = (i - j) + (size - 1)
            ih = jnp.arange(h)[:, None] - jnp.arange(h)[None, :] + (h - 1)
            iw = jnp.arange(w)[:, None] - jnp.arange(w)[None, :] + (w - 1)
            Rh = rel_h[ih].astype(q.dtype)  # (h, h, hd)
            Rw = rel_w[iw].astype(q.dtype)  # (w, w, hd)
            rq = q.reshape(-1, h, w, hd)
            reh = jnp.einsum("bhwc,hkc->bhwk", rq, Rh)
            rew = jnp.einsum("bhwc,wkc->bhwk", rq, Rw)
            attn = attn.reshape(-1, h, w, h, w) + reh[..., :, None] + rew[..., None, :]
            attn = attn.reshape(-1, h * w, h * w)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).reshape(b, self.num_heads, h, w, hd).transpose(0, 2, 3, 1, 4).reshape(b, h, w, c)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


class _ViTBlock(nn.Module):
    """Windowed/global transformer block (encoders.py:332)."""

    dim: int
    num_heads: int
    window: int  # 0 = global
    grid: Tuple[int, int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = _ln(x, self.dtype, "norm1")
        if self.window > 0:
            B, H, W, C = y.shape
            ws = self.window
            ph, pw = (ws - H % ws) % ws, (ws - W % ws) % ws
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
            Hp, Wp = H + ph, W + pw
            y = y.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
        size = (self.window, self.window) if self.window > 0 else self.grid
        y = _ViTAttention(self.dim, self.num_heads, size, dtype=self.dtype, name="attn")(y)
        if self.window > 0:
            y = y.reshape(B, Hp // ws, Wp // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            y = y[:, :H, :W]
        x = shortcut + y
        z = _ln(x, self.dtype, "norm2")
        z = nn.Dense(self.dim * 4, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_lin1")(z)
        z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_lin2")(jax.nn.gelu(z))
        return x + z


def ln2d_core(x, w, b):
    """LayerNorm2d math with explicit params (shared with parallel/pipeline)."""
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * w + b


def _ln2d(x, c, dtype, name, parent):
    """LayerNorm2d (channel-wise affine LN over the channel axis)."""
    w = parent.param(f"{name}_w", nn.initializers.ones, (c,), jnp.float32)
    b = parent.param(f"{name}_b", nn.initializers.zeros, (c,), jnp.float32)
    return ln2d_core(x, w, b)


class ImageEncoderViT(nn.Module):
    """ViTDet image encoder (encoders.py:13): 16x16 patch embed, abs pos,
    windowed blocks with 4 global-attention layers, conv neck to 256ch."""

    variant: str = "vit_b"
    img_size: int = 1024
    out_chans: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) normalized
        dim, depth, heads, global_idx = SAM_CFGS[self.variant]
        g = self.img_size // 16
        x = nn.Conv(dim, (16, 16), strides=(16, 16), dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros, (1, g, g, dim), jnp.float32)
        if x.shape[1] != g:  # smaller inference sizes reuse a resized table
            pos = jax.image.resize(pos, (1, x.shape[1], x.shape[2], dim), "bilinear")
        x = x + pos.astype(x.dtype)
        for i in range(depth):
            x = _ViTBlock(dim, heads, window=0 if i in global_idx else 14,
                          grid=(x.shape[1], x.shape[2]), dtype=self.dtype, name=f"block{i}")(x)
        y = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="neck_conv1")(x)
        y = _ln2d(y, self.out_chans, self.dtype, "neck_ln1", self)
        y = nn.Conv(self.out_chans, (3, 3), padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="neck_conv2")(y)
        return _ln2d(y, self.out_chans, self.dtype, "neck_ln2", self)


class PromptEncoder(nn.Module):
    """Point/box/mask prompt encoder (encoders.py:128)."""

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(1.0), (2, self.embed_dim // 2), jnp.float32
        )
        # 0: negative point, 1: positive point, 2/3: box corners; 4: not-a-point
        self.point_embed = self.param("point_embed", nn.initializers.normal(1.0), (5, self.embed_dim), jnp.float32)
        self.no_mask_embed = self.param("no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,), jnp.float32)
        self.mask_down1 = nn.Conv(self.mask_in_chans // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                                  param_dtype=jnp.float32, name="mask_down1")
        self.mask_down2 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2), dtype=self.dtype,
                                  param_dtype=jnp.float32, name="mask_down2")
        self.mask_down3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                                  param_dtype=jnp.float32, name="mask_down3")
        c4, c = self.mask_in_chans // 4, self.mask_in_chans
        self.mask_ln1_w = self.param("mask_ln1_w", nn.initializers.ones, (c4,), jnp.float32)
        self.mask_ln1_b = self.param("mask_ln1_b", nn.initializers.zeros, (c4,), jnp.float32)
        self.mask_ln2_w = self.param("mask_ln2_w", nn.initializers.ones, (c,), jnp.float32)
        self.mask_ln2_b = self.param("mask_ln2_b", nn.initializers.zeros, (c,), jnp.float32)

    def _pe(self, coords):  # coords normalized [0,1], (..., 2)
        c = (2 * coords - 1) @ self.pe_gaussian
        c = 2 * jnp.pi * c
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)

    def dense_pe(self):
        h, w = self.image_embedding_size
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1)
        return self._pe(grid)[None]  # (1, H, W, C)

    def __call__(self, points: Optional[jnp.ndarray], labels: Optional[jnp.ndarray],
                 boxes: Optional[jnp.ndarray] = None, masks: Optional[jnp.ndarray] = None):
        """points (B,N,2) px, labels (B,N) in {-1 pad, 0 neg, 1 pos};
        boxes (B,4) xyxy px. Returns (sparse (B,T,C), dense (B,h,w,C))."""
        H, W = self.input_image_size
        sparse = []
        if points is not None:
            if boxes is None:  # reference pads points with one not-a-point
                b = points.shape[0]
                points = jnp.concatenate([points, jnp.zeros((b, 1, 2), points.dtype)], 1)
                labels = jnp.concatenate([labels, -jnp.ones((b, 1), labels.dtype)], 1)
            pts = (points + 0.5) / jnp.asarray([W, H], jnp.float32)
            pe = self._pe(pts)
            lbl = labels[..., None]
            pe = jnp.where(lbl == -1, self.point_embed[4], jnp.where(lbl == 0, pe + self.point_embed[0], pe + self.point_embed[1]))
            sparse.append(pe)
        if boxes is not None:
            corners = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray([W, H], jnp.float32)
            ce = self._pe(corners) + self.point_embed[2:4][None]
            sparse.append(ce)
        sparse_out = jnp.concatenate(sparse, axis=1) if sparse else jnp.zeros((1, 0, self.embed_dim))
        h, w = self.image_embedding_size
        if masks is None:  # params must exist regardless; XLA DCEs the dead branch
            masks = jnp.zeros((sparse_out.shape[0], 4 * h, 4 * w, 1), jnp.float32)
            use_mask = False
        else:
            use_mask = True
        def ln2d(t, wgt, bias):
            mu = t.mean(-1, keepdims=True)
            var = ((t - mu) ** 2).mean(-1, keepdims=True)
            return (t - mu) * jax.lax.rsqrt(var + 1e-6) * wgt + bias

        y = self.mask_down1(masks)
        y = jax.nn.gelu(ln2d(y, self.mask_ln1_w, self.mask_ln1_b))
        y = self.mask_down2(y)
        y = jax.nn.gelu(ln2d(y, self.mask_ln2_w, self.mask_ln2_b))
        mask_dense = self.mask_down3(y)
        if use_mask:
            return sparse_out, mask_dense
        dense = jnp.broadcast_to(self.no_mask_embed, (sparse_out.shape[0], h, w, self.embed_dim))
        return sparse_out, dense


class _PromptAttention(nn.Module):
    """Downsampled multi-head attention (transformer.py:176)."""

    dim: int
    num_heads: int
    downsample: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        hd = d // self.num_heads
        qp = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="q_proj")(q)
        kp = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="k_proj")(k)
        vp = nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name="v_proj")(v)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jax.nn.softmax(qh @ kh.transpose(0, 1, 3, 2) / math.sqrt(hd), axis=-1)
        out = (attn @ vh).transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], d)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)


class TwoWayTransformer(nn.Module):
    """Two-way transformer decoder (transformer.py:9)."""

    depth: int = 2
    dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embed, image_pe, tokens):
        b, h, w, c = image_embed.shape
        keys = image_embed.reshape(b, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, h * w, c), keys.shape)
        queries = tokens
        for i in range(self.depth):
            # self attention (first layer attends raw queries)
            q = queries if i == 0 else queries + tokens
            sa = _PromptAttention(self.dim, self.num_heads, 1, dtype=self.dtype, name=f"l{i}_self")(q, q, queries)
            queries = _ln(queries + sa if i > 0 else sa, self.dtype, f"l{i}_norm1")
            # token -> image
            q = queries + tokens
            k = keys + key_pe
            ca = _PromptAttention(self.dim, self.num_heads, 2, dtype=self.dtype, name=f"l{i}_t2i")(q, k, keys)
            queries = _ln(queries + ca, self.dtype, f"l{i}_norm2")
            # mlp
            z = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"l{i}_mlp1")(queries)
            z = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name=f"l{i}_mlp2")(jax.nn.relu(z))
            queries = _ln(queries + z, self.dtype, f"l{i}_norm3")
            # image -> token
            q = queries + tokens
            k = keys + key_pe
            ca = _PromptAttention(self.dim, self.num_heads, 2, dtype=self.dtype, name=f"l{i}_i2t")(k, q, queries)
            keys = _ln(keys + ca, self.dtype, f"l{i}_norm4")
        q = queries + tokens
        k = keys + key_pe
        fa = _PromptAttention(self.dim, self.num_heads, 2, dtype=self.dtype, name="final_t2i")(q, k, keys)
        queries = _ln(queries + fa, self.dtype, "norm_final")
        return queries, keys


class _MLP(nn.Module):
    hidden: int
    out: int
    layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name=f"l{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32, name=f"l{self.layers - 1}")(x)


class MaskDecoder(nn.Module):
    """Mask decoder (decoders.py:10): output tokens + two-way transformer +
    2x2 transpose-conv upscaling + per-token hypernetwork MLPs + IoU head."""

    dim: int = 256
    num_multimask: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse, dense, multimask_output: bool = True):
        nm = self.num_multimask + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, self.dim), jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0), (nm, self.dim), jnp.float32)
        b = sparse.shape[0]
        out_tokens = jnp.broadcast_to(jnp.concatenate([iou_token, mask_tokens], 0)[None], (b, 1 + nm, self.dim))
        tokens = jnp.concatenate([out_tokens, sparse], axis=1)
        src = image_embed + dense
        hs, keys = TwoWayTransformer(dtype=self.dtype, name="transformer")(src, image_pe, tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1 : 1 + nm]
        h, w = image_embed.shape[1:3]
        y = keys.reshape(b, h, w, self.dim)
        y = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=jnp.float32, name="upscale1")(y)
        y = jax.nn.gelu(_ln2d(y, self.dim // 4, self.dtype, "upscale_ln", self))
        y = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2), dtype=self.dtype,
                             param_dtype=jnp.float32, name="upscale2")(y)
        y = jax.nn.gelu(y)  # (B, 4h, 4w, dim/8)
        hyper = jnp.stack(
            [_MLP(self.dim, self.dim // 8, 3, dtype=self.dtype, name=f"hyper{i}")(mask_out[:, i]) for i in range(nm)], 1
        )  # (B, nm, dim/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, y)
        iou_pred = _MLP(256, nm, 3, dtype=self.dtype, name="iou_head")(iou_out)
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


class SAM(nn.Module):
    """Full SAM (modules/sam.py): encoder + prompt encoder + mask decoder."""

    variant: str = "vit_b"
    img_size: int = 1024
    dtype: Dtype = jnp.float32

    def setup(self):
        emb = self.img_size // 16
        self.image_encoder = ImageEncoderViT(self.variant, self.img_size, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(
            image_embedding_size=(emb, emb), input_image_size=(self.img_size, self.img_size), dtype=self.dtype
        )
        self.mask_decoder = MaskDecoder(dtype=self.dtype)

    def encode(self, x):
        mean = jnp.asarray([123.675, 116.28, 103.53], x.dtype)
        std = jnp.asarray([58.395, 57.12, 57.375], x.dtype)
        return self.image_encoder((x - mean) / std)

    def __call__(self, x, points, labels, multimask_output: bool = True):
        """x (B,H,W,3) RGB 0-255; points (B,N,2) px, labels (B,N)."""
        embed = self.encode(x)
        sparse, dense = self.prompt_encoder(points, labels)
        pe = self.prompt_encoder.dense_pe()
        masks, iou = self.mask_decoder(embed, pe, sparse, dense, multimask_output)
        return masks, iou

    def decode_from_embedding(self, embed, points, labels, multimask_output: bool = True):
        """Prompt + decode over a precomputed image embedding (the
        predictor's set_image / many-prompts flow, predict.py:214)."""
        sparse, dense = self.prompt_encoder(points, labels)
        pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(embed, pe, sparse, dense, multimask_output)

    def decode_box_from_embedding(self, embed, boxes, multimask_output: bool = True):
        """Box-prompted decode (corner embeddings 2/3, predict.py box flow).
        boxes: (B, 4) xyxy px in model-input coords."""
        sparse, dense = self.prompt_encoder(None, None, boxes=boxes)
        pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(embed, pe, sparse, dense, multimask_output)


def build_sam(variant: str = "vit_b", img_size: int = 1024, dtype=jnp.float32) -> SAM:
    """build_sam_vit_{b,l,h} (reference build.py:21-52)."""
    return SAM(variant=variant, img_size=img_size, dtype=dtype)


class SAMPredictor:
    """Prompt-driven predictor (reference models/sam/predict.py): embed the
    image once, then decode any number of point/box prompts against the
    cached embedding. ``everything`` runs a point grid and keeps masks by
    predicted IoU + stability score (amg.py)."""

    def __init__(self, model: SAM, variables, imgsz: int = 1024):
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self._encode = jax.jit(lambda v, x: model.apply(v, x, method=SAM.encode))
        self._decode = jax.jit(
            lambda v, e, p, l: model.apply(v, e, p, l, method=SAM.decode_from_embedding)
        )
        self._embed = None
        self._scale = 1.0
        self._orig_hw = None

    def set_image(self, img: np.ndarray) -> None:
        """img: HxWx3 RGB uint8; resized (long side) + padded to imgsz."""
        import cv2

        h, w = img.shape[:2]
        self._orig_hw = (h, w)
        self._scale = self.imgsz / max(h, w)
        nh, nw = int(round(h * self._scale)), int(round(w * self._scale))
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((self.imgsz, self.imgsz, 3), np.float32)
        canvas[:nh, :nw] = resized
        self._embed = self._encode(self.variables, jnp.asarray(canvas[None]))

    def predict(self, points: np.ndarray, labels: np.ndarray):
        """points (N,2) px in ORIGINAL image coords; labels (N,) 1=fg 0=bg.
        Returns (masks (3,H',W') bool at model res, iou (3,))."""
        assert self._embed is not None, "call set_image first"
        pts = jnp.asarray(np.asarray(points, np.float32) * self._scale)[None]
        lbl = jnp.asarray(np.asarray(labels, np.float32))[None]
        masks, iou = self._decode(self.variables, self._embed, pts, lbl)
        return np.asarray(masks[0]) > 0.0, np.asarray(iou[0])

    def segment_box(self, img: np.ndarray, box_xyxy: np.ndarray) -> np.ndarray:
        """Box-prompted segmentation -> largest-contour polygon, normalized.

        img: HxWx3 (BGR or RGB) uint8 in ORIGINAL coords; box_xyxy (4,) px.
        Returns (n, 2) polygon in [0,1] (falls back to the box corners when
        the mask is empty). Backs the SAM auto-annotator / bbox2segment
        tools (reference annotator.py:38-50)."""
        import cv2

        self.set_image(img)
        h, w = self._orig_hw
        bx = jnp.asarray(np.asarray(box_xyxy, np.float32) * self._scale)[None]
        masks, iou = jax.jit(
            lambda v, e, b: self.model.apply(v, e, b, method=SAM.decode_box_from_embedding)
        )(self.variables, self._embed, bx)
        masks, iou = np.asarray(masks[0]), np.asarray(iou[0])
        mask = (masks[int(iou.argmax())] > 0).astype(np.uint8)
        # mask is at model resolution over the PADDED square; crop valid area
        mh = mask.shape[0]
        sy = mh / self.imgsz * self._scale  # mask px per original px
        valid = mask[: max(1, int(round(h * sy))), : max(1, int(round(w * sy)))]
        contours, _ = cv2.findContours(valid, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if not contours:
            x1, y1, x2, y2 = np.asarray(box_xyxy, np.float32) / np.array([w, h, w, h], np.float32)
            return np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)
        poly = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
        return poly / np.array([valid.shape[1], valid.shape[0]], np.float32)

    def everything(self, points_per_side: int = 8, iou_thresh: float = 0.7):
        """Grid-prompt everything mode (amg.py): one point per grid cell,
        keep the best mask per point above the predicted-IoU threshold."""
        assert self._embed is not None, "call set_image first"
        n = points_per_side
        xs = (np.arange(n) + 0.5) / n * self.imgsz
        grid = np.stack(np.meshgrid(xs, xs), -1).reshape(-1, 2).astype(np.float32)
        pts = jnp.asarray(grid)[:, None]  # (P, 1, 2) one prompt per batch row
        lbl = jnp.ones((grid.shape[0], 1), jnp.float32)
        masks, iou = self._decode(self.variables, jnp.repeat(self._embed, grid.shape[0], 0), pts, lbl)
        masks, iou = np.asarray(masks), np.asarray(iou)
        best = iou.argmax(-1)
        sel = iou.max(-1) > iou_thresh
        out = [(masks[i, best[i]] > 0.0, float(iou[i, best[i]])) for i in range(len(grid)) if sel[i]]
        return out
