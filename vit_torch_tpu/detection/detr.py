"""DETR-style set-prediction detector.

Capability parity with the reference's DETR stack
(``object_detr/models/detr.py:41-376`` — DETR module, ``SetCriterion``
Hungarian-matched CE/L1/GIoU/cardinality losses with aux decoder losses,
``PostProcess`` → scored xyxy boxes, ``MLP`` box head;
``object_detr/models/transformer.py`` — encoder/decoder with pos-embeds
injected into attention and intermediate decoder outputs;
``object_detr/models/position_encoding.py:12-76`` — sine embedding).
The reference *bypassed* its transformer with a Swin hybrid; this build
keeps both capabilities: any zoo backbone (Swin-OD feature maps, ResNet)
feeds a real encoder/decoder.

TPU-first: fixed query count, fixed padded gt sets (no NestedTensor — images
are letterboxed to one static shape by the dataset), attention via
``ops.dot_product_attention``, box coordinates normalized cxcywh in [0,1].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.detection.boxes import cxcywh_to_xyxy, generalized_box_iou
from vit_torch_tpu.models.layers import Dtype, LayerNorm, QDense, _use_w8a8
from vit_torch_tpu.ops.attention import dot_product_attention


def sine_position_embedding(h: int, w: int, dim: int,
                            temperature: float = 10000.0) -> jnp.ndarray:
    """(1, h*w, dim) sine/cosine 2D position embedding (reference
    ``position_encoding.py:12-49`` semantics with an all-valid mask)."""
    half = dim // 2
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(1, h + 1, dtype=jnp.float32) / (h + eps)) * scale
    x = (jnp.arange(1, w + 1, dtype=jnp.float32) / (w + eps)) * scale
    dim_t = jnp.arange(half // 2, dtype=jnp.float32)
    dim_t = temperature ** (2 * dim_t / half)

    def enc(v):  # (n,) -> (n, half)
        pos = v[:, None] / dim_t
        return jnp.stack([jnp.sin(pos), jnp.cos(pos)], axis=2).reshape(
            v.shape[0], -1)

    pos_y = jnp.broadcast_to(enc(y)[:, None, :], (h, w, enc(y).shape[-1]))
    pos_x = jnp.broadcast_to(enc(x)[None, :, :], (h, w, enc(x).shape[-1]))
    return jnp.concatenate([pos_y, pos_x], axis=-1).reshape(1, h * w, -1)


_xavier = nn.initializers.xavier_uniform()


class MHA(nn.Module):
    """Multi-head attention with external q/k/v inputs (DETR injects
    position embeddings into q and k).  Xavier-uniform kernels — the
    upstream DETR transformer re-initializes every >1-dim parameter with
    ``xavier_uniform_`` (``object_detr/models/transformer.py``), which
    matters for post-norm trainability."""

    num_heads: int
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, q, k, v):
        B, Nq, C = q.shape
        H = self.num_heads
        d = C // H
        qp = QDense(C, dtype=self.dtype, kernel_init=_xavier, quant=self.quant,
                    name="q")(q).reshape(B, Nq, H, d)
        kp = QDense(C, dtype=self.dtype, kernel_init=_xavier, quant=self.quant,
                    name="k")(k).reshape(B, -1, H, d)
        vp = QDense(C, dtype=self.dtype, kernel_init=_xavier, quant=self.quant,
                    name="v")(v).reshape(B, -1, H, d)
        out = dot_product_attention(qp, kp, vp, scale=d ** -0.5)
        out = out.reshape(B, Nq, C)
        return QDense(C, dtype=self.dtype, kernel_init=_xavier,
                      quant=self.quant, name="out")(out)


class EncoderLayer(nn.Module):
    num_heads: int
    ffn_dim: int
    pre_norm: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x, pos):
        # post-norm (DETR default) or pre-norm (the reference transformer's
        # normalize_before variant — trains stably without LR warmup);
        # pos added to q/k only
        C = x.shape[-1]
        if self.pre_norm:
            y = LayerNorm(dtype=self.dtype, name="norm1")(x)
            y = MHA(self.num_heads, dtype=self.dtype, quant=self.quant,
                    name="self_attn")(y + pos, y + pos, y)
            x = x + y
            y = LayerNorm(dtype=self.dtype, name="norm2")(x)
            y = QDense(self.ffn_dim, dtype=self.dtype, kernel_init=_xavier,
                       quant=self.quant, name="linear1")(y)
            y = nn.relu(y)
            y = QDense(C, dtype=self.dtype, kernel_init=_xavier,
                       quant=self.quant, name="linear2")(y)
            return x + y
        y = MHA(self.num_heads, dtype=self.dtype, quant=self.quant,
                name="self_attn")(x + pos, x + pos, x)
        x = LayerNorm(dtype=self.dtype, name="norm1")(x + y)
        y = QDense(self.ffn_dim, dtype=self.dtype, kernel_init=_xavier,
                   quant=self.quant, name="linear1")(x)
        y = nn.relu(y)
        y = QDense(C, dtype=self.dtype, kernel_init=_xavier,
                   quant=self.quant, name="linear2")(y)
        return LayerNorm(dtype=self.dtype, name="norm2")(x + y)


class DecoderLayer(nn.Module):
    num_heads: int
    ffn_dim: int
    pre_norm: bool = False
    dtype: Dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, tgt, memory, query_pos, mem_pos):
        C = tgt.shape[-1]
        if self.pre_norm:
            y = LayerNorm(dtype=self.dtype, name="norm1")(tgt)
            y = MHA(self.num_heads, dtype=self.dtype, quant=self.quant,
                    name="self_attn")(y + query_pos, y + query_pos, y)
            tgt = tgt + y
            y = LayerNorm(dtype=self.dtype, name="norm2")(tgt)
            y = MHA(self.num_heads, dtype=self.dtype, quant=self.quant,
                    name="cross_attn")(y + query_pos, memory + mem_pos, memory)
            tgt = tgt + y
            y = LayerNorm(dtype=self.dtype, name="norm3")(tgt)
            y = QDense(self.ffn_dim, dtype=self.dtype, kernel_init=_xavier,
                       quant=self.quant, name="linear1")(y)
            y = nn.relu(y)
            y = QDense(C, dtype=self.dtype, kernel_init=_xavier,
                       quant=self.quant, name="linear2")(y)
            return tgt + y
        y = MHA(self.num_heads, dtype=self.dtype, quant=self.quant,
                name="self_attn")(tgt + query_pos, tgt + query_pos, tgt)
        tgt = LayerNorm(dtype=self.dtype, name="norm1")(tgt + y)
        y = MHA(self.num_heads, dtype=self.dtype, quant=self.quant,
                name="cross_attn")(tgt + query_pos, memory + mem_pos, memory)
        tgt = LayerNorm(dtype=self.dtype, name="norm2")(tgt + y)
        y = QDense(self.ffn_dim, dtype=self.dtype, kernel_init=_xavier,
                   quant=self.quant, name="linear1")(tgt)
        y = nn.relu(y)
        y = QDense(C, dtype=self.dtype, kernel_init=_xavier,
                   quant=self.quant, name="linear2")(y)
        return LayerNorm(dtype=self.dtype, name="norm3")(tgt + y)


class BoxMLP(nn.Module):
    """3-layer box head (reference ``MLP``, detr.py:297-309)."""

    hidden: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc0")(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x))
        return nn.Dense(4, dtype=self.dtype, name="fc2")(x)


@dataclasses.dataclass(frozen=True)
class DETRConfig:
    num_classes: int = 91
    num_queries: int = 100
    hidden_dim: int = 256
    num_heads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    ffn_dim: int = 2048
    aux_loss: bool = True
    # "sine" (default) or "learned" — the reference's two variants
    # (object_detr/models/position_encoding.py:12-76)
    position_embedding: str = "sine"
    # pre-norm encoder/decoder (the reference transformer's
    # normalize_before variant, transformer.py:18-59) — post-norm is the
    # DETR default but needs warmup; pre-norm trains stably from scratch
    pre_norm: bool = False


class LearnedPositionEmbedding(nn.Module):
    """Learned 50×50 row/col embedding tables (reference
    ``position_encoding.py:52-76``): pos(y, x) = [col_embed[x], row_embed[y]]."""

    hidden_dim: int
    table_size: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        half = self.hidden_dim // 2
        init = nn.initializers.uniform(scale=1.0)   # torch uniform_ default
        row = self.param("row_embed", init, (self.table_size, half),
                         jnp.float32)
        col = self.param("col_embed", init, (self.table_size, half),
                         jnp.float32)
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :w], (h, w, half)),
            jnp.broadcast_to(row[:h, None], (h, w, half)),
        ], axis=-1)
        return pos.reshape(1, h * w, self.hidden_dim)


def make_position_embedding(module: nn.Module, cfg: DETRConfig,
                            h: int, w: int) -> jnp.ndarray:
    """Shared sine/learned dispatch for DETR and DETRSegm."""
    if cfg.position_embedding == "learned":
        return LearnedPositionEmbedding(cfg.hidden_dim,
                                        name="position_embedding",
                                        parent=module)(h, w)
    return sine_position_embedding(h, w, cfg.hidden_dim)


class DETR(nn.Module):
    """Backbone feature map → encoder/decoder → class + box predictions.

    ``backbone`` is any flax module returning a (B, H', W', C) feature map
    (e.g. SwinTransformer(features_only=True) — the reference's
    ``SwinTransformerOD`` mode — or the ResNet trunk).
    """

    config: DETRConfig
    backbone: nn.Module
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        quant = _use_w8a8(deterministic)   # int8 serving path (VITX_W8A8=1)
        feats = self.backbone(x, deterministic)        # (B, H', W', C)
        B, Hf, Wf, C = feats.shape
        src = QDense(cfg.hidden_dim, dtype=self.dtype, quant=quant,
                     name="input_proj")(feats.reshape(B, Hf * Wf, C))
        pos = make_position_embedding(self, cfg, Hf, Wf).astype(src.dtype)

        memory = src
        for i in range(cfg.enc_layers):
            memory = EncoderLayer(cfg.num_heads, cfg.ffn_dim,
                                  pre_norm=cfg.pre_norm, dtype=self.dtype,
                                  quant=quant,
                                  name=f"encoder_{i}")(memory, pos)
        if cfg.pre_norm:
            # upstream: encoder_norm when normalize_before
            memory = LayerNorm(dtype=self.dtype, name="encoder_norm")(memory)

        # N(0, 1) like torch nn.Embedding's default — query diversity is the
        # anchor structure of set prediction; a 0.02-std init leaves the
        # queries nearly identical and the Hungarian assignment thrashes
        # (measured: synthetic convergence stalls at AP ~0.02)
        query_embed = self.param("query_embed",
                                 nn.initializers.normal(stddev=1.0),
                                 (cfg.num_queries, cfg.hidden_dim),
                                 jnp.float32)
        query_pos = jnp.broadcast_to(query_embed.astype(src.dtype),
                                     (B, cfg.num_queries, cfg.hidden_dim))
        tgt = jnp.zeros_like(query_pos)
        class_head = nn.Dense(cfg.num_classes + 1, dtype=self.dtype,
                              name="class_embed")
        box_head = BoxMLP(cfg.hidden_dim, dtype=self.dtype, name="bbox_embed")

        decoder_norm = LayerNorm(dtype=self.dtype, name="decoder_norm")
        intermediates = []
        for i in range(cfg.dec_layers):
            tgt = DecoderLayer(cfg.num_heads, cfg.ffn_dim,
                               pre_norm=cfg.pre_norm, dtype=self.dtype,
                               quant=quant,
                               name=f"decoder_{i}")(tgt, memory, query_pos, pos)
            intermediates.append(decoder_norm(tgt))

        outputs = []
        for h in intermediates:
            outputs.append({
                "pred_logits": class_head(h),
                "pred_boxes": nn.sigmoid(box_head(h)),
            })
        out = dict(outputs[-1])
        if cfg.aux_loss:
            out["aux_outputs"] = outputs[:-1]
        return out


# --------------------------------------------------------------------------
# losses (SetCriterion equivalent) — jittable given host-computed assignment
# --------------------------------------------------------------------------

def detr_losses(outputs: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray],
                assign: jnp.ndarray, num_classes: int,
                *, eos_coef: float = 0.1, w_class: float = 1.0,
                w_bbox: float = 5.0, w_giou: float = 2.0) -> Dict[str, jnp.ndarray]:
    """Hungarian-matched losses (reference ``SetCriterion``,
    ``object_detr/models/detr.py:91-263``): CE over all queries with
    no-object down-weighting, L1 + GIoU on matched pairs, cardinality error.

    ``assign`` (B, Q): gt slot per query or -1 (from ``matcher``).
    Targets: ``labels`` (B, N) contiguous ids (1..K), ``boxes_cxcywh``
    (B, N, 4) normalized, ``box_mask`` (B, N).
    """
    logits = outputs["pred_logits"].astype(jnp.float32)   # (B, Q, K+1)
    boxes = outputs["pred_boxes"].astype(jnp.float32)     # (B, Q, 4)
    B, Q, _ = logits.shape
    matched = assign >= 0                                  # (B, Q)
    safe_idx = jnp.maximum(assign, 0)
    tgt_labels = jnp.take_along_axis(targets["labels"], safe_idx, axis=1)
    # unmatched queries predict the no-object class (index 0 here; the
    # reference uses index num_classes — we reserve 0 = background)
    cls_target = jnp.where(matched, tgt_labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, cls_target[..., None], axis=2)[..., 0]
    weights = jnp.where(matched, 1.0, eos_coef)
    sample_mask = targets.get("mask", jnp.ones((B,), jnp.float32))
    weights = weights * sample_mask[:, None]
    loss_ce = jnp.sum(nll * weights) / jnp.maximum(jnp.sum(weights), 1.0)

    num_boxes = jnp.maximum(jnp.sum(targets["box_mask"] * sample_mask[:, None]),
                            1.0)
    tgt_boxes = jnp.take_along_axis(targets["boxes_cxcywh"],
                                    safe_idx[..., None], axis=1)
    pair_mask = matched.astype(jnp.float32) * sample_mask[:, None]
    l1 = jnp.sum(jnp.abs(boxes - tgt_boxes), axis=-1)
    loss_bbox = jnp.sum(l1 * pair_mask) / num_boxes
    giou = generalized_box_iou(
        cxcywh_to_xyxy(boxes.reshape(B * Q, 1, 4)),
        cxcywh_to_xyxy(tgt_boxes.reshape(B * Q, 1, 4)))[:, 0, 0].reshape(B, Q)
    loss_giou = jnp.sum((1.0 - giou) * pair_mask) / num_boxes

    # cardinality (diagnostic, not backpropped in the reference either)
    pred_nonempty = jnp.sum(
        (jnp.argmax(logits, axis=-1) != 0).astype(jnp.float32), axis=1)
    true_count = jnp.sum(targets["box_mask"], axis=1)
    cardinality = jnp.mean(jnp.abs(pred_nonempty - true_count))

    total = w_class * loss_ce + w_bbox * loss_bbox + w_giou * loss_giou
    return {"loss": total, "loss_ce": loss_ce, "loss_bbox": loss_bbox,
            "loss_giou": loss_giou,
            "cardinality_error": jax.lax.stop_gradient(cardinality)}


def postprocess(outputs: Dict[str, jnp.ndarray], image_size: int,
                scale: jnp.ndarray, pad: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Scored xyxy boxes in *original image* coordinates (reference
    ``PostProcess``, detr.py:266-294 + letterbox unmapping)."""
    logits = outputs["pred_logits"]
    prob = jax.nn.softmax(logits, axis=-1)[..., 1:]        # drop background
    scores = jnp.max(prob, axis=-1)
    labels = jnp.argmax(prob, axis=-1) + 1
    boxes = cxcywh_to_xyxy(outputs["pred_boxes"]) * image_size
    # unletterbox: subtract pad, divide by scale
    pad_xy = jnp.concatenate([pad, pad], axis=-1)[:, None, :]   # (B,1,4)
    boxes = (boxes - pad_xy) / scale[:, None, None]
    return {"scores": scores, "labels": labels, "boxes": boxes}
