"""DETR segmentation head (instance masks).

Capability parity with the reference's ``DETRsegm``
(``object_detr/models/segmentation.py``): per-query multi-head attention
maps over the encoder memory (``MHAttentionMap:140``), an FPN-style
small conv mask head with GroupNorm and backbone lateral adapters
(``MaskHeadSmallConv:69``), ``dice_loss:172`` and ``sigmoid_focal_loss:190``,
and a ``PostProcessSegm`` that thresholds and upsamples masks.

TPU notes: all shapes static — masks are predicted for every one of the
fixed ``num_queries`` and selected by the Hungarian assignment in the loss;
gt masks are rasterized at dataset build (``_mask.poly_to_rle``) and resized
to the mask-head output resolution on device for the loss (the reference
upsampled predictions instead; equivalent supervision, cheaper).

``DETRSegm`` shares the DETR transformer param layout (encoder_i/decoder_i/
class_embed/bbox_embed/...) so a detection checkpoint restores into the
segmentation model directly (the reference trains the mask head on top of a
frozen detector the same way).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.detection.detr import (
    BoxMLP, DecoderLayer, DETRConfig, EncoderLayer, make_position_embedding,
    sine_position_embedding,
)
from vit_torch_tpu.models.layers import Dtype, LayerNorm, QDense, _use_w8a8


class MHAttentionMap(nn.Module):
    """Per-head query→memory attention maps (no value projection):
    (B, Q, C) × (B, Hf, Wf, C) → (B, Q, heads, Hf, Wf)."""

    hidden_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, memory_map):
        B, Hf, Wf, C = memory_map.shape
        Q = q.shape[1]
        H = self.num_heads
        d = self.hidden_dim // H
        qp = nn.Dense(self.hidden_dim, dtype=self.dtype, name="q_linear")(q)
        kp = nn.Dense(self.hidden_dim, dtype=self.dtype, name="k_linear")(
            memory_map)
        qp = qp.reshape(B, Q, H, d)
        kp = kp.reshape(B, Hf * Wf, H, d)
        logits = jnp.einsum("bqhd,bkhd->bqhk", qp, kp,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        # reference MHAttentionMap normalizes JOINTLY over heads x H x W
        # (softmax of weights.flatten(2)) — per-head softmax would give
        # every head the same total weight and diverge from checkpoints
        weights = jax.nn.softmax(logits.reshape(B, Q, H * Hf * Wf), axis=-1)
        return weights.reshape(B, Q, H, Hf, Wf).astype(self.dtype)


class MaskHeadSmallConv(nn.Module):
    """Conv mask head with GroupNorm(8) + FPN lateral adapters (reference
    ``MaskHeadSmallConv:69-135``).  Operates on (B·Q, h, w, C) stacks."""

    context_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, fpn_feats: List[jnp.ndarray], num_queries: int):
        cd = self.context_dim
        dims = [max(cd // 2, 8), max(cd // 4, 8), max(cd // 8, 8),
                max(cd // 16, 8)]

        def gn(name, ch):
            g = 8
            while ch % g:
                g //= 2
            return nn.GroupNorm(num_groups=g, dtype=self.dtype, name=name)

        conv = lambda ch, name: nn.Conv(ch, (3, 3), padding=1,
                                        dtype=self.dtype, name=name)
        x = conv(x.shape[-1], "lay1")(x)
        x = nn.relu(gn("gn1", x.shape[-1])(x))
        x = conv(dims[0], "lay2")(x)
        x = nn.relu(gn("gn2", dims[0])(x))
        for i, feat in enumerate(fpn_feats):
            lateral = nn.Conv(dims[i], (1, 1), dtype=self.dtype,
                              name=f"adapter{i + 1}")(feat)
            # expand laterals over queries: (B, h, w, c) -> (B*Q, h, w, c)
            lateral = jnp.repeat(lateral, num_queries, axis=0)
            x = lateral + jax.image.resize(
                x, lateral.shape[:-1] + (x.shape[-1],), "nearest")
            nxt = dims[i + 1] if i + 1 < len(dims) else dims[-1]
            x = conv(nxt, f"lay{i + 3}")(x)
            x = nn.relu(gn(f"gn{i + 3}", nxt)(x))
        return nn.Conv(1, (3, 3), padding=1, dtype=self.dtype,
                       name="out_lay")(x)[..., 0]        # (B*Q, h, w)


class DETRSegm(nn.Module):
    """DETR + instance-mask head.  ``backbone`` must return multi-stage
    feature maps (e.g. Swin ``multi_features=True``); the last stage feeds
    the transformer, earlier stages are FPN laterals for the mask head."""

    config: DETRConfig
    backbone: nn.Module
    num_mask_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        quant = _use_w8a8(deterministic)   # int8 serving path (VITX_W8A8=1)
        stages = self.backbone(x, deterministic)
        assert isinstance(stages, (list, tuple)) and len(stages) >= 3, \
            "DETRSegm needs a multi-stage backbone (multi_features=True)"
        feats = stages[-1]
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
            from vit_torch_tpu.models.layers import LayerNorm as _LN
            memory = _LN(dtype=self.dtype, name="encoder_norm")(memory)
        # N(0, 1) like torch nn.Embedding (see detr.py query_embed note)
        query_embed = self.param("query_embed",
                                 nn.initializers.normal(stddev=1.0),
                                 (cfg.num_queries, cfg.hidden_dim),
                                 jnp.float32)
        query_pos = jnp.broadcast_to(query_embed.astype(src.dtype),
                                     (B, cfg.num_queries, cfg.hidden_dim))
        tgt = jnp.zeros_like(query_pos)
        decoder_norm = LayerNorm(dtype=self.dtype, name="decoder_norm")
        class_head = nn.Dense(cfg.num_classes + 1, dtype=self.dtype,
                              name="class_embed")
        box_head = BoxMLP(cfg.hidden_dim, dtype=self.dtype, name="bbox_embed")
        intermediates = []
        for i in range(cfg.dec_layers):
            tgt = DecoderLayer(cfg.num_heads, cfg.ffn_dim,
                               pre_norm=cfg.pre_norm, dtype=self.dtype,
                               quant=quant,
                               name=f"decoder_{i}")(tgt, memory, query_pos,
                                                    pos)
            intermediates.append(decoder_norm(tgt))
        outputs = []
        for h in intermediates:
            outputs.append({"pred_logits": class_head(h),
                            "pred_boxes": nn.sigmoid(box_head(h))})
        out = dict(outputs[-1])
        if cfg.aux_loss:
            out["aux_outputs"] = outputs[:-1]

        # ---- mask branch ----
        hs = intermediates[-1]
        mem_map = memory.reshape(B, Hf, Wf, cfg.hidden_dim)
        attn = MHAttentionMap(cfg.hidden_dim, self.num_mask_heads,
                              dtype=self.dtype, name="bbox_attention")(
            hs, mem_map)
        mem_exp = jnp.repeat(mem_map, cfg.num_queries, axis=0)
        attn_maps = attn.transpose(0, 1, 3, 4, 2).reshape(
            B * cfg.num_queries, Hf, Wf, self.num_mask_heads)
        stack = jnp.concatenate([mem_exp, attn_maps], axis=-1)
        fpn_feats = [stages[-2], stages[-3]]
        if len(stages) >= 4:
            fpn_feats.append(stages[-4])
        masks = MaskHeadSmallConv(cfg.hidden_dim, dtype=self.dtype,
                                  name="mask_head")(stack, fpn_feats,
                                                    cfg.num_queries)
        hm, wm = masks.shape[-2:]
        out["pred_masks"] = masks.reshape(B, cfg.num_queries, hm, wm)
        return out


# --------------------------------------------------------------------------
# losses (reference segmentation.py:172-208)
# --------------------------------------------------------------------------

def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
              valid: jnp.ndarray) -> jnp.ndarray:
    """inputs: (M, h, w) logits; targets: (M, h, w) {0,1}; valid: (M,)."""
    probs = jax.nn.sigmoid(inputs.astype(jnp.float32))
    probs = probs.reshape(probs.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1).astype(jnp.float32)
    num = 2 * jnp.sum(probs * targets, axis=1)
    den = jnp.sum(probs, axis=1) + jnp.sum(targets, axis=1)
    loss = 1 - (num + 1) / (den + 1)
    return jnp.sum(loss * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def sigmoid_focal_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
                       valid: jnp.ndarray, alpha: float = 0.25,
                       gamma: float = 2.0) -> jnp.ndarray:
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    ce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1 - p) * (1 - t)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = loss * (alpha * t + (1 - alpha) * (1 - t))
    per = jnp.mean(loss.reshape(loss.shape[0], -1), axis=1)
    return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def mask_losses(pred_masks: jnp.ndarray, gt_masks: jnp.ndarray,
                assign: jnp.ndarray, box_mask: jnp.ndarray,
                sample_mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Hungarian-matched mask losses.

    pred_masks (B, Q, h, w) logits; gt_masks (B, N, H, W) binary;
    assign (B, Q) gt slot per query or -1.
    """
    B, Q, h, w = pred_masks.shape
    safe = jnp.maximum(assign, 0)
    gt = jnp.take_along_axis(
        gt_masks, safe[:, :, None, None], axis=1)
    gt = jax.image.resize(gt.astype(jnp.float32), (B, Q, h, w), "nearest")
    matched = (assign >= 0).astype(jnp.float32) * sample_mask[:, None]
    pm = pred_masks.reshape(B * Q, h, w)
    gm = gt.reshape(B * Q, h, w)
    valid = matched.reshape(B * Q)
    return {
        "loss_mask": sigmoid_focal_loss(pm, gm, valid),
        "loss_dice": dice_loss(pm, gm, valid),
    }


def postprocess_segm(pred_masks: jnp.ndarray, image_size: int,
                     threshold: float = 0.5) -> jnp.ndarray:
    """Upsample query masks to the letterboxed image resolution and
    threshold (reference ``PostProcessSegm:79-103``; un-letterboxing to the
    original size happens on host with the stored scale/pad)."""
    B, Q = pred_masks.shape[:2]
    up = jax.image.resize(pred_masks.astype(jnp.float32),
                          (B, Q, image_size, image_size), "bilinear")
    return (jax.nn.sigmoid(up) > threshold)


def mask_col_runs(masks: jnp.ndarray, max_runs: int = 24):
    """Per-COLUMN value-flip rows of binary letterbox masks — the device
    half of the run-length-domain segm eval (host half:
    ``_mask.rle_from_col_runs``).

    (..., S, S) bool → (runs (..., S, R) int16, counts (..., S) int16).
    Column c of a mask flips value (0↔1, starting from 0 — COCO RLE
    parity) at exactly rows ``runs[..., c, :counts[c]]`` (ascending;
    padding entries = S).  ``counts > R`` marks device truncation: the
    host must fall back to the pixel path for that mask.

    Replaces the host's per-pixel unpackbits/gather/scan chain with an
    O(runs) transfer + stitch: the device computes flips with one compare
    + ``top_k`` per column while it is otherwise idle behind the
    host-bound segm eval (PERF.md eval-at-scale ledger)."""
    S = masks.shape[-1]
    m = jnp.swapaxes(masks.astype(jnp.int8), -1, -2)      # (..., col, row)
    prev = jnp.concatenate([jnp.zeros_like(m[..., :1]), m[..., :-1]], -1)
    t = m != prev
    # ordinal of each flip within its column; the j-th flip's row is a
    # one-hot masked reduction over rows.  This is a pure elementwise +
    # reduce pattern XLA fuses without materializing the (..., S, S, R)
    # selector — top_k was tried first and its sort dominated eval device
    # time at R≳32 (t_get 0.74→23.5 s at the 1k-image scale)
    k = jnp.cumsum(t.astype(jnp.int32), axis=-1)          # (..., col, row)
    counts = k[..., -1]
    row = jnp.arange(S, dtype=jnp.int32)
    ordinal = jnp.arange(1, max_runs + 1, dtype=jnp.int32)
    sel = t[..., None] & (k[..., None] == ordinal)        # (..., col, row, R)
    runs = jnp.sum(jnp.where(sel, row[:, None], 0), axis=-2)
    runs = jnp.where(ordinal[None] <= counts[..., None], runs, S)
    return runs.astype(jnp.int16), counts.astype(jnp.int16)


def pack_mask_bits(masks: jnp.ndarray) -> jnp.ndarray:
    """(..., W) binary masks → (..., W/8) uint8, 8 pixels per byte
    (MSB-first, ``np.unpackbits`` layout).  Mask D2H is the dominant eval
    cost on tunneled devices (measured 3.6 s per bs32 batch of raw bool
    masks at 192px/50 queries vs 0.53 s packed — see PERF.md eval-at-scale
    ledger); packing on device cuts the transfer bytes 8×.
    Non-multiple-of-8 W is zero-padded to the next byte boundary — the
    unpacker must slice ``[..., :W]`` after ``np.unpackbits``."""
    W = masks.shape[-1]
    if W % 8:
        pad = [(0, 0)] * (masks.ndim - 1) + [(0, 8 - W % 8)]
        masks = jnp.pad(masks.astype(jnp.uint8), pad)
        W = masks.shape[-1]
    m8 = masks.reshape(masks.shape[:-1] + (W // 8, 8)).astype(jnp.uint8)
    acc = jnp.zeros(m8.shape[:-1], jnp.uint8)
    for i in range(8):
        acc = acc | (m8[..., i] << (7 - i))
    return acc
