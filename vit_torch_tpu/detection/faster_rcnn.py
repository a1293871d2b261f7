"""Faster R-CNN — two-stage detector, TPU-native (fixed shapes end to end).

Capability parity with the reference's torchvision
``fasterrcnn_resnet50_fpn`` path (``object/coco_pipeline.py:428-438`` model
construction + head swap; ``object/engine.py`` training) and its Swin-FPN
assembly experiment (``object/module_surgery.py:92-126``).

torchvision's implementation is dynamically shaped everywhere (ragged
proposal lists, per-image NMS); on TPU everything here is **padded + masked**
(SURVEY.md §7 "padded top-K everywhere"):

- anchors are static per (image_size, FPN level);
- RPN selects a fixed ``num_proposals`` via top-k → padded NMS;
- anchor/proposal-to-gt matching and the 1:1 / 1:4 sampling use
  score+random top-k with validity masks instead of ragged index lists;
- RoIAlign assigns each RoI a level by the standard formula, then gathers
  its 7×7 bilinear grid with flat indices into the concatenated pyramid
  (static compute, no gathers on dynamic shapes).

The whole train step — backbone, FPN, RPN, RoI heads, both losses — is one
jitted XLA program (unlike DETR, no host-side Hungarian step is needed).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_torch_tpu.detection.boxes import box_iou, nms_padded
from vit_torch_tpu.models.layers import Dtype, QDense, _use_w8a8


# --------------------------------------------------------------------------
# anchors + box coding
# --------------------------------------------------------------------------

def generate_anchors(image_size: int, strides: Tuple[int, ...],
                     sizes: Tuple[float, ...],
                     ratios: Tuple[float, ...] = (0.5, 1.0, 2.0),
                     ) -> np.ndarray:
    """Static (N_total, 4) xyxy anchor grid over all FPN levels
    (torchvision AnchorGenerator semantics: one size per level × 3 ratios).

    Layout is **position-major** per level — (y, x, ratio) with the ratio
    axis innermost — matching ``RPNHead``'s reshape of its (B, H, W, A[*4])
    conv outputs, so rpn_logits[:, i] pairs with anchors[i]."""
    all_anchors = []
    for stride, size in zip(strides, sizes):
        g = image_size // stride
        cy = (np.arange(g) + 0.5) * stride
        cx = (np.arange(g) + 0.5) * stride
        cyy, cxx = np.meshgrid(cy, cx, indexing="ij")
        centers = np.stack([cxx, cyy, cxx, cyy],
                           axis=-1).reshape(-1, 1, 4)      # (g*g, 1, 4)
        base = np.stack([
            np.array([-w / 2, -h / 2, w / 2, h / 2])
            for ratio in ratios
            for h, w in [(size * math.sqrt(ratio), size / math.sqrt(ratio))]
        ])                                                  # (A, 4)
        all_anchors.append((centers + base[None]).reshape(-1, 4))
    return np.concatenate(all_anchors).astype(np.float32)


def encode_boxes(boxes: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """xyxy gt → (dx, dy, dw, dh) deltas w.r.t. anchors (R-CNN coding).
    Anchor dims are clamped: padded/invalid proposal slots are degenerate
    boxes and must not poison the (masked-out) loss terms with NaN."""
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-3)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-3)
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-3)
    bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-3)
    bx = boxes[..., 0] + bw / 2
    by = boxes[..., 1] + bh / 2
    return jnp.stack([(bx - ax) / aw, (by - ay) / ah,
                      jnp.log(bw / aw), jnp.log(bh / ah)], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray,
                 clip: Optional[float] = None) -> jnp.ndarray:
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-3)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-3)
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    dx, dy, dw, dh = (deltas[..., i] for i in range(4))
    dw = jnp.clip(dw, -4.0, 4.0)
    dh = jnp.clip(dh, -4.0, 4.0)
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                      axis=-1)
    if clip is not None:
        boxes = jnp.clip(boxes, 0.0, clip)
    return boxes


def smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax ** 2 / beta, ax - 0.5 * beta)


# --------------------------------------------------------------------------
# matching + fixed-size sampling
# --------------------------------------------------------------------------

def match_to_gt(candidates: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_mask: jnp.ndarray, hi: float, lo: float,
                allow_low_quality: bool = False):
    """Per-image matcher (torchvision Matcher semantics): returns
    (matched_gt_idx, label) where label 1=positive, 0=negative, -1=ignore."""
    iou = box_iou(candidates, gt_boxes)                     # (A, G)
    iou = jnp.where(gt_mask[None, :] > 0, iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    label = jnp.where(best_iou >= hi, 1,
                      jnp.where(best_iou < lo, 0, -1))
    if allow_low_quality:
        # anchors that are the argmax for some gt become positive
        gt_best = jnp.max(iou, axis=0)                      # (G,)
        is_best = (iou >= gt_best[None, :] - 1e-6) & (gt_mask[None, :] > 0) \
            & (iou > 0)
        label = jnp.where(jnp.any(is_best, axis=1), 1, label)
    return best_gt, label


def sample_balanced(rng: jax.Array, label: jnp.ndarray, num: int,
                    pos_fraction: float):
    """Fixed-size positive/negative sampling with random tie-break.
    Returns (indices (num,), weights (num,)) — weights 0 pad invalid."""
    n = label.shape[0]
    noise = jax.random.uniform(rng, (n,))
    n_pos = int(num * pos_fraction)
    pos_score = jnp.where(label == 1, 1.0 + noise, noise - 2.0)
    _, pos_idx = jax.lax.top_k(pos_score, n_pos)
    pos_valid = label[pos_idx] == 1
    n_neg = num - n_pos
    neg_score = jnp.where(label == 0, 1.0 + noise, noise - 2.0)
    _, neg_idx = jax.lax.top_k(neg_score, n_neg)
    neg_valid = label[neg_idx] == 0
    idx = jnp.concatenate([pos_idx, neg_idx])
    weight = jnp.concatenate([pos_valid, neg_valid]).astype(jnp.float32)
    is_pos = jnp.concatenate([pos_valid,
                              jnp.zeros(n_neg, bool)]).astype(jnp.float32)
    return idx, weight, is_pos


# --------------------------------------------------------------------------
# modules
# --------------------------------------------------------------------------

class FPN(nn.Module):
    """Feature Pyramid Network over backbone stage maps (lateral 1×1 +
    top-down upsample + 3×3 smoothing, torchvision layout)."""

    out_channels: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)]
        outs = [laterals[-1]]
        for i in range(len(laterals) - 2, -1, -1):
            up = jax.image.resize(outs[0], laterals[i].shape, "nearest")
            outs.insert(0, laterals[i] + up)
        return [nn.Conv(self.out_channels, (3, 3), padding=1,
                        dtype=self.dtype, name=f"output_{i}")(o)
                for i, o in enumerate(outs)]


class RPNHead(nn.Module):
    num_anchors: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        conv = nn.Conv(feats[0].shape[-1], (3, 3), padding=1,
                       dtype=self.dtype, name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                      name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      name="bbox_pred")
        logits, deltas = [], []
        for f in feats:
            h = nn.relu(conv(f))
            B = h.shape[0]
            logits.append(cls(h).reshape(B, -1))
            deltas.append(reg(h).reshape(B, -1, 4))
        return jnp.concatenate(logits, 1), jnp.concatenate(deltas, 1)


def _roi_levels_and_grid(feats, boxes, output_size):
    """Shared RoIAlign prologue: per-roi FPN level + image-coord grid."""
    S = output_size
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1.0)
    # torchvision level assignment: k = floor(4 + log2(sqrt(wh)/224))
    k = jnp.floor(4 + jnp.log2(jnp.sqrt(w * h) / 224.0 + 1e-8))
    k = jnp.clip(k, 2, 2 + len(feats) - 1) - 2                 # (B, R)

    # sample grid in image coords (align_corners-ish bin centers)
    ys = (jnp.arange(S, dtype=jnp.float32) + 0.5) / S          # (S,)
    grid_y = boxes[..., 1:2] + ys[None, None, :] * h[..., None]  # (B,R,S)
    grid_x = boxes[..., 0:1] + ys[None, None, :] * w[..., None]
    return k, grid_y, grid_x


def roi_align(feats: List[jnp.ndarray], boxes: jnp.ndarray,
              strides: Tuple[int, ...], output_size: int = 7) -> jnp.ndarray:
    """Multi-level RoIAlign (static shapes end to end).

    feats: list of (B, Hl, Wl, C); boxes: (B, R, 4) xyxy in image coords.
    Returns (B, R, S, S, C).

    Two equivalent lowerings (identical values — each RoI reads exactly one
    pyramid level either way):

    - ``flat`` (default): concatenate the levels into one (B, ΣHlWl, C) map
      and gather each bilinear corner with per-roi *flat* indices
      ``level_offset[k] + y·Wl[k] + x`` — ONE gather per corner, no
      (L, B, R, S, S, C) materialization.  Measured on-chip this removes
      most of the 30.6% train-step share the blend variant cost
      (``examples/perf/frcnn_step_decompose.json``).
    - ``blend``: sample every level for every RoI and one-hot-sum — L× the
      gather traffic; kept for A/B via ``VITX_ROI_FLAT=0``.
    """
    import os
    if os.environ.get("VITX_ROI_FLAT", "1") != "0":
        return _roi_align_flat(feats, boxes, strides, output_size)
    return _roi_align_blend(feats, boxes, strides, output_size)


def _roi_align_flat(feats: List[jnp.ndarray], boxes: jnp.ndarray,
                    strides: Tuple[int, ...],
                    output_size: int = 7) -> jnp.ndarray:
    B, R, _ = boxes.shape
    S = output_size
    C = feats[0].shape[-1]
    k, grid_y, grid_x = _roi_levels_and_grid(feats, boxes, output_size)
    lvl = k.astype(jnp.int32)                                  # (B, R)

    hs = np.array([f.shape[1] for f in feats], np.int32)
    ws = np.array([f.shape[2] for f in feats], np.int32)
    offs = np.concatenate([[0], np.cumsum(hs.astype(np.int64)
                                          * ws)[:-1]]).astype(np.int32)
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in feats], axis=1)

    stride_r = jnp.asarray(strides, jnp.float32)[lvl]          # (B, R)
    Hl = jnp.asarray(hs)[lvl][..., None]                       # (B, R, 1)
    Wl = jnp.asarray(ws)[lvl][..., None]
    off = jnp.asarray(offs)[lvl][..., None, None]              # (B, R, 1, 1)

    gy = grid_y / stride_r[..., None] - 0.5                    # (B, R, S)
    gx = grid_x / stride_r[..., None] - 0.5
    y0 = jnp.floor(gy)
    x0 = jnp.floor(gx)
    fy = gy - y0
    fx = gx - x0

    def gather(yi, xi):
        yi = jnp.clip(yi.astype(jnp.int32), 0, Hl - 1)         # (B, R, S)
        xi = jnp.clip(xi.astype(jnp.int32), 0, Wl - 1)
        idx = off + yi[..., :, None] * Wl[..., None] + xi[..., None, :]
        v = jnp.take_along_axis(flat, idx.reshape(B, R * S * S)[..., None],
                                axis=1)
        return v.reshape(B, R, S, S, C)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    # weights stay fp32 (matching the blend variant's promotion semantics)
    wy = fy[..., :, None, None]
    wx = fx[..., None, :, None]
    return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
            + wy * (1 - wx) * v10 + wy * wx * v11)


def _roi_align_blend(feats: List[jnp.ndarray], boxes: jnp.ndarray,
                     strides: Tuple[int, ...],
                     output_size: int = 7) -> jnp.ndarray:
    B, R, _ = boxes.shape
    S = output_size
    k, grid_y, grid_x = _roi_levels_and_grid(feats, boxes, output_size)

    def sample_level(feat, stride):
        Hl, Wl = feat.shape[1], feat.shape[2]
        gy = grid_y / stride - 0.5
        gx = grid_x / stride - 0.5
        y0 = jnp.floor(gy)
        x0 = jnp.floor(gx)
        fy = gy - y0
        fx = gx - x0

        def gather(yi, xi):
            yi = jnp.clip(yi.astype(jnp.int32), 0, Hl - 1)
            xi = jnp.clip(xi.astype(jnp.int32), 0, Wl - 1)
            # (B, R, S) x (B, R, S) -> (B, R, S, S, C)
            def per_image(f, yb, xb):
                return f[yb[:, :, None], xb[:, None, :]]
            return jax.vmap(per_image)(feat, yi, xi)

        v00 = gather(y0, x0)
        v01 = gather(y0, x0 + 1)
        v10 = gather(y0 + 1, x0)
        v11 = gather(y0 + 1, x0 + 1)
        wy = fy[..., :, None, None]
        wx = fx[..., None, :, None]
        return ((1 - wy) * (1 - wx) * v00 + (1 - wy) * wx * v01
                + wy * (1 - wx) * v10 + wy * wx * v11)

    sampled = jnp.stack([sample_level(f, s)
                         for f, s in zip(feats, strides)])     # (L,B,R,S,S,C)
    onehot = jax.nn.one_hot(k.astype(jnp.int32), len(feats),
                            axis=0)                             # (L,B,R)
    return jnp.sum(sampled * onehot[..., None, None, None], axis=0)


@dataclasses.dataclass(frozen=True)
class FasterRCNNConfig:
    num_classes: int = 91            # foreground classes (labels 1..K)
    image_size: int = 512
    fpn_channels: int = 256
    strides: Tuple[int, ...] = (4, 8, 16, 32)
    anchor_sizes: Tuple[float, ...] = (32.0, 64.0, 128.0, 256.0)
    num_proposals: int = 256         # fixed post-NMS proposal count
    rpn_pre_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_batch: int = 256             # sampled anchors per image
    roi_batch: int = 128             # sampled proposals per image
    detections: int = 100
    # Keypoint R-CNN branch (torchvision keypointrcnn_resnet50_fpn
    # semantics); 0 = no keypoint head
    num_keypoints: int = 0
    kp_conv_channels: Tuple[int, ...] = (512,) * 8
    kp_roi_size: int = 14            # RoIAlign grid for the keypoint branch
    kp_rois: int = 128               # train-time proposals covered (top-score)


class FasterRCNN(nn.Module):
    """Backbone(feature maps) → FPN → RPN → RoI heads.

    ``backbone`` must return a list of stage feature maps (strides matching
    ``config.strides``).  ``__call__`` returns the raw pieces; use
    ``faster_rcnn_losses`` for training and ``faster_rcnn_predict`` for
    inference.
    """

    config: FasterRCNNConfig
    backbone: nn.Module
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, images, rng: Optional[jax.Array] = None,
                 deterministic: bool = True):
        cfg = self.config
        feats = self.backbone(images, deterministic)
        assert len(feats) == len(cfg.strides), \
            f"backbone returned {len(feats)} maps for {len(cfg.strides)} strides"
        feats = FPN(cfg.fpn_channels, dtype=self.dtype, name="fpn")(feats)
        rpn_logits, rpn_deltas = RPNHead(dtype=self.dtype, name="rpn")(feats)

        anchors = jnp.asarray(generate_anchors(
            cfg.image_size, cfg.strides, cfg.anchor_sizes))

        # proposals (stop-gradient, like torchvision)
        prop_boxes, prop_scores = self._proposals(
            jax.lax.stop_gradient(rpn_logits),
            jax.lax.stop_gradient(rpn_deltas), anchors)

        roi_feats = roi_align(feats, prop_boxes, cfg.strides)   # (B,R,7,7,C)
        B, R = roi_feats.shape[:2]
        x = roi_feats.reshape(B, R, -1)
        # box-head FCs carry ~13 GFLOP/image (R x 12544->1024) — int8-able
        # at serving time; cls/bbox output layers stay fp32 (small,
        # precision-sensitive)
        quant = _use_w8a8(deterministic)
        x = nn.relu(QDense(1024, dtype=self.dtype, quant=quant,
                           name="box_fc1")(x))
        x = nn.relu(QDense(1024, dtype=self.dtype, quant=quant,
                           name="box_fc2")(x))
        cls_logits = nn.Dense(cfg.num_classes + 1, dtype=self.dtype,
                              name="cls_score")(x)
        box_deltas = nn.Dense(4 * (cfg.num_classes + 1), dtype=self.dtype,
                              name="bbox_pred")(x).reshape(B, R, -1, 4)
        outputs = {
            "anchors": anchors,
            "rpn_logits": rpn_logits, "rpn_deltas": rpn_deltas,
            "proposals": prop_boxes, "proposal_scores": prop_scores,
            "cls_logits": cls_logits, "box_deltas": box_deltas,
        }
        if cfg.num_keypoints > 0:
            from vit_torch_tpu.detection.keypoint import KeypointHead
            kp_head = KeypointHead(cfg.num_keypoints, cfg.kp_conv_channels,
                                   dtype=self.dtype, name="kp_head")
            if deterministic:
                # eval: keypoints on the final (post-NMS refined) detection
                # boxes, like torchvision's inference path
                dets = decode_detections(outputs, cfg)
                kp_feats = roi_align(feats, dets["boxes"], cfg.strides,
                                     cfg.kp_roi_size)
                outputs["detections"] = dets
                outputs["kp_logits"] = kp_head(kp_feats)
                outputs["kp_boxes"] = dets["boxes"]
            else:
                # train: keypoints on the top-score proposals; the loss
                # selects the positives among them
                kp_boxes = prop_boxes[:, :cfg.kp_rois]
                kp_feats = roi_align(feats, kp_boxes, cfg.strides,
                                     cfg.kp_roi_size)
                outputs["kp_logits"] = kp_head(kp_feats)
                outputs["kp_boxes"] = kp_boxes
        return outputs

    def _proposals(self, logits, deltas, anchors):
        cfg = self.config
        boxes = decode_boxes(deltas, anchors[None], clip=float(cfg.image_size))

        def per_image(logit, box):
            k = min(cfg.rpn_pre_nms_topk, logit.shape[0])
            score, idx = jax.lax.top_k(logit, k)
            cand = box[idx]
            keep, valid = nms_padded(cand, score, cfg.rpn_nms_thresh,
                                     cfg.num_proposals)
            out_boxes = cand[keep]
            out_scores = jnp.where(valid, score[keep], -jnp.inf)
            # invalid slots become unit boxes at origin (degenerate but
            # numerically safe through RoIAlign / box coding)
            unit = jnp.asarray([0.0, 0.0, 1.0, 1.0])
            out_boxes = jnp.where(valid[:, None], out_boxes, unit[None])
            return out_boxes, out_scores

        return jax.vmap(per_image)(logits, boxes)


def faster_rcnn_losses(outputs: Dict[str, jnp.ndarray],
                       targets: Dict[str, jnp.ndarray],
                       cfg: FasterRCNNConfig,
                       rng: jax.Array) -> Dict[str, jnp.ndarray]:
    """RPN + RoI-head losses (torchvision semantics: BCE+smoothL1 on 256
    sampled anchors at 0.7/0.3 IoU; CE+smoothL1 on 128 sampled proposals at
    0.5 with 1:3 pos:neg)."""
    anchors = outputs["anchors"]
    B = outputs["rpn_logits"].shape[0]

    def per_image(rng, rpn_logit, rpn_delta, proposals, cls_logits,
                  box_deltas, gt_boxes, gt_labels, gt_mask, sample_mask):
        r1, r2 = jax.random.split(rng)
        # ---- RPN ----
        gt_idx, a_label = match_to_gt(anchors, gt_boxes, gt_mask,
                                      hi=0.7, lo=0.3, allow_low_quality=True)
        idx, weight, is_pos = sample_balanced(r1, a_label, cfg.rpn_batch, 0.5)
        obj_target = is_pos
        logit = rpn_logit[idx]
        bce = optax_sigmoid_ce(logit, obj_target)
        rpn_cls = jnp.sum(bce * weight) / jnp.maximum(jnp.sum(weight), 1.0)
        matched = gt_boxes[gt_idx[idx]]
        reg_t = encode_boxes(matched, anchors[idx])
        reg = smooth_l1(rpn_delta[idx] - reg_t).sum(-1)
        rpn_reg = jnp.sum(reg * is_pos) / jnp.maximum(jnp.sum(weight), 1.0)

        # ---- RoI head ----
        p_idx, p_label = match_to_gt(proposals, gt_boxes, gt_mask,
                                     hi=0.5, lo=0.5)
        sidx, sweight, spos = sample_balanced(r2, p_label, cfg.roi_batch, 0.25)
        cls_t = jnp.where(spos > 0, gt_labels[p_idx[sidx]], 0)
        logp = jax.nn.log_softmax(cls_logits[sidx].astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, cls_t[:, None], 1)[:, 0]
        roi_cls = jnp.sum(ce * sweight) / jnp.maximum(jnp.sum(sweight), 1.0)
        matched_p = gt_boxes[p_idx[sidx]]
        reg_t = encode_boxes(matched_p, proposals[sidx])
        # per-class deltas: pick the target class channel
        d = jnp.take_along_axis(
            box_deltas[sidx], cls_t[:, None, None].repeat(4, -1), 1)[:, 0]
        reg = smooth_l1(d - reg_t).sum(-1)
        roi_reg = jnp.sum(reg * spos) / jnp.maximum(jnp.sum(spos), 1.0)
        return jax.tree.map(lambda x: x * sample_mask,
                            (rpn_cls, rpn_reg, roi_cls, roi_reg))

    rngs = jax.random.split(rng, B)
    losses = jax.vmap(per_image)(
        rngs, outputs["rpn_logits"], outputs["rpn_deltas"],
        outputs["proposals"], outputs["cls_logits"], outputs["box_deltas"],
        targets["boxes"], targets["labels"], targets["box_mask"],
        targets["mask"])
    n = jnp.maximum(jnp.sum(targets["mask"]), 1.0)
    names = ("loss_rpn_cls", "loss_rpn_reg", "loss_cls", "loss_reg")
    out = {k: jnp.sum(v) / n for k, v in zip(names, losses)}
    if "kp_logits" in outputs and "keypoints" in targets:
        kp = _keypoint_loss_batch(outputs, targets)
        out["loss_keypoint"] = jnp.sum(kp) / n
    out["loss"] = sum(out.values())
    return out


def _keypoint_loss_batch(outputs: Dict[str, jnp.ndarray],
                         targets: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Per-image keypoint heatmap CE over the positive keypoint rois
    (torchvision ``keypointrcnn_loss``): the rois covered by the keypoint
    branch are the top-score proposals; positives are those matching a gt
    box at IoU ≥ 0.5, each supervised by its matched gt's keypoints."""
    from vit_torch_tpu.detection.keypoint import keypoint_loss

    def per_image(kp_logits, kp_boxes, gt_boxes, gt_kps, gt_mask,
                  sample_mask):
        gt_idx, label = match_to_gt(kp_boxes, gt_boxes, gt_mask,
                                    hi=0.5, lo=0.5)
        weights = (label == 1).astype(jnp.float32)
        matched = gt_kps[gt_idx]                        # (Rk, K, 3)
        return keypoint_loss(kp_logits, kp_boxes, matched,
                             weights) * sample_mask

    return jax.vmap(per_image)(
        outputs["kp_logits"], outputs["kp_boxes"], targets["boxes"],
        targets["keypoints"], targets["box_mask"], targets["mask"])


def optax_sigmoid_ce(logits, labels):
    """Numerically stable sigmoid cross-entropy."""
    return jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))


def decode_detections(outputs: Dict[str, jnp.ndarray],
                      cfg: FasterRCNNConfig,
                      score_thresh: float = 0.05) -> Dict[str, jnp.ndarray]:
    """Decode + per-class NMS (padded) + top detections, in letterbox
    coordinates (jittable core; :func:`faster_rcnn_predict` un-letterboxes)."""
    prob = jax.nn.softmax(outputs["cls_logits"].astype(jnp.float32), -1)
    scores_fg = prob[..., 1:]                              # (B, R, K)
    labels = jnp.argmax(scores_fg, -1) + 1                 # (B, R)
    scores = jnp.max(scores_fg, -1)
    d = jnp.take_along_axis(
        outputs["box_deltas"], labels[:, :, None, None].repeat(4, -1),
        2)[:, :, 0]
    boxes = decode_boxes(d, outputs["proposals"], clip=float(cfg.image_size))

    def per_image(box, score, label):
        score = jnp.where(score >= score_thresh, score, -jnp.inf)
        # class-aware NMS via coordinate offset trick
        offset = label.astype(jnp.float32)[:, None] * (cfg.image_size * 2.0)
        keep, valid = nms_padded(box + offset, score, 0.5, cfg.detections)
        return (box[keep], jnp.where(valid, score[keep], 0.0),
                jnp.where(valid, label[keep], 0))

    boxes, scores, labels = jax.vmap(per_image)(boxes, scores, labels)
    return {"boxes": boxes, "scores": scores, "labels": labels}


def faster_rcnn_predict(outputs: Dict[str, jnp.ndarray],
                        cfg: FasterRCNNConfig,
                        scale: jnp.ndarray, pad: jnp.ndarray,
                        score_thresh: float = 0.05):
    """Decode, per-class NMS (padded), top detections, unletterbox.
    Adds decoded ``keypoints`` (B, D, K, 3) when the model ran its keypoint
    branch (torchvision keypointrcnn inference semantics)."""
    dets = outputs.get("detections")
    if dets is None:
        dets = decode_detections(outputs, cfg, score_thresh)
    pad_xy = jnp.concatenate([pad, pad], -1)[:, None, :]
    out = {
        "boxes": (dets["boxes"] - pad_xy) / scale[:, None, None],
        "scores": dets["scores"],
        "labels": dets["labels"],
    }
    if "kp_logits" in outputs and "detections" in outputs:
        from vit_torch_tpu.detection.keypoint import heatmaps_to_keypoints
        kps = heatmaps_to_keypoints(outputs["kp_logits"],
                                    outputs["kp_boxes"])   # (B, D, K, 3)
        xy = (kps[..., :2] - pad[:, None, None, :]) / \
            scale[:, None, None, None]
        out["keypoints"] = jnp.concatenate([xy, kps[..., 2:]], -1)
    return out
