"""Keypoint R-CNN head — heatmap keypoint estimation over RoI features.

Capability parity with the reference's keypoint path: its COCO utilities
build a keypoint dataset (``object/coco_utils.py:222-251`` ``get_coco_kp``),
its pair transforms flip keypoints with the COCO left/right index swap
(``object/transforms.py:7-14``), and its ``CocoEvaluator`` scores the
``keypoints`` iou_type (``object/coco_eval.py:19-155``) — the model behind
those hooks is torchvision's ``keypointrcnn_resnet50_fpn``.  This module is
the TPU-native equivalent of that model's keypoint branch:

- :class:`KeypointHead`: stacked 3×3 convs over (B, R, S, S, C) RoI features
  → transposed-conv ×2 upsample → bilinear ×2 → per-keypoint heatmap logits
  (torchvision ``KeypointRCNNHeads`` + ``KeypointRCNNPredictor``: 8 conv
  layers of 512, deconv 4×4/2, interpolate ×2 → 56×56 heatmaps);
- :func:`keypoint_loss`: cross-entropy over the flattened heatmap per
  visible keypoint of each sampled positive proposal (torchvision
  ``keypointrcnn_loss``);
- :func:`heatmaps_to_keypoints`: per-box argmax decode back to image
  coordinates with a confidence score.

TPU-first: everything is fixed-shape — the head runs on a static number of
RoIs and the loss masks invisible / out-of-box keypoints instead of
gathering ragged index lists.  Decoding argmaxes the static 56×56 grid and
maps bin centers back through the box transform (torchvision instead
resizes each heatmap to the box's pixel size — a dynamic shape per box;
the bin-center mapping is the static equivalent, accurate to half a bin).
"""

from __future__ import annotations

import re
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.models.layers import Dtype

# COCO-17 horizontal-flip index swap (left_* ↔ right_*), reference
# object/transforms.py:7-14
COCO_KP_FLIP_INDS = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13,
                     16, 15)


def kp_flip_inds_from_names(names) -> Tuple[int, ...]:
    """Derive the horizontal-flip index swap from keypoint names.

    Each name maps to its left/right mirror when one exists in the schema,
    else to itself.  Mirrors are found on *token* boundaries (``left``/
    ``right`` or bare ``l``/``r`` tokens split on ``_-. `` — so
    ``ankle_l``↔``ankle_r`` works without mangling the ``l`` inside
    ``ankle``), then by a first/last-character ``l``↔``r`` swap for short
    names like ``tl``/``tr`` or ``lshoulder``.  On COCO-17 this reproduces
    :data:`COCO_KP_FLIP_INDS`; on a schema with no mirror pairs it is the
    identity (flip-safe).  The result is checked to be an involution —
    any asymmetric candidate pair degrades to identity rather than
    silently corrupting flip supervision."""
    names = list(names)
    idx = {n: i for i, n in enumerate(names)}
    swap = {"left": "right", "right": "left", "l": "r", "r": "l"}

    def mirror(n):
        if not n:                              # malformed schema entry:
            return n                           # degrade to identity
        toks = re.split(r"([_\-. ])", n)       # keep delimiters
        for i, t in enumerate(toks):
            if t.lower() in swap:
                cand = "".join(toks[:i] + [swap[t.lower()]] + toks[i + 1:])
                if cand in idx:
                    return cand
        for pos in (-1, 0):                    # tl/tr, lshoulder/rshoulder
            c = n[pos].lower()
            if c in ("l", "r"):
                sub = swap[c]
                cand = n[:-1] + sub if pos == -1 else sub + n[1:]
                if cand != n and cand in idx:
                    return cand
        return n

    out = [idx[mirror(n)] for n in names]
    for i, j in enumerate(out):                # involution safety net
        if out[j] != i:
            out[i] = i
    return tuple(out)


class KeypointHead(nn.Module):
    """(B, R, S, S, C) RoI features → (B, R, HM, HM, K) heatmap logits."""

    num_keypoints: int
    conv_channels: Tuple[int, ...] = (512,) * 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, R = x.shape[:2]
        x = x.reshape((B * R,) + x.shape[2:])
        for i, ch in enumerate(self.conv_channels):
            x = nn.relu(nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                                name=f"conv_{i}")(x))
        # deconv 4×4 stride 2 to K maps, then bilinear ×2 (torchvision
        # KeypointRCNNPredictor: ConvTranspose2d(512, K, 4, 2, 1) + interp)
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             name="deconv")(x)
        H2, W2 = x.shape[1] * 2, x.shape[2] * 2
        x = jax.image.resize(x.astype(jnp.float32),
                             (x.shape[0], H2, W2, x.shape[3]), "bilinear")
        return x.reshape(B, R, H2, W2, self.num_keypoints)


def keypoints_to_heatmap_targets(keypoints: jnp.ndarray, boxes: jnp.ndarray,
                                 heatmap_size: int):
    """Project gt keypoints (..., K, 3) into their proposal boxes (..., 4):
    returns (target_idx (..., K) int32 into the flattened HM², valid (..., K)
    float32).  A keypoint is valid when visible (v > 0) and its bin lands
    inside the heatmap (torchvision ``keypoints_to_heatmap`` semantics)."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    w = jnp.maximum(x2 - x1, 1e-3)
    h = jnp.maximum(y2 - y1, 1e-3)
    kx, ky, kv = (keypoints[..., i] for i in range(3))
    bx = jnp.floor((kx - x1[..., None]) / w[..., None] * heatmap_size)
    by = jnp.floor((ky - y1[..., None]) / h[..., None] * heatmap_size)
    # keypoints exactly on the far box edge land in the last bin, still
    # valid (torchvision's x_boundary_inds remap) — tight boxes around
    # corner keypoints must not lose their supervision
    bx = jnp.where(kx == x2[..., None], heatmap_size - 1, bx)
    by = jnp.where(ky == y2[..., None], heatmap_size - 1, by)
    inside = (bx >= 0) & (bx < heatmap_size) & (by >= 0) & (by < heatmap_size)
    valid = (inside & (kv > 0)).astype(jnp.float32)
    bx = jnp.clip(bx, 0, heatmap_size - 1).astype(jnp.int32)
    by = jnp.clip(by, 0, heatmap_size - 1).astype(jnp.int32)
    return by * heatmap_size + bx, valid


def keypoint_loss(kp_logits: jnp.ndarray, boxes: jnp.ndarray,
                  gt_keypoints: jnp.ndarray, weights: jnp.ndarray,
                  ) -> jnp.ndarray:
    """CE over the flattened heatmap for every visible keypoint.

    kp_logits: (R, HM, HM, K) for one image's sampled rois;
    boxes: (R, 4) the rois; gt_keypoints: (R, K, 3) matched gt;
    weights: (R,) 1.0 for sampled positives, else 0 (torchvision
    ``keypointrcnn_loss``: CE over valid keypoints of positive rois).
    """
    R, HM = kp_logits.shape[0], kp_logits.shape[1]
    K = kp_logits.shape[-1]
    target, valid = keypoints_to_heatmap_targets(gt_keypoints, boxes, HM)
    valid = valid * weights[:, None]                     # (R, K)
    logits = kp_logits.reshape(R, HM * HM, K).transpose(0, 2, 1)  # (R, K, HM²)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, target[..., None], -1)[..., 0]  # (R, K)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def heatmaps_to_keypoints(kp_logits: jnp.ndarray, boxes: jnp.ndarray,
                          ) -> jnp.ndarray:
    """Decode heatmap logits back to image-coordinate keypoints.

    kp_logits: (..., HM, HM, K); boxes: (..., 4) xyxy.
    Returns (..., K, 3): x, y at the argmax bin center — refined by a 3×3
    soft-argmax around the peak for sub-bin precision — mapped through the
    box, and the softmax probability as the score (torchvision
    ``heatmaps_to_keypoints`` decodes at box resolution; the refined
    static-grid mapping is the fixed-shape equivalent; measured decode
    floor is kpAP 1.000 on the synthetic set, see PERF.md keypoint
    ledger)."""
    HM = kp_logits.shape[-2]
    lead = kp_logits.shape[:-3]
    K = kp_logits.shape[-1]
    flat = kp_logits.reshape(lead + (HM * HM, K))
    prob = jax.nn.softmax(flat.astype(jnp.float32), axis=-2)
    idx = jnp.argmax(flat, axis=-2)                      # (..., K)
    score = jnp.take_along_axis(prob, idx[..., None, :], -2)[..., 0, :]
    iy = idx // HM
    ix = idx % HM
    # 3×3 soft-argmax refinement: probability-weighted offset of the
    # neighborhood around the peak, clamped at the heatmap border (the
    # clamped duplicate weights cancel in the normalized mean).
    num_x = jnp.zeros_like(score)
    num_y = jnp.zeros_like(score)
    den = jnp.zeros_like(score)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny = jnp.clip(iy + dy, 0, HM - 1)
            nx = jnp.clip(ix + dx, 0, HM - 1)
            w = jnp.take_along_axis(
                prob, (ny * HM + nx)[..., None, :], -2)[..., 0, :]
            # a clamped neighbor reads an in-grid bin that is NOT at
            # (dy, dx) — drop it from the mean instead of mis-weighting
            w = w * ((ny == iy + dy) & (nx == ix + dx)).astype(w.dtype)
            num_y = num_y + w * dy
            num_x = num_x + w * dx
            den = den + w
    off_y = num_y / jnp.maximum(den, 1e-12)
    off_x = num_x / jnp.maximum(den, 1e-12)
    by = iy.astype(jnp.float32) + 0.5 + off_y
    bx = ix.astype(jnp.float32) + 0.5 + off_x
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    w = jnp.maximum(x2 - x1, 1e-3)[..., None]
    h = jnp.maximum(y2 - y1, 1e-3)[..., None]
    kx = x1[..., None] + bx / HM * w
    ky = y1[..., None] + by / HM * h
    return jnp.stack([kx, ky, score], axis=-1)
