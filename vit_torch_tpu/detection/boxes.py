"""Box operations (jax, fixed-shape, TPU-friendly).

Replaces the torchvision box ops the reference's detection stacks use
(``object/engine.py``, ``object_detr/models/matcher.py:55-82``,
``object_detr/util/box_ops.py`` semantics): format conversion, IoU / GIoU
matrices, and a static-shape padded NMS.

Everything is batch-vectorized with validity masks: TPU detection runs on
*padded* box sets (SURVEY.md §7 "padded top-K everywhere"), never ragged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cxcywh_to_xyxy(boxes: jax.Array) -> jax.Array:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                           axis=-1)


def xyxy_to_cxcywh(boxes: jax.Array) -> jax.Array:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0],
                           axis=-1)


def xyxy_to_xywh(boxes: jax.Array) -> jax.Array:
    """COCO result format (reference ``object/coco_eval.py:158-160``)."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x1 - x0, y1 - y0], axis=-1)


def box_area(boxes: jax.Array) -> jax.Array:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU: a (..., N, 4) × b (..., M, 4) → (..., N, M), xyxy."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def generalized_box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """GIoU matrix (DETR loss / matcher cost, reference
    ``object_detr/models/matcher.py:70-76`` semantics)."""
    iou = box_iou(a, b)
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    hull = wh[..., 0] * wh[..., 1]
    inter_lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    inter_rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    inter_wh = jnp.maximum(inter_rb - inter_lt, 0)
    inter = inter_wh[..., 0] * inter_wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def nms_padded(boxes: jax.Array, scores: jax.Array, iou_threshold: float,
               max_outputs: int) -> tuple:
    """Static-shape NMS: returns (indices (max_outputs,), valid mask).

    Replaces torchvision's dynamic-length ``nms`` (used inside the
    reference's FasterRCNN); implemented as a fixed-trip-count greedy loop
    (``lax.fori_loop``), jit/TPU-safe.
    """
    n = boxes.shape[0]
    iou = box_iou(boxes, boxes)

    def body(i, carry):
        chosen, live_scores = carry
        best = jnp.argmax(live_scores)
        best_valid = live_scores[best] > -jnp.inf
        chosen = chosen.at[i].set(jnp.where(best_valid, best, -1))
        overlap = iou[best] > iou_threshold
        suppress = overlap | (jnp.arange(n) == best)
        live_scores = jnp.where(best_valid & suppress, -jnp.inf, live_scores)
        return chosen, live_scores

    chosen0 = jnp.full((max_outputs,), -1, jnp.int32)
    live0 = jnp.where(scores > -jnp.inf, scores, -jnp.inf)
    chosen, _ = jax.lax.fori_loop(
        0, max_outputs, body, (chosen0, live0.astype(jnp.float32)))
    valid = chosen >= 0
    return jnp.maximum(chosen, 0), valid
