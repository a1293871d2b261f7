"""Hungarian matcher (host-side).

Capability parity with the reference's ``HungarianMatcher``
(``object_detr/models/matcher.py:55-82``): per-image assignment minimizing
``w_bbox·L1 + w_class·(−prob) + w_giou·(−GIoU)`` via
``scipy.optimize.linear_sum_assignment``.

The cost matrices are computed on device inside the jitted forward (one
fused XLA program); only the small (Q × n_gt) cost tensors cross to the host
for the assignment (SURVEY.md §7: per-image Hungarian stays on host — the
matrices are tiny).  Indices return as fixed-shape padded arrays so the loss
step stays jittable.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from vit_torch_tpu.detection.boxes import (
    cxcywh_to_xyxy, generalized_box_iou,
)


def cost_matrices(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                  gt_labels: jnp.ndarray, gt_boxes_cxcywh: jnp.ndarray,
                  box_mask: jnp.ndarray, *, cost_class: float = 1.0,
                  cost_bbox: float = 5.0, cost_giou: float = 2.0):
    """Batched (B, Q, N_pad) matching cost, computed on device.

    Padded gt slots get +inf-like cost so they are never chosen before real
    ones; the host assignment only considers the first n_gt columns anyway.
    """
    import jax
    prob = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    # class cost: -prob[target_class]
    cls_cost = -jnp.take_along_axis(
        prob[:, :, :], gt_labels[:, None, :], axis=2)          # (B, Q, N)
    l1 = jnp.sum(jnp.abs(pred_boxes[:, :, None, :] -
                         gt_boxes_cxcywh[:, None, :, :]), axis=-1)
    giou = generalized_box_iou(cxcywh_to_xyxy(pred_boxes),
                               cxcywh_to_xyxy(gt_boxes_cxcywh))
    cost = cost_class * cls_cost + cost_bbox * l1 - cost_giou * giou
    # poison padded gt columns
    cost = jnp.where(box_mask[:, None, :] > 0, cost, 1e9)
    return cost


def _lsa(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    try:
        from scipy.optimize import linear_sum_assignment
        return linear_sum_assignment(cost)
    except ImportError:  # greedy fallback
        n_rows, n_cols = cost.shape
        rows, cols = [], []
        c = cost.copy()
        for _ in range(min(n_rows, n_cols)):
            i, j = np.unravel_index(np.argmin(c), c.shape)
            rows.append(i)
            cols.append(j)
            c[i, :] = np.inf
            c[:, j] = np.inf
        return np.asarray(rows), np.asarray(cols)


def hungarian_match(cost: np.ndarray, box_mask: np.ndarray,
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Per-image assignment over a (B, Q, N_pad) host cost tensor.

    Returns fixed-shape arrays: ``assign`` (B, Q) int32 — for every query,
    the matched gt slot or -1 — suitable for jitted loss gather.
    """
    B, Q, N = cost.shape
    assign = np.full((B, Q), -1, np.int32)
    for b in range(B):
        n_gt = int(box_mask[b].sum())
        if n_gt == 0:
            continue
        rows, cols = _lsa(cost[b, :, :n_gt])
        assign[b, rows] = cols
    return assign
