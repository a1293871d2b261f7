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

import jax
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


def auction_assign(cost: jnp.ndarray, box_mask: jnp.ndarray,
                   *, eps_frac: float = 1.0 / 500.0,
                   max_iters: int = 256) -> jnp.ndarray:
    """Device-side assignment via the Bertsekas auction algorithm — fully
    jittable, so DETR's matching can live INSIDE the train step (one XLA
    program, chunked-scan capable) instead of a host scipy round-trip.

    ``cost`` (..., Q, N) float, ``box_mask`` (..., N): each valid gt slot j
    bids for its best query under current prices; simultaneous (Jacobi)
    bidding with per-query max conflict resolution; single phase with
    ``ε = spread·eps_frac`` (ε-CS ⇒ total within ``N·ε`` of the optimal
    Hungarian sum — measured gap ≈0 in 3-41 iterations at DETR shapes;
    ε-*scaling* with persistent prices is invalid for this asymmetric
    persons<items case and is deliberately not used).  Leading axes
    (batch, decoder layer) are vmapped.

    Returns int32 (..., Q): matched gt slot per query, or -1.
    """
    cost = cost.astype(jnp.float32)
    if cost.ndim > 2:
        return jax.vmap(lambda c, m: auction_assign(
            c, m, eps_frac=eps_frac, max_iters=max_iters))(cost, box_mask)

    Q, N = cost.shape
    valid = box_mask > 0                                   # (N,)
    benefit = jnp.where(valid[:, None], -cost.T, 0.0)      # (N, Q)
    NEG = jnp.float32(-1e30)
    gt_ids = jnp.arange(N)
    q_ids = jnp.arange(Q)
    spread = jnp.maximum(jnp.max(benefit) - jnp.min(benefit), 1e-6)
    eps = spread * eps_frac
    # at most min(n_valid, Q) gts CAN be assigned: with more valid gts
    # than queries, requiring every valid gt assigned would spin the full
    # max_iters every step (unsatisfiable cond)
    target = jnp.minimum(jnp.sum(valid.astype(jnp.int32)), Q)

    def cond(s):
        _, _, item_of_gt, it = s
        n_assigned = jnp.sum(((item_of_gt >= 0) & valid).astype(jnp.int32))
        return (n_assigned < target) & (it < max_iters)

    def body(s):
        prices, owner, item_of_gt, it = s
        unassigned = (item_of_gt < 0) & valid
        net = benefit - prices[None, :]                    # (N, Q)
        v1 = jnp.max(net, axis=1)
        i1 = jnp.argmax(net, axis=1)
        net2 = net.at[gt_ids, i1].set(NEG)
        v2 = jnp.max(net2, axis=1)
        bid = prices[i1] + (v1 - v2) + eps
        bid = jnp.where(unassigned, bid, NEG)
        hit = i1[:, None] == q_ids[None, :]                # (N, Q)
        scores = jnp.where(hit & unassigned[:, None], bid[:, None], NEG)
        item_best = jnp.max(scores, axis=0)                # (Q,)
        winner = jnp.argmax(scores, axis=0).astype(jnp.int32)
        has_bid = item_best > NEG / 2
        owner = jnp.where(has_bid, winner, owner)
        prices = jnp.where(has_bid, item_best, prices)
        own = owner[None, :] == gt_ids[:, None]            # (N, Q)
        item_of_gt = jnp.where(
            jnp.any(own, axis=1),
            jnp.argmax(own, axis=1), -1).astype(jnp.int32)
        return prices, owner, item_of_gt, it + 1

    prices = jnp.zeros((Q,), jnp.float32)
    owner = jnp.full((Q,), -1, jnp.int32)
    item_of_gt = jnp.full((N,), -1, jnp.int32)
    _, owner, _, _ = jax.lax.while_loop(
        cond, body, (prices, owner, item_of_gt, jnp.int32(0)))
    return owner


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
    # coerce to host numpy ONCE: a device-resident box_mask would otherwise
    # pay a tunnel round-trip per image per layer inside the loop below
    # (measured 2262 ms vs 2.4 ms per step at 512px/bs8 — PERF.md ledger)
    cost = np.asarray(cost)
    box_mask = np.asarray(box_mask)
    B, Q, N = cost.shape
    assign = np.full((B, Q), -1, np.int32)
    for b in range(B):
        # gather valid gt columns by index — crop augmentation can zero
        # mask slots at arbitrary (non-prefix) positions
        valid = np.flatnonzero(box_mask[b] > 0)
        if valid.size == 0:
            continue
        rows, cols = _lsa(cost[b][:, valid])
        assign[b, rows] = valid[cols].astype(np.int32)
    return assign
