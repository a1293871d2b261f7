"""Tests for the Panoptic Quality evaluator."""

import numpy as np

from vit_torch_tpu.detection.panoptic_eval import PQStat, masks_to_segment_map


def _square_map(shape, spec):
    """spec: list of (sid, y0, y1, x0, x1)"""
    m = np.zeros(shape, np.int32)
    for sid, y0, y1, x0, x1 in spec:
        m[y0:y1, x0:x1] = sid
    return m


def test_pq_perfect_match():
    gt = _square_map((20, 20), [(1, 0, 10, 0, 10), (2, 10, 20, 10, 20)])
    pred = gt.copy()
    stat = PQStat()
    stat.update(gt, {1: 5, 2: 7}, pred, {1: 5, 2: 7})
    out = stat.summarize()
    assert out["pq"] == 1.0 and out["sq"] == 1.0 and out["rq"] == 1.0
    assert out["n"] == 2


def test_pq_partial_overlap_and_miss():
    gt = _square_map((20, 20), [(1, 0, 10, 0, 10)])
    # pred shifted: IoU < 0.5 -> no match -> gt is FN; the pred lies 64% over
    # void so the panopticapi rule skips it as FP
    pred = _square_map((20, 20), [(1, 4, 14, 4, 14)])
    stat = PQStat()
    stat.update(gt, {1: 5}, pred, {1: 5})
    out = stat.summarize()
    assert out["pq"] == 0.0
    assert stat.fp[5] == 0 and stat.fn[5] == 1

    # a pred mostly over *labeled* pixels does count as FP
    gt2 = _square_map((20, 20), [(1, 0, 20, 0, 20)])
    pred2 = _square_map((20, 20), [(1, 0, 5, 0, 20)])   # IoU 0.25
    stat2 = PQStat()
    stat2.update(gt2, {1: 5}, pred2, {1: 5})
    assert stat2.fp[5] == 1 and stat2.fn[5] == 1


def test_pq_class_mismatch_no_match():
    gt = _square_map((10, 10), [(1, 0, 10, 0, 10)])
    stat = PQStat()
    stat.update(gt, {1: 5}, gt.copy(), {1: 6})   # same pixels, wrong class
    out = stat.summarize()
    assert stat.tp[5] == 0 and stat.fn[5] == 1 and stat.fp[6] == 1


def test_pq_iou_weighted_sq():
    gt = _square_map((20, 20), [(1, 0, 10, 0, 20)])       # 200 px
    pred = _square_map((20, 20), [(1, 0, 8, 0, 20)])      # 160 px, IoU 0.8
    stat = PQStat()
    stat.update(gt, {1: 3}, pred, {1: 3})
    out = stat.summarize()
    assert abs(out["sq"] - 0.8) < 1e-9
    assert out["rq"] == 1.0


def test_crowd_gt_not_counted_as_fn():
    gt = _square_map((10, 10), [(1, 0, 10, 0, 10)])
    pred = np.zeros((10, 10), np.int32)
    stat = PQStat()
    stat.update(gt, {1: 5}, pred, {}, crowd_ids=[1])
    assert stat.fn[5] == 0


def test_masks_to_segment_map_score_priority():
    masks = np.zeros((2, 8, 8), np.uint8)
    masks[0, 0:6, 0:6] = 1      # low score
    masks[1, 2:8, 2:8] = 1      # high score, overlaps
    seg, segments = masks_to_segment_map(masks, labels=[3, 4],
                                         scores=[0.2, 0.9], shape=(8, 8))
    # high-score instance owns the overlap
    assert segments[seg[4, 4]] == 4
    assert segments[seg[1, 1]] == 3
    assert set(segments.values()) == {3, 4}
