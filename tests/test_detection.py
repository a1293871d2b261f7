"""Tests for the detection stack: box ops, native mask lib, COCO eval,
matcher, DETR forward/losses, and the synthetic end-to-end smoke."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.detection import _mask
from vit_torch_tpu.detection.boxes import (
    box_iou, cxcywh_to_xyxy, generalized_box_iou, nms_padded, xyxy_to_cxcywh,
)
from vit_torch_tpu.detection.coco_eval import COCO, COCOeval, CocoEvaluator


# --- box ops ---------------------------------------------------------------

def test_box_format_roundtrip():
    boxes = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    c = xyxy_to_cxcywh(boxes)
    np.testing.assert_allclose(np.asarray(c), [[20, 40, 20, 40]])
    np.testing.assert_allclose(np.asarray(cxcywh_to_xyxy(c)),
                               np.asarray(boxes), atol=1e-6)


def test_box_iou_known_values():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_giou_less_than_iou_for_disjoint():
    a = jnp.asarray([[0.0, 0, 1, 1]])
    b = jnp.asarray([[2.0, 2, 3, 3]])
    giou = float(generalized_box_iou(a, b)[0, 0])
    assert giou < 0  # disjoint boxes get negative GIoU


def test_nms_padded():
    boxes = jnp.asarray([[0.0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, valid = nms_padded(boxes, scores, iou_threshold=0.5, max_outputs=3)
    idx, valid = np.asarray(idx), np.asarray(valid)
    kept = idx[valid].tolist()
    assert kept == [0, 2]  # box 1 suppressed by box 0


# --- native mask lib -------------------------------------------------------

def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    mask = (rng.random((13, 7)) > 0.5).astype(np.uint8)
    rle = _mask.encode(mask)
    np.testing.assert_array_equal(_mask.decode(rle), mask)
    assert _mask.area(rle) == int(mask.sum())


def test_rle_iou_matches_dense():
    rng = np.random.default_rng(1)
    m1 = (rng.random((16, 16)) > 0.6).astype(np.uint8)
    m2 = (rng.random((16, 16)) > 0.6).astype(np.uint8)
    r1, r2 = _mask.encode(m1), _mask.encode(m2)
    got = _mask.iou([r1], [r2], [0])[0, 0]
    inter = np.logical_and(m1, m2).sum()
    union = np.logical_or(m1, m2).sum()
    np.testing.assert_allclose(got, inter / union, atol=1e-9)


def test_bbox_iou_iscrowd_semantics():
    dt = np.asarray([[0.0, 0, 10, 10]])       # xywh
    gt = np.asarray([[5.0, 5, 10, 10]])
    plain = _mask.iou(dt, gt, [0])[0, 0]
    crowd = _mask.iou(dt, gt, [1])[0, 0]
    np.testing.assert_allclose(plain, 25 / 175, atol=1e-9)
    np.testing.assert_allclose(crowd, 25 / 100, atol=1e-9)  # inter / dt area


def test_native_library_loaded():
    assert _mask.native_available(), "csrc/libmaskops.so must be built"


def test_poly_to_rle():
    rle = _mask.poly_to_rle([[2, 2, 8, 2, 8, 8, 2, 8]], 10, 10)
    m = _mask.decode(rle)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert 36 <= _mask.area(rle) <= 49


# --- COCO eval -------------------------------------------------------------

def _toy_gt():
    return COCO(dataset={
        "images": [{"id": 1, "height": 100, "width": 100},
                   {"id": 2, "height": 100, "width": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [50, 50, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 1,
             "bbox": [30, 30, 40, 40], "area": 1600, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
    })


def test_cocoeval_perfect_predictions():
    gt = _toy_gt()
    dts = [{"image_id": a["image_id"], "category_id": a["category_id"],
            "bbox": a["bbox"], "score": 0.9}
           for a in gt.dataset["annotations"]]
    ev = COCOeval(gt, gt.load_res(dts), "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] > 0.99, f"perfect predictions must give AP=1, got {stats[0]}"
    assert stats[1] > 0.99  # AP50


def test_cocoeval_no_predictions():
    gt = _toy_gt()
    ev = COCOeval(gt, gt.load_res([]), "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] <= 0.0


def test_cocoeval_half_shifted():
    """Predictions shifted to ~0.47 IoU pass no threshold in 0.5:0.95."""
    gt = _toy_gt()
    dts = []
    for a in gt.dataset["annotations"]:
        x, y, w, h = a["bbox"]
        dts.append({"image_id": a["image_id"], "category_id": a["category_id"],
                    "bbox": [x + w * 0.4, y, w, h], "score": 0.9})
    ev = COCOeval(gt, gt.load_res(dts), "bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] < 0.2


def test_coco_evaluator_wrapper():
    gt = _toy_gt()
    evaluator = CocoEvaluator(gt, ["bbox"])
    # xyxy in, xywh converted internally
    evaluator.update({1: {"boxes": np.asarray([[10, 10, 30, 30],
                                               [50, 50, 70, 70]]),
                          "scores": np.asarray([0.9, 0.8]),
                          "labels": np.asarray([1, 2])}})
    evaluator.update({2: {"boxes": np.asarray([[30, 30, 70, 70]]),
                          "scores": np.asarray([0.95]),
                          "labels": np.asarray([1])}})
    evaluator.accumulate()
    out = evaluator.summarize()
    assert out["bbox"]["ap"] > 0.99
    assert set(out["bbox"]) == set(CocoEvaluator.METRIC_KEYS)


# --- matcher ---------------------------------------------------------------

def test_hungarian_match_prefers_low_cost():
    from vit_torch_tpu.detection.matcher import hungarian_match
    cost = np.asarray([[[0.1, 5.0], [5.0, 0.2], [9.0, 9.0]]])  # (1, 3Q, 2N)
    box_mask = np.asarray([[1.0, 1.0]])
    assign = hungarian_match(cost, box_mask)
    assert assign[0, 0] == 0 and assign[0, 1] == 1 and assign[0, 2] == -1


def test_hungarian_match_non_prefix_mask():
    """Crop augmentation zeroes mask slots at arbitrary positions — the
    matcher must skip invalidated columns, not prefix-slice past them."""
    from vit_torch_tpu.detection.matcher import hungarian_match
    cost = np.asarray([[[0.1, 5.0, 4.0], [5.0, 0.2, 0.3], [9.0, 9.0, 0.1]]],
                      np.float32)                        # (1, 3Q, 3N)
    box_mask = np.asarray([[1.0, 0.0, 1.0]])             # slot 1 cropped out
    assign = hungarian_match(cost, box_mask)
    assert assign[0, 0] == 0 and assign[0, 2] == 2       # valid slots matched
    assert 1 not in assign[0]                            # cropped slot never
    assert assign[0, 1] == -1


def test_cost_matrices_poison_padding():
    from vit_torch_tpu.detection.matcher import cost_matrices
    logits = jnp.zeros((1, 4, 3))
    boxes = jnp.full((1, 4, 4), 0.5)
    gt_labels = jnp.asarray([[1, 0]])
    gt_boxes = jnp.asarray([[[0.5, 0.5, 0.2, 0.2], [0, 0, 0, 0]]])
    mask = jnp.asarray([[1.0, 0.0]])
    cost = np.asarray(cost_matrices(logits, boxes, gt_labels, gt_boxes, mask))
    assert (cost[0, :, 1] >= 1e8).all()      # padded column poisoned
    assert (cost[0, :, 0] < 1e8).all()


# --- DETR end-to-end on synthetic data --------------------------------------

def test_detr_forward_shapes():
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                     enc_layers=1, dec_layers=2, ffn_dim=64)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    out = model.apply(variables, x, True)
    assert out["pred_logits"].shape == (2, 8, 4)
    assert out["pred_boxes"].shape == (2, 8, 4)
    assert len(out["aux_outputs"]) == 1
    assert float(out["pred_boxes"].min()) >= 0.0
    assert float(out["pred_boxes"].max()) <= 1.0


def test_detection_train_step_with_drop_path():
    """Real backbone configs have drop_path_rate > 0 — the train steps must
    supply the dropout rng (regression: InvalidRngError with any non-test
    swin config)."""
    import dataclasses
    import numpy as np
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.detection.matcher import hungarian_match
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    scfg = dataclasses.replace(SWIN_CONFIGS["swin_test"], drop_path_rate=0.2)
    backbone = SwinTransformer(scfg, dtype=jnp.float32, features_only=True,
                               name="backbone")
    cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                     num_heads=4, enc_layers=1, dec_layers=1, ffn_dim=64)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    size = 32
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
                        True)["params"]
    tr = DetectionTrainer(model, params, image_size=size, num_classes=3,
                          lr=1e-4, augment=False)
    batch = {
        "image": np.zeros((2, size, size, 3), np.float32),
        "boxes": np.asarray([[[2, 2, 12, 12]] + [[0] * 4] * 3] * 2,
                            np.float32),
        "labels": np.ones((2, 4), np.int32),
        "box_mask": np.asarray([[1, 0, 0, 0]] * 2, np.float32),
        "mask": np.ones((2,), np.float32),
    }
    rng = jax.random.PRNGKey(1)
    costs, aug_bm = jax.device_get(tr._forward_costs(tr.params, batch, rng))
    assign = np.stack([hungarian_match(costs[li], aug_bm)
                       for li in range(costs.shape[0])])
    _, _, logs = tr._train_step(tr.params, tr.opt_state, batch,
                                jnp.asarray(assign), rng)
    assert np.isfinite(float(logs["loss_total"]))


def test_coco_smoke_end_to_end(tmp_path):
    """--test equivalent: 1 epoch on synthetic COCO through the full CLI."""
    from vit_torch_tpu.cli.coco import main
    fp = str(tmp_path / "stats.json")
    record = main(["--test", "--epochs", "1", "--stats_fp", fp])
    assert record["telem"]["completed"] is True
    d = json.load(open(fp))
    assert len(d["logs"]) == 1
    assert "ap" in d["logs"][0]["val"]["bbox"]
    assert np.isfinite(d["logs"][0]["train"]["loss_total"])


def test_coco_evaluator_segm():
    """segm iou type end-to-end: perfect rectangular masks → segm AP 1."""
    gt = COCO(dataset={
        "images": [{"id": 1, "height": 32, "width": 32}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [4, 4, 10, 10], "area": 100, "iscrowd": 0,
             "segmentation": [[4, 4, 14, 4, 14, 14, 4, 14]]},
        ],
        "categories": [{"id": 1, "name": "a"}],
    })
    evaluator = CocoEvaluator(gt, ["bbox", "segm"])
    mask = np.zeros((1, 32, 32), np.uint8)
    mask[0, 4:15, 4:15] = 1   # PIL polygon rasterization includes boundary
    evaluator.update({1: {"boxes": np.asarray([[4, 4, 14, 14]]),
                          "scores": np.asarray([0.9]),
                          "labels": np.asarray([1]),
                          "masks": mask}})
    evaluator.accumulate()
    out = evaluator.summarize()
    assert out["bbox"]["ap"] > 0.99
    assert out["segm"]["ap"] > 0.99


def test_segm_buckets_by_mask_area_not_box_area():
    """A thin object with a big box but a small mask must score in the
    segm 'small' bucket (pycocotools buckets segm dts by MASK area)."""
    seg = [[0, 0, 9, 0, 9, 9, 0, 9]]           # 10x10 mask = 100 px: small
    gt = COCO(dataset={
        "images": [{"id": 1, "height": 200, "width": 200}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 150, 150], "area": 100, "iscrowd": 0,
             "segmentation": seg},
        ],
        "categories": [{"id": 1, "name": "a"}],
    })
    # dt: same tiny mask, same huge 150x150 box (area 22500: 'large')
    mask = np.zeros((1, 200, 200), np.uint8)
    mask[0, 0:10, 0:10] = 1
    evaluator = CocoEvaluator(gt, ["segm"])
    evaluator.update({1: {"boxes": np.asarray([[0, 0, 150, 150]]),
                          "scores": np.asarray([0.9]),
                          "labels": np.asarray([1]),
                          "masks": mask}})
    evaluator.accumulate()
    out = evaluator.summarize()
    assert out["segm"]["ap"] > 0.99
    assert out["segm"]["aps"] > 0.99           # scored in the small bucket
    assert out["segm"]["apl"] == -1.0          # nothing lands in 'large'


def test_keypoint_gt_without_labeled_kps_is_ignored():
    """gts with num_keypoints == 0 are ignore under the kp protocol —
    not false negatives (pycocotools _prepare)."""
    kps_a = [10.0, 10.0, 2, 20.0, 20.0, 2, 30.0, 30.0, 2]
    kps_none = [0.0, 0.0, 0, 0.0, 0.0, 0, 0.0, 0.0, 0]
    gt = COCO(dataset={
        "images": [{"id": 1, "height": 100, "width": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [5, 5, 30, 30], "area": 900, "iscrowd": 0,
             "keypoints": kps_a, "num_keypoints": 3},
            {"id": 2, "image_id": 1, "category_id": 1,
             "bbox": [50, 50, 30, 30], "area": 900, "iscrowd": 0,
             "keypoints": kps_none, "num_keypoints": 0},
        ],
        "categories": [{"id": 1, "name": "person"}],
    })
    dts = [{"image_id": 1, "category_id": 1, "score": 0.9,
            "bbox": [5, 5, 30, 30], "keypoints": kps_a}]
    ev = COCOeval(gt, gt.load_res(dts), "keypoints")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    # the unlabeled gt must not count as a miss: AR == 1, not 0.5
    assert stats[5] > 0.99, stats


def test_rasterize_rle_respects_letterbox():
    """RLE gt masks must land where the letterboxed image/boxes land
    (regression: the RLE branch used to stretch to the full canvas)."""
    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, letterbox_params)
    h, w, S = 20, 40, 64                       # non-square source
    dense = np.zeros((h, w), np.uint8)
    dense[5:15, 10:30] = 1
    rle = _mask.encode(dense)
    scale, pad_x, pad_y, nh, nw = letterbox_params(h, w, S)
    got = CocoDetectionDataset._rasterize(rle, scale, pad_x, pad_y, S)
    assert got.shape == (S, S)
    # polygon branch of the same rectangle is the ground truth for alignment
    poly = [[10.0, 5, 30, 5, 30, 15, 10, 15]]
    want = CocoDetectionDataset._rasterize(poly, scale, pad_x, pad_y, S)
    inter = np.logical_and(got, want).sum()
    union = np.logical_or(got, want).sum()
    assert inter / union > 0.8
    # nothing outside the letterboxed region
    assert got[:pad_y].sum() == 0 and got[pad_y + nh:].sum() == 0
    assert got[:, :pad_x].sum() == 0 and got[:, pad_x + nw:].sum() == 0


def test_coco_loader_overlaps_decode(tmp_path):
    """The thread-pool + prefetch pipeline must overlap per-sample work with
    consumption: with 4 workers, a slow dataset loads markedly faster than
    the serial path."""
    import time
    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, CocoLoader, make_synthetic_coco)

    img_dir, ann_file = make_synthetic_coco(str(tmp_path), n_images=16,
                                            size=32)
    ds = CocoDetectionDataset(img_dir, ann_file, image_size=32, max_boxes=4)

    class Slow:
        """Proxy dataset with a fixed per-sample cost."""
        def __init__(self, inner):
            self.inner = inner
        def __len__(self):
            return len(self.inner)
        def __getitem__(self, i):
            time.sleep(0.02)
            return self.inner[i]

    slow = Slow(ds)

    def consume(loader):
        t0 = time.perf_counter()
        batches = list(loader)
        return time.perf_counter() - t0, batches

    t_serial, b_serial = consume(CocoLoader(slow, 8, num_workers=0))
    t_pool, b_pool = consume(CocoLoader(slow, 8, num_workers=4))
    assert t_pool < t_serial * 0.6, (t_pool, t_serial)
    # identical content either way
    for a, b in zip(b_serial, b_pool):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["boxes"], b["boxes"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_cocoeval_keypoints_oks():
    """keypoints iou_type (reference object/coco_eval.py:19-155 handles
    bbox/segm/keypoints): perfect keypoint predictions score AP 1; a far-off
    prediction scores 0."""
    K = 17
    kps = []
    rng = np.random.default_rng(0)
    pts = rng.uniform(20, 40, (K, 2))
    for x, y in pts:
        kps.extend([float(x), float(y), 2])
    gt = COCO(dataset={
        "images": [{"id": 1, "height": 64, "width": 64}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [20, 20, 20, 20], "area": 400, "iscrowd": 0,
             "keypoints": kps, "num_keypoints": K},
        ],
        "categories": [{"id": 1, "name": "person"}],
    })
    evaluator = CocoEvaluator(gt, ["keypoints"])
    evaluator.update({1: {
        "boxes": np.asarray([[20.0, 20, 40, 40]]),
        "scores": np.asarray([0.9]),
        "labels": np.asarray([1]),
        "keypoints": np.asarray(kps, np.float64).reshape(1, K, 3),
    }})
    evaluator.accumulate()
    out = evaluator.summarize()
    assert out["keypoints"]["ap"] > 0.99
    assert out["keypoints"]["ar"] > 0.99

    bad = CocoEvaluator(gt, ["keypoints"])
    far = np.asarray(kps, np.float64).reshape(1, K, 3)
    far[..., :2] += 500.0
    bad.update({1: {"boxes": np.asarray([[520.0, 520, 540, 540]]),
                    "scores": np.asarray([0.9]),
                    "labels": np.asarray([1]),
                    "keypoints": far}})
    bad.accumulate()
    assert bad.summarize()["keypoints"]["ap"] < 0.01


def test_detr_learned_position_embedding():
    """The learned 50x50 row/col position variant (reference
    position_encoding.py:52-76) trains params and changes the output."""
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer

    def build(pe):
        backbone = SwinTransformer(SWIN_CONFIGS["swin_test"],
                                   dtype=jnp.float32, features_only=True,
                                   name="backbone")
        cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                         enc_layers=1, dec_layers=1, ffn_dim=64,
                         position_embedding=pe)
        return DETR(cfg, backbone, dtype=jnp.float32)

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 32, 32, 3)),
                    jnp.float32)
    model = build("learned")
    variables = model.init(jax.random.PRNGKey(0), x, True)
    pe_params = variables["params"]["position_embedding"]
    assert pe_params["row_embed"].shape == (50, 16)
    assert pe_params["col_embed"].shape == (50, 16)
    out = model.apply(variables, x, True)
    assert out["pred_logits"].shape == (1, 8, 4)
    # zeroing the tables changes the prediction -> the embedding is live
    zeroed = jax.tree.map(jnp.zeros_like, pe_params)
    variables2 = {"params": {**variables["params"],
                             "position_embedding": zeroed}}
    out2 = model.apply(variables2, x, True)
    assert not np.allclose(np.asarray(out["pred_logits"]),
                           np.asarray(out2["pred_logits"]))


def test_detection_checkpoint_resume(tmp_path):
    """Detection training saves orbax checkpoints and resumes at the next
    epoch (net-new vs the reference's dead --resume flag)."""
    from vit_torch_tpu.cli.coco import main
    ck = str(tmp_path / "ck")
    fp1 = str(tmp_path / "s1.json")
    fp2 = str(tmp_path / "s2.json")
    r1 = main(["--test", "--head", "faster_rcnn", "--epochs", "1",
               "--no_initial_eval", "--ckpt_dir", ck, "--stats_fp", fp1])
    assert r1["telem"]["completed"]
    r2 = main(["--test", "--head", "faster_rcnn", "--epochs", "2",
               "--no_initial_eval", "--resume", ck, "--ckpt_dir", ck,
               "--stats_fp", fp2])
    # epoch 0 already done -> only epoch 1 ran in the resumed process
    assert [row["epoch"] for row in r2["logs"]] == [1]


def test_auction_matches_scipy_hungarian():
    """Device auction assignment is a valid permutation and matches the
    exact scipy Hungarian total cost (ε-CS bound N·ε) on random instances."""
    from vit_torch_tpu.detection.matcher import auction_assign, hungarian_match
    B, Q, N = 6, 32, 12
    worst = 0.0
    for seed in range(3):
        rng = np.random.default_rng(seed)
        cost = rng.normal(0, 5, (B, Q, N)).astype(np.float32)
        mask = np.zeros((B, N), np.float32)
        for b in range(B):
            mask[b, :rng.integers(1, N + 1)] = 1
        cost = np.where(mask[:, None, :] > 0, cost, 1e9)
        a_dev = np.asarray(jax.jit(auction_assign)(jnp.asarray(cost),
                                                   jnp.asarray(mask)))
        a_host = hungarian_match(cost, mask)
        for b in range(B):
            n_gt = int(mask[b].sum())
            matched = a_dev[b][a_dev[b] >= 0]
            assert len(matched) == len(set(matched.tolist()))
            assert set(matched.tolist()) == set(range(n_gt))
            tot_dev = sum(cost[b, q, a_dev[b, q]]
                          for q in range(Q) if a_dev[b, q] >= 0)
            tot_host = sum(cost[b, q, a_host[b, q]]
                           for q in range(Q) if a_host[b, q] >= 0)
            worst = max(worst, tot_dev - tot_host)
    assert worst < 0.5, worst


def test_auction_terminates_when_gts_outnumber_queries():
    """n_valid > Q: all-gts-assigned is unsatisfiable — the loop must stop
    once min(n_valid, Q) gts are matched, not spin to max_iters."""
    from vit_torch_tpu.detection.matcher import auction_assign
    rng = np.random.default_rng(0)
    Q, N = 4, 10
    cost = rng.normal(0, 5, (Q, N)).astype(np.float32)
    mask = np.ones((N,), np.float32)                  # 10 valid gts, 4 queries
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(mask),
                                  max_iters=100_000))
    matched = a[a >= 0]
    assert len(matched) == Q                          # every query owned
    assert len(set(matched.tolist())) == Q            # distinct gts


def _tiny_detr_trainer(matcher):
    import dataclasses
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                     num_heads=4, enc_layers=1, dec_layers=1, ffn_dim=64)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    size = 32
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
                        True)["params"]
    tr = DetectionTrainer(model, params, image_size=size, num_classes=3,
                          lr=1e-3, augment=True, matcher=matcher)
    return tr, size


def _tiny_batches(size, n=4, bs=2):
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(n):
        batches.append({
            "image": rng.uniform(0, 255, (bs, size, size, 3)).astype(
                np.float32),
            "boxes": np.asarray([[[2, 2, 12, 12], [14, 14, 28, 28],
                                  [0] * 4, [0] * 4]] * bs, np.float32),
            "labels": np.ones((bs, 4), np.int32),
            "box_mask": np.asarray([[1, 1, 0, 0]] * bs, np.float32),
            "mask": np.ones((bs,), np.float32),
        })
    return batches


class _ListLoader(list):
    pass


def test_detr_fused_step_trains():
    """Single-dispatch device-matcher step: loss finite, params move, and
    gradients flow through the in-program auction's gathered targets."""
    tr, size = _tiny_detr_trainer("device")
    batch = _tiny_batches(size, n=1)[0]
    rng = jax.random.PRNGKey(1)
    p0 = tr.params
    p1, _, logs = tr._train_step_fused(tr.params, tr.opt_state, batch, rng)
    assert np.isfinite(float(logs["loss_total"]))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))
    assert moved


def test_detr_scan_matches_per_step():
    """DETR chunked-scan epoch (device matcher) is numerically identical to
    the per-step epoch: same rng split sequence, same final params."""
    batches = _tiny_batches(32, n=4)

    tr_a, size = _tiny_detr_trainer("device")
    tr_b, _ = _tiny_detr_trainer("device")
    tr_b.params = jax.tree.map(jnp.copy, tr_a.params)

    loader = _ListLoader(batches)
    logs_a = tr_a.train_one_epoch(loader, epoch=1, warmup=False)
    logs_b = tr_b.train_one_epoch_scan(loader, epoch=1, warmup=False,
                                       steps_per_dispatch=2)
    assert abs(logs_a["loss_total"] - logs_b["loss_total"]) < 1e-4
    for a, b in zip(jax.tree.leaves(tr_a.params),
                    jax.tree.leaves(tr_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_detr_sgd_recipe_builds():
    """--opt sgd (the reference fork's recipe) constructs the coupled-wd
    chain and set_lr targets the right element."""
    import optax
    tr, size = _tiny_detr_trainer("host")
    from vit_torch_tpu.detection.detr import DETR
    from vit_torch_tpu.detection.engine import DetectionTrainer
    tr2 = DetectionTrainer(tr.model, tr.params, image_size=size,
                           num_classes=3, lr=1e-2, opt="sgd",
                           weight_decay=5e-4)
    tr2.set_lr(5e-3)
    assert abs(float(tr2.opt_state[1].hyperparams["learning_rate"])
               - 5e-3) < 1e-9


def test_unletterbox_masks_nearest_semantics():
    """Vectorized mask un-letterboxing: exact on integer-ratio scalings,
    IoU >= 0.98 vs PIL NEAREST elsewhere (PIL's NEAREST box-averages on
    some shapes, so bit-equality is not the spec — nearest semantics is).
    Blob masks (not pixel noise) model real predictions."""
    from PIL import Image
    from vit_torch_tpu.detection.engine import _unletterbox_masks

    def blob(rng, S):
        yy, xx = np.mgrid[0:S, 0:S]
        cy, cx = rng.integers(8, S - 8, 2)
        r = rng.integers(5, S // 3)
        return ((yy - cy) ** 2 + (xx - cx) ** 2 < r * r).astype(np.uint8)

    rng = np.random.default_rng(0)
    # integer-ratio upscale: index map is exact
    S = 32
    masks = np.stack([blob(rng, S) for _ in range(3)])
    got = _unletterbox_masks(masks, 0.5, np.asarray([0, 0]),
                             np.asarray([64, 64]))
    want = np.repeat(np.repeat(masks, 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(got, want)

    # letterboxed odd shapes: near-identical to PIL NEAREST
    for (h, w, S) in [(37, 53, 64), (100, 70, 96), (283, 190, 180)]:
        scale = min(S / h, S / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        px, py = (S - nw) // 2, (S - nh) // 2
        masks = np.stack([blob(rng, S) for _ in range(3)])
        got = _unletterbox_masks(masks, scale, np.asarray([px, py]),
                                 np.asarray([h, w]))
        for i in range(masks.shape[0]):
            crop = masks[i, py:py + nh, px:px + nw] * 255
            want = np.asarray(
                Image.fromarray(crop).resize((w, h), Image.NEAREST)) > 0
            inter = np.logical_and(got[i], want).sum()
            union = max(np.logical_or(got[i], want).sum(), 1)
            assert inter / union >= 0.98, (h, w, S, inter / union)


def test_random_erasing_semantics():
    """Device-side RandomErasing: erased area fraction within the sampled
    scale range, untouched pixels preserved, prob=0 is identity."""
    from vit_torch_tpu.detection.transforms import random_erasing
    rng = jax.random.PRNGKey(0)
    images = jnp.ones((8, 64, 64, 3), jnp.float32) * 100.0
    out = np.asarray(random_erasing(rng, images, prob=1.0, value=0.0))
    for b in range(8):
        erased = (out[b, :, :, 0] == 0.0)
        frac = erased.mean()
        assert 0.01 <= frac <= 0.40, frac          # scale (0.02, 0.33) + clip
        # erased region is one solid rectangle
        ys, xs = np.where(erased)
        area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
        assert area == erased.sum()
    same = np.asarray(random_erasing(rng, images, prob=0.0))
    np.testing.assert_array_equal(same, np.asarray(images))
    # per-channel value broadcast
    out3 = np.asarray(random_erasing(rng, images, prob=1.0,
                                     value=[1.0, 2.0, 3.0]))
    b = 0
    erased = out3[b, :, :, 0] == 1.0
    assert erased.any()
    assert (out3[b][erased][:, 1] == 2.0).all()
    assert (out3[b][erased][:, 2] == 3.0).all()
