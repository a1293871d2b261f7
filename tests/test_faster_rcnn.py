"""Tests for the FasterRCNN two-stage detector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.detection.faster_rcnn import (
    FasterRCNN, FasterRCNNConfig, decode_boxes, encode_boxes,
    faster_rcnn_losses, faster_rcnn_predict, generate_anchors, match_to_gt,
    roi_align, sample_balanced, smooth_l1,
)
from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet

CFG = FasterRCNNConfig(num_classes=3, image_size=64, strides=(4, 8),
                       anchor_sizes=(8.0, 16.0), num_proposals=32,
                       rpn_pre_nms_topk=64, rpn_batch=32, roi_batch=16,
                       detections=10)


def test_anchor_grid_static():
    a = generate_anchors(64, (4, 8), (8.0, 16.0))
    n = 3 * (16 * 16) + 3 * (8 * 8)
    assert a.shape == (n, 4)
    # centers on the stride grid
    cx = (a[:, 0] + a[:, 2]) / 2
    assert cx.min() >= 0 and cx.max() <= 64


def test_anchor_layout_is_position_major():
    """anchors[i] must pair with the RPN head's (B, H, W, A) flatten order:
    position-major with the ratio axis innermost."""
    ratios = (0.5, 1.0, 2.0)
    a = generate_anchors(64, (4,), (8.0,), ratios=ratios)
    g = 64 // 4
    a = a.reshape(g, g, len(ratios), 4)
    # the 3 ratio anchors at one grid position share one center
    cx = (a[..., 0] + a[..., 2]) / 2
    cy = (a[..., 1] + a[..., 3]) / 2
    np.testing.assert_allclose(cx, np.broadcast_to(cx[..., :1], cx.shape),
                               atol=1e-5)
    np.testing.assert_allclose(cy, np.broadcast_to(cy[..., :1], cy.shape),
                               atol=1e-5)
    # centers advance along x with the second axis, y with the first
    np.testing.assert_allclose(cx[0, :, 0], (np.arange(g) + 0.5) * 4)
    np.testing.assert_allclose(cy[:, 0, 0], (np.arange(g) + 0.5) * 4)
    # ratio order matches the head's channel order: h/w = sqrt(r)/(1/sqrt(r))
    w = a[0, 0, :, 2] - a[0, 0, :, 0]
    h = a[0, 0, :, 3] - a[0, 0, :, 1]
    np.testing.assert_allclose(h / w, np.asarray(ratios), rtol=1e-5)


def test_box_coding_roundtrip():
    anchors = jnp.asarray([[10.0, 10, 30, 30], [0, 0, 8, 16]])
    boxes = jnp.asarray([[12.0, 8, 33, 29], [1, 2, 9, 18]])
    deltas = encode_boxes(boxes, anchors)
    back = decode_boxes(deltas, anchors)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-4)


def test_smooth_l1_regions():
    x = jnp.asarray([0.0, 0.05, 1.0])
    out = np.asarray(smooth_l1(x, beta=1 / 9))
    assert out[0] == 0
    assert out[1] == pytest.approx(0.5 * 0.05 ** 2 / (1 / 9))
    assert out[2] == pytest.approx(1.0 - 0.5 / 9)


def test_match_to_gt_thresholds():
    cands = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 9, 9], [40, 40, 50, 50],
                         [2, 2, 12, 12]])
    gt = jnp.asarray([[0.0, 0, 10, 10], [0, 0, 0, 0]])
    mask = jnp.asarray([1.0, 0.0])
    idx, label = match_to_gt(cands, gt, mask, hi=0.7, lo=0.3)
    assert label[0] == 1 and idx[0] == 0     # exact match
    assert label[1] == 1                      # iou .81
    assert label[2] == 0                      # disjoint -> negative
    assert label[3] == -1                     # iou ~.47 -> ignore band


def test_match_low_quality_rescue():
    cands = jnp.asarray([[0.0, 0, 6, 6], [20, 20, 30, 30]])
    gt = jnp.asarray([[0.0, 0, 10, 10]])
    mask = jnp.asarray([1.0])
    _, label = match_to_gt(cands, gt, mask, hi=0.7, lo=0.3,
                           allow_low_quality=True)
    assert label[0] == 1  # best anchor for the gt is forced positive


def test_sample_balanced_counts():
    rng = jax.random.PRNGKey(0)
    label = jnp.asarray([1] * 3 + [0] * 20 + [-1] * 5)
    idx, weight, is_pos = sample_balanced(rng, label, 16, 0.25)
    assert idx.shape == (16,)
    assert float(is_pos.sum()) == 3          # only 3 positives exist
    assert float(weight.sum()) == 15         # 3 pos + 12 neg valid


def test_roi_align_constant_map():
    feats = [jnp.full((1, 16, 16, 4), 7.0), jnp.full((1, 8, 8, 4), 3.0)]
    boxes = jnp.asarray([[[4.0, 4, 12, 12]]])   # small box -> level 0
    out = roi_align(feats, boxes, (4, 8), output_size=3)
    assert out.shape == (1, 1, 3, 3, 4)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_roi_align_flat_matches_blend():
    """The flat-gather lowering must equal the all-levels blend exactly
    (each RoI reads one level either way)."""
    from vit_torch_tpu.detection.faster_rcnn import (_roi_align_blend,
                                                     _roi_align_flat)
    rng = np.random.default_rng(3)
    feats = [jnp.asarray(rng.normal(size=(2, 32, 32, 8)), jnp.float32),
             jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32),
             jnp.asarray(rng.normal(size=(2, 8, 8, 8)), jnp.float32)]
    # boxes spanning all levels, incl. edge-clipping and degenerate ones
    boxes = jnp.asarray(np.stack([
        np.stack([[2.0, 2, 20, 20], [0, 0, 120, 120], [-5, -5, 40, 60],
                  [100, 100, 128, 128], [7, 7, 7, 7]]),
        np.stack([[0.0, 0, 10, 10], [30, 40, 90, 80], [1, 1, 127, 127],
                  [64, 0, 128, 64], [0, 64, 64, 128]])]), jnp.float32)
    a = _roi_align_flat(feats, boxes, (4, 8, 16), output_size=5)
    b = _roi_align_blend(feats, boxes, (4, 8, 16), output_size=5)
    assert a.shape == (2, 5, 5, 5, 8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_roi_align_flat_grads_match_blend():
    from vit_torch_tpu.detection.faster_rcnn import (_roi_align_blend,
                                                     _roi_align_flat)
    rng = np.random.default_rng(5)
    feats = [jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32),
             jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)]
    boxes = jnp.asarray([[[3.0, 2, 14, 13], [0, 0, 60, 60]]], jnp.float32)

    def loss(fn, fs):
        return (fn(fs, boxes, (4, 8), output_size=3) ** 2).sum()

    ga = jax.grad(lambda fs: loss(_roi_align_flat, fs))(feats)
    gb = jax.grad(lambda fs: loss(_roi_align_blend, fs))(feats)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-5)


def _build_model():
    backbone = ResNet(RESNET_CONFIGS["resnet_test"], dtype=jnp.float32,
                      features_only=True, name="backbone")
    model = FasterRCNN(CFG, backbone, dtype=jnp.float32)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy, deterministic=True)
    return model, variables


def test_faster_rcnn_forward_shapes():
    model, variables = _build_model()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x, deterministic=True)
    n_anchors = 3 * (16 * 16 + 8 * 8)
    assert out["rpn_logits"].shape == (2, n_anchors)
    assert out["rpn_deltas"].shape == (2, n_anchors, 4)
    assert out["proposals"].shape == (2, 32, 4)
    assert out["cls_logits"].shape == (2, 32, 4)      # 3 classes + bg
    assert out["box_deltas"].shape == (2, 32, 4, 4)


def test_faster_rcnn_losses_and_grad():
    model, variables = _build_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    targets = {
        "boxes": jnp.asarray([[[8.0, 8, 24, 24], [30, 30, 50, 50]],
                              [[10.0, 20, 30, 40], [0, 0, 0, 0]]]),
        "labels": jnp.asarray([[1, 2], [3, 0]]),
        "box_mask": jnp.asarray([[1.0, 1.0], [1.0, 0.0]]),
        "mask": jnp.asarray([1.0, 1.0]),
    }

    def loss_fn(params):
        out = model.apply({"params": params, **{
            k: v for k, v in variables.items() if k != "params"}},
            x, deterministic=True)
        losses = faster_rcnn_losses(out, targets, CFG, jax.random.PRNGKey(1))
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    for key in ("loss_rpn_cls", "loss_rpn_reg", "loss_cls", "loss_reg"):
        assert np.isfinite(float(losses[key])), key
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_faster_rcnn_scan_epoch_matches_per_step():
    """train_one_epoch_scan (K steps per dispatch) reproduces the per-step
    path exactly: same rng split sequence, same final params/opt state."""
    from vit_torch_tpu.detection.engine import FasterRCNNTrainer
    model, variables = _build_model()
    rng = np.random.default_rng(3)

    def make_loader():
        batches = []
        for i in range(4):
            batches.append({
                "image": rng0["image"][i],
                "boxes": np.asarray([[[8.0, 8, 24, 24], [0, 0, 0, 0]]] * 2,
                                    np.float32),
                "labels": np.asarray([[1, 0]] * 2, np.int32),
                "box_mask": np.asarray([[1.0, 0.0]] * 2, np.float32),
                "mask": np.ones((2,), np.float32),
            })
        return batches

    rng0 = {"image": rng.normal(0, 1, (4, 2, 64, 64, 3)).astype(np.float32)}

    def run(scan):
        tr = FasterRCNNTrainer(model, variables["params"], cfg=CFG, lr=1e-3,
                               augment=True)
        tr.model_state = {k: v for k, v in variables.items()
                          if k != "params"}
        loader = make_loader()
        if scan:
            logs = tr.train_one_epoch_scan(loader, epoch=1,
                                           steps_per_dispatch=2,
                                           warmup=False)
        else:
            logs = tr.train_one_epoch(loader, epoch=1, warmup=False)
        return tr.params, logs

    p_step, logs_step = run(scan=False)
    p_scan, logs_scan = run(scan=True)
    flat_a = jax.tree.leaves(p_step)
    flat_b = jax.tree.leaves(p_scan)
    for a, b in zip(flat_a, flat_b):
        # scan and per-step compile to different XLA fusions of the same
        # graph; after 4 AdamW steps (eps-normalized updates amplify
        # last-bit rounding) single elements drift to ~1e-6 abs in fp32 —
        # observed with the round-5 torch-faithful BatchNorm (1 of 9408
        # elements at 1.13e-6).  Semantics are pinned elsewhere
        # (test_family_trajectory fp64-exact vs torch).
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-6, rtol=1e-5)
    assert abs(logs_step["loss_total"] - logs_scan["loss_total"]) < 1e-4


def test_faster_rcnn_scan_epoch_tail_batches():
    """A batch count that does not fill the last chunk runs the tail
    through the per-step path and still counts every batch."""
    from vit_torch_tpu.detection.engine import FasterRCNNTrainer
    model, variables = _build_model()
    rng = np.random.default_rng(4)
    batches = [{
        "image": rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32),
        "boxes": np.asarray([[[8.0, 8, 24, 24], [0, 0, 0, 0]]] * 2,
                            np.float32),
        "labels": np.asarray([[1, 0]] * 2, np.int32),
        "box_mask": np.asarray([[1.0, 0.0]] * 2, np.float32),
        "mask": np.ones((2,), np.float32),
    } for _ in range(3)]
    tr = FasterRCNNTrainer(model, variables["params"], cfg=CFG, lr=1e-3)
    tr.model_state = {k: v for k, v in variables.items() if k != "params"}
    logs = tr.train_one_epoch_scan(batches, epoch=0, steps_per_dispatch=2)
    assert np.isfinite(logs["loss_total"])


def test_faster_rcnn_predict_shapes():
    model, variables = _build_model()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x, deterministic=True)
    preds = faster_rcnn_predict(out, CFG,
                                scale=jnp.ones(2), pad=jnp.zeros((2, 2)))
    assert preds["boxes"].shape == (2, 10, 4)
    assert preds["scores"].shape == (2, 10)
    assert preds["labels"].shape == (2, 10)


def test_faster_rcnn_smoke_cli(tmp_path):
    from vit_torch_tpu.cli.coco import main
    fp = str(tmp_path / "stats.json")
    record = main(["--test", "--head", "faster_rcnn", "--epochs", "1",
                   "--lr", "0.005", "--stats_fp", fp])
    assert record["telem"]["completed"] is True
    row = record["logs"][0]
    assert np.isfinite(row["train"]["loss_total"])
    assert "ap" in row["val"]["bbox"]


def test_random_hflip_semantics():
    from vit_torch_tpu.detection.transforms import random_hflip
    rng = jax.random.PRNGKey(0)
    S = 16
    img = jnp.zeros((2, S, S, 3)).at[:, 2, 3, :].set(1.0)
    boxes = jnp.asarray([[[3.0, 2, 5, 4]], [[3.0, 2, 5, 4]]])
    masks = jnp.zeros((2, 1, S, S)).at[:, 0, 2, 3].set(1)

    # prob=1: everything flips, together
    fi, fb, fm = random_hflip(rng, img, boxes, S, masks, prob=1.0)
    assert float(fi[0, 2, S - 1 - 3, 0]) == 1.0
    np.testing.assert_allclose(np.asarray(fb[0]), [[S - 5, 2, S - 3, 4]])
    assert int(fm[0, 0, 2, S - 1 - 3]) == 1
    # flipped box still covers the flipped pixel
    x1, y1, x2, y2 = np.asarray(fb[0, 0])
    assert x1 <= S - 1 - 3 + 1 <= x2 and y1 <= 2 + 1 <= y2

    # prob=0: identity
    ii, ib, im = random_hflip(rng, img, boxes, S, masks, prob=0.0)
    np.testing.assert_array_equal(np.asarray(ii), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(im), np.asarray(masks))


def test_faster_rcnn_cli_pretrained_backbone(tmp_path):
    """--torch_ckpt wires a torchvision-layout resnet state_dict into the
    FRCNN backbone (reference pretrained path, coco_pipeline.py:428-438)."""
    import torch
    from vit_torch_tpu.cli.coco import main

    cfg = RESNET_CONFIGS["resnet_test"]
    backbone = ResNet(cfg, dtype=jnp.float32, features_only=True)
    variables = backbone.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 64, 64, 3)), True)
    p, s = variables["params"], variables["batch_stats"]

    def conv(node):
        return np.asarray(node["kernel"]).transpose(3, 2, 0, 1)

    sd = {"conv1.weight": torch.tensor(conv(p["conv1"]))}
    def put_bn(prefix, pn, sn):
        sd[f"{prefix}.weight"] = torch.tensor(np.asarray(pn["scale"]))
        sd[f"{prefix}.bias"] = torch.tensor(np.asarray(pn["bias"]))
        sd[f"{prefix}.running_mean"] = torch.tensor(np.asarray(sn["mean"]))
        sd[f"{prefix}.running_var"] = torch.tensor(np.asarray(sn["var"]))
    put_bn("bn1", p["bn1"], s["bn1"])
    for li in range(1, len(cfg.layers) + 1):
        name = f"layer{li}_0"
        for j in (1, 2, 3):
            sd[f"layer{li}.0.conv{j}.weight"] = torch.tensor(
                conv(p[name][f"conv{j}"]))
            put_bn(f"layer{li}.0.bn{j}", p[name][f"bn{j}"], s[name][f"bn{j}"])
        if "downsample_conv" in p[name]:
            sd[f"layer{li}.0.downsample.0.weight"] = torch.tensor(
                conv(p[name]["downsample_conv"]))
            put_bn(f"layer{li}.0.downsample.1", p[name]["downsample_bn"],
                   s[name]["downsample_bn"])
    ckpt = tmp_path / "resnet_test.pth"
    torch.save(sd, str(ckpt))

    fp = str(tmp_path / "stats.json")
    record = main(["--test", "--head", "faster_rcnn", "--epochs", "1",
                   "--torch_ckpt", str(ckpt), "--no_initial_eval",
                   "--stats_fp", fp])
    assert record["telem"]["completed"] is True
    assert np.isfinite(record["logs"][0]["train"]["loss_total"])


def test_faster_rcnn_cli_swin_backbone(tmp_path):
    """Swin multi-stage backbone reachable from the FRCNN CLI (the
    reference's module-surgery assembly, object/module_surgery.py:92-126)."""
    from vit_torch_tpu.cli.coco import main
    fp = str(tmp_path / "stats.json")
    record = main(["--test", "--head", "faster_rcnn", "--backbone",
                   "swin_test3", "--epochs", "1", "--no_initial_eval",
                   "--stats_fp", fp])
    assert record["telem"]["completed"] is True
    assert np.isfinite(record["logs"][0]["train"]["loss_total"])


def test_random_zoom_crop_semantics():
    from vit_torch_tpu.detection.transforms import random_zoom_crop
    S = 32
    rng = jax.random.PRNGKey(2)
    img = jnp.zeros((3, S, S, 3)).at[:, 8:16, 8:16, :].set(1.0)
    boxes = jnp.asarray([[[8.0, 8, 16, 16]]] * 3)
    box_mask = jnp.ones((3, 1))
    masks = jnp.zeros((3, 1, S, S)).at[:, 0, 8:16, 8:16].set(1)

    # prob=0: exact identity
    ii, ib, im_mask, im = random_zoom_crop(rng, img, boxes, box_mask, S,
                                           masks, prob=0.0)
    np.testing.assert_array_equal(np.asarray(ii), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(ib), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(im_mask), np.asarray(box_mask))

    # prob=1: boxes stay aligned with the zoomed content
    zi, zb, zm_mask, zm = random_zoom_crop(rng, img, boxes, box_mask, S,
                                           masks, prob=1.0)
    zi, zb, zm_mask, zm = map(np.asarray, (zi, zb, zm_mask, zm))
    for b in range(3):
        if zm_mask[b, 0] == 0:
            continue
        x1, y1, x2, y2 = zb[b, 0]
        # the bright square's pixels must fall (mostly) inside the new box
        ys, xs = np.nonzero(zi[b, :, :, 0] > 0.5)
        if len(xs) == 0:
            continue
        assert xs.min() >= x1 - 2 and xs.max() <= x2 + 2
        assert ys.min() >= y1 - 2 and ys.max() <= y2 + 2
        # instance mask tracks the image content
        mys, mxs = np.nonzero(zm[b, 0])
        if len(mxs):
            assert abs(mxs.min() - xs.min()) <= 2
            assert abs(mys.min() - ys.min()) <= 2


def test_detr_cli_aug_crop(tmp_path):
    from vit_torch_tpu.cli.coco import main
    fp = str(tmp_path / "stats.json")
    record = main(["--test", "--epochs", "1", "--aug_crop",
                   "--no_initial_eval", "--stats_fp", fp])
    assert record["telem"]["completed"] is True
    assert np.isfinite(record["logs"][0]["train"]["loss_total"])
