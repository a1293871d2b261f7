"""Keypoint R-CNN tests: heatmap target projection, decoding, loss,
head shapes, model wiring, hflip keypoint transform, CLI smoke.

Reference surface: torchvision keypointrcnn via ``get_coco_kp``
(reference ``object/coco_utils.py:222-251``), keypoint flip
(``object/transforms.py:7-14``), keypoints iou_type
(``object/coco_eval.py:19-155``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_keypoints_to_heatmap_targets():
    from vit_torch_tpu.detection.keypoint import keypoints_to_heatmap_targets
    box = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])          # w=20, h=40
    kps = jnp.asarray([[[10.0, 20.0, 2.0],                 # top-left corner
                        [29.9, 59.9, 2.0],                 # bottom-right
                        [20.0, 40.0, 2.0],                 # center
                        [5.0, 40.0, 2.0],                  # outside (x)
                        [20.0, 40.0, 0.0]]])               # invisible
    idx, valid = keypoints_to_heatmap_targets(kps, box, 4)
    np.testing.assert_array_equal(np.asarray(valid[0]), [1, 1, 1, 0, 0])
    assert int(idx[0, 0]) == 0                              # bin (0, 0)
    assert int(idx[0, 1]) == 15                             # bin (3, 3)
    assert int(idx[0, 2]) == 2 * 4 + 2                      # bin (2, 2)


def test_keypoints_on_far_box_edge_stay_valid():
    """kx == x2 / ky == y2 remap to the last bin, still supervised
    (torchvision's x_boundary_inds semantics) — tight boxes around corner
    keypoints must not drop them."""
    from vit_torch_tpu.detection.keypoint import keypoints_to_heatmap_targets
    box = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
    kps = jnp.asarray([[[30.0, 60.0, 2.0],                  # far corner
                        [30.0, 20.0, 2.0],                  # right edge, top
                        [30.1, 40.0, 2.0]]])                # just outside
    idx, valid = keypoints_to_heatmap_targets(kps, box, 4)
    np.testing.assert_array_equal(np.asarray(valid[0]), [1, 1, 0])
    assert int(idx[0, 0]) == 15                             # bin (3, 3)
    assert int(idx[0, 1]) == 3                              # bin (0, 3)


def test_heatmaps_to_keypoints_roundtrip():
    from vit_torch_tpu.detection.keypoint import heatmaps_to_keypoints
    HM, K = 8, 3
    box = jnp.asarray([[16.0, 32.0, 48.0, 96.0]])           # w=32, h=64
    logits = np.full((1, HM, HM, K), -10.0, np.float32)
    logits[0, 2, 5, 0] = 10.0          # kp0 at bin (y=2, x=5)
    logits[0, 7, 0, 1] = 10.0          # kp1 at bin (7, 0)
    logits[0, 0, 0, 2] = 10.0
    kps = heatmaps_to_keypoints(jnp.asarray(logits), box)
    assert kps.shape == (1, K, 3)
    np.testing.assert_allclose(np.asarray(kps[0, 0, :2]),
                               [16 + 5.5 / 8 * 32, 32 + 2.5 / 8 * 64],
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(kps[0, 1, :2]),
                               [16 + 0.5 / 8 * 32, 32 + 7.5 / 8 * 64],
                               atol=1e-4)
    assert float(kps[0, 0, 2]) > 0.99   # spike softmax prob


def test_heatmaps_to_keypoints_subbin_refinement():
    """A Gaussian peak at a non-bin-center position decodes closer to the
    true position than the bin center (3x3 soft-argmax refinement)."""
    from vit_torch_tpu.detection.keypoint import heatmaps_to_keypoints
    HM = 8
    box = jnp.asarray([[0.0, 0.0, float(HM), float(HM)]])   # 1 px per bin
    y0, x0 = 2.3, 5.7                                       # true, in bins
    yy, xx = np.meshgrid(np.arange(HM) + 0.5, np.arange(HM) + 0.5,
                         indexing="ij")
    logits = -(((yy - y0) ** 2 + (xx - x0) ** 2) / (2 * 0.6 ** 2))
    kps = heatmaps_to_keypoints(
        jnp.asarray(logits[None, :, :, None], jnp.float32), box)
    dec_x, dec_y = float(kps[0, 0, 0]), float(kps[0, 0, 1])
    # argmax bin center is (5.5, 2.5): 0.2 bins off on each axis
    assert abs(dec_x - x0) < 0.1, dec_x
    assert abs(dec_y - y0) < 0.1, dec_y
    # border peak: refinement must stay inside the grid
    edge = np.full((1, HM, HM, 1), -10.0, np.float32)
    edge[0, 0, HM - 1, 0] = 10.0
    ek = heatmaps_to_keypoints(jnp.asarray(edge), box)
    assert 0.0 <= float(ek[0, 0, 0]) <= HM
    assert 0.0 <= float(ek[0, 0, 1]) <= HM


def test_keypoint_loss_signal():
    """Loss is positive for random logits, near zero for one-hot-correct
    logits, and zero when no roi is positive."""
    from vit_torch_tpu.detection.keypoint import (
        keypoint_loss, keypoints_to_heatmap_targets)
    rng = np.random.default_rng(0)
    R, HM, K = 4, 8, 3
    boxes = jnp.asarray([[0, 0, 32, 32]] * R, jnp.float32)
    kps = jnp.asarray(rng.uniform(2, 30, (R, K, 3)), jnp.float32)
    kps = kps.at[..., 2].set(2.0)
    weights = jnp.ones((R,))
    logits = jnp.asarray(rng.normal(0, 1, (R, HM, HM, K)), jnp.float32)
    l_rand = float(keypoint_loss(logits, boxes, kps, weights))
    assert l_rand > 1.0

    target, _ = keypoints_to_heatmap_targets(kps, boxes, HM)
    perfect = np.full((R, HM * HM, K), -20.0, np.float32)
    for r in range(R):
        for k in range(K):
            perfect[r, int(target[r, k]), k] = 20.0
    l_perfect = float(keypoint_loss(
        jnp.asarray(perfect.reshape(R, HM, HM, K)), boxes, kps, weights))
    assert l_perfect < 1e-3
    assert float(keypoint_loss(logits, boxes, kps,
                               jnp.zeros((R,)))) == 0.0


def test_keypoint_head_shapes():
    from vit_torch_tpu.detection.keypoint import KeypointHead
    head = KeypointHead(num_keypoints=5, conv_channels=(16, 16))
    x = jnp.zeros((2, 3, 14, 14, 8))
    params = head.init(jax.random.PRNGKey(0), x)["params"]
    out = head.apply({"params": params}, x)
    assert out.shape == (2, 3, 56, 56, 5)


def test_faster_rcnn_keypoint_wiring():
    """Model emits kp outputs in both modes; losses include a positive
    loss_keypoint when the kp rois coincide with the gt boxes."""
    from vit_torch_tpu.detection.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig, faster_rcnn_losses,
        _keypoint_loss_batch)
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet
    cfg = FasterRCNNConfig(
        num_classes=3, image_size=64, strides=(4, 8),
        anchor_sizes=(8.0, 16.0), num_proposals=16,
        rpn_pre_nms_topk=32, rpn_batch=16, roi_batch=8, detections=8,
        num_keypoints=5, kp_conv_channels=(8,), kp_rois=8)
    backbone = ResNet(RESNET_CONFIGS["resnet_test"], features_only=True,
                      name="backbone")
    model = FasterRCNN(cfg, backbone)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    # eval branch: keypoints on detections
    out_eval = model.apply(variables, x, deterministic=True,
                           mutable=["batch_stats"])[0]
    assert out_eval["kp_logits"].shape == (1, cfg.detections, 56, 56, 5)
    assert "detections" in out_eval
    # train branch: keypoints on top proposals
    out_train = model.apply(variables, x, deterministic=False,
                            mutable=["batch_stats"])[0]
    assert out_train["kp_logits"].shape == (1, cfg.kp_rois, 56, 56, 5)

    targets = {
        "boxes": jnp.asarray([[[8, 8, 24, 24]] * 4], jnp.float32),
        "labels": jnp.ones((1, 4), jnp.int32),
        "box_mask": jnp.asarray([[1, 0, 0, 0]], jnp.float32),
        "mask": jnp.ones((1,)),
        "keypoints": jnp.asarray(
            np.tile([[9, 9, 2], [23, 23, 2], [16, 16, 2], [9, 23, 2],
                     [23, 9, 2]], (1, 4, 1, 1)), jnp.float32),
    }
    losses = faster_rcnn_losses(out_train, targets, cfg,
                                jax.random.PRNGKey(1))
    assert "loss_keypoint" in losses
    assert np.isfinite(float(losses["loss"]))

    # force positives: kp rois == the gt box → matched at IoU 1.0
    forced = dict(out_train)
    forced["kp_boxes"] = jnp.asarray([[[8, 8, 24, 24]] * cfg.kp_rois],
                                     jnp.float32)
    kp_loss = float(jnp.sum(_keypoint_loss_batch(forced, targets)))
    assert kp_loss > 0.5


def test_hflip_keypoints():
    from vit_torch_tpu.detection.transforms import random_hflip
    S = 32
    images = jnp.zeros((4, S, S, 3))
    boxes = jnp.asarray([[[4, 8, 12, 16]]] * 4, jnp.float32)
    kps = jnp.asarray([[[[4, 8, 2], [12, 16, 2], [6, 10, 0]]]] * 4,
                      jnp.float32)
    # prob=1 → every sample flips
    _, fboxes, _, fkps = random_hflip(jax.random.PRNGKey(0), images, boxes,
                                      S, keypoints=kps, prob=1.0,
                                      kp_flip_inds=(1, 0, 2))
    np.testing.assert_allclose(np.asarray(fboxes[0, 0]), [20, 8, 28, 16])
    # swap applied after mirroring: slot 0 now holds mirrored kp1
    np.testing.assert_allclose(np.asarray(fkps[0, 0, 0]), [20, 16, 2])
    np.testing.assert_allclose(np.asarray(fkps[0, 0, 1]), [28, 8, 2])
    # visibility preserved
    assert float(fkps[0, 0, 2, 2]) == 0.0


def test_coco_kp_flip_inds():
    from vit_torch_tpu.detection.keypoint import COCO_KP_FLIP_INDS
    assert len(COCO_KP_FLIP_INDS) == 17
    # involution: applying the swap twice is identity
    inds = list(COCO_KP_FLIP_INDS)
    assert [inds[i] for i in inds] == list(range(17))


def test_kp_flip_inds_from_names():
    from vit_torch_tpu.detection.keypoint import (COCO_KP_FLIP_INDS,
                                                  kp_flip_inds_from_names)
    coco = ["nose", "left_eye", "right_eye", "left_ear", "right_ear",
            "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
            "left_wrist", "right_wrist", "left_hip", "right_hip",
            "left_knee", "right_knee", "left_ankle", "right_ankle"]
    assert kp_flip_inds_from_names(coco) == COCO_KP_FLIP_INDS
    # short corner names (synthetic 5-point schema): last-char swap
    assert kp_flip_inds_from_names(["tl", "tr", "center", "bl", "br"]) \
        == (1, 0, 2, 4, 3)
    # '_l'/'_r' suffix tokens whose base word also contains an 'l' — the
    # old substring replace mangled 'ankle_l' into 'ankre_r' and produced
    # the non-involutive (0, 0)
    assert kp_flip_inds_from_names(["ankle_l", "ankle_r"]) == (1, 0)
    assert kp_flip_inds_from_names(["elbow_l", "elbow_r", "spine"]) \
        == (1, 0, 2)
    assert kp_flip_inds_from_names(["lshoulder", "rshoulder"]) == (1, 0)
    # no mirror pairs → identity; result always an involution
    assert kp_flip_inds_from_names(["a", "b", "c"]) == (0, 1, 2)


def test_synthetic_keypoint_dataset(tmp_path):
    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, make_synthetic_coco)
    img_dir, ann_file = make_synthetic_coco(str(tmp_path), n_images=4,
                                            size=64, keypoints=True)
    ds = CocoDetectionDataset(img_dir, ann_file, image_size=64, max_boxes=8,
                              load_keypoints=True)
    assert ds.num_keypoints == 5
    sample = ds[0]
    kp = sample["gt_keypoints"]
    assert kp.shape == (8, 5, 3)
    n_valid = int(sample["box_mask"].sum())
    # visible keypoints lie inside their boxes
    for i in range(n_valid):
        x1, y1, x2, y2 = sample["boxes"][i]
        assert ((kp[i, :, 0] >= x1 - 1) & (kp[i, :, 0] <= x2 + 1)).all()
        assert ((kp[i, :, 1] >= y1 - 1) & (kp[i, :, 1] <= y2 + 1)).all()
        assert (kp[i, :, 2] == 2).all()


@pytest.mark.slow
def test_cli_keypoint_smoke(tmp_path):
    from vit_torch_tpu.cli import coco as coco_cli
    record = coco_cli.main([
        "--test", "--head", "faster_rcnn", "--keypoints", "--epochs", "1",
        "--no_initial_eval", "--device", "cpu",
        "--stats_fp", str(tmp_path / "stats.json")])
    assert record["telem"]["completed"]
    val = record["logs"][-1]["val"]
    assert "keypoints" in val
    assert "ap" in val["keypoints"]
