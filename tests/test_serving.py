"""Serving export bundles (``serving/export.py`` + ``cli/export.py``):
export → serialize → deserialize → predict must reproduce the live
forward, bucketing must pad/chunk correctly, and the CLI must emit a
loadable bundle."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.models import VisionModelZoo
from vit_torch_tpu.serving import export_classifier, load_bundle, save_bundle


@pytest.fixture(scope="module")
def tiny():
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    return zm, variables


def test_export_roundtrip_matches_live_forward(tiny, tmp_path):
    zm, variables = tiny
    exported = export_classifier(zm, variables, image_size=32,
                                 batch_sizes=[2, 4],
                                 norm={"mean": (0.5, 0.5, 0.5),
                                       "std": (0.25, 0.25, 0.25)})
    save_bundle(str(tmp_path), exported)
    assert sorted(os.listdir(tmp_path)) == [
        "fwd_bs2.stablehlo", "fwd_bs4.stablehlo", "manifest.json"]

    model = load_bundle(str(tmp_path))
    assert model.batch_sizes == (2, 4)
    assert model.manifest["num_classes"] == 10
    assert model.manifest["arch"] == "vit_tiny_test"

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    got = model.predict(images)
    mean = jnp.asarray([0.5] * 3, jnp.float32)
    std = jnp.asarray([0.25] * 3, jnp.float32)
    x = (jnp.asarray(images, jnp.float32) / 255.0 - mean) / std
    ref = np.asarray(zm.model.apply(variables, x, True), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_predict_bucketing(tiny, tmp_path):
    """Odd batch sizes pad up to a bucket; oversize batches chunk through
    the largest bucket — results must match per-image inference."""
    zm, variables = tiny
    exported = export_classifier(zm, variables, image_size=32,
                                 batch_sizes=[2, 4])
    save_bundle(str(tmp_path), exported)
    model = load_bundle(str(tmp_path))
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (7, 32, 32, 3), dtype=np.uint8)
    got = model.predict(images)              # 7 = chunk(4) + pad(3→4)
    assert got.shape == (7, 10)
    x = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(zm.model.apply(variables, x, True), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
    with pytest.raises(ValueError):
        model.predict(images[0])             # not NHWC
    with pytest.raises(ValueError, match="exported for 32x32"):
        model.predict(np.zeros((2, 48, 48, 3), np.uint8))   # wrong size


def test_w8a8_export_bakes_quant_path(tiny, tmp_path, monkeypatch):
    zm, variables = tiny
    monkeypatch.setenv("VITX_W8A8", "1")
    exported = export_classifier(zm, variables, image_size=32,
                                 batch_sizes=[2])
    assert exported["manifest"]["w8a8"] is True
    save_bundle(str(tmp_path), exported)
    monkeypatch.setenv("VITX_W8A8", "")      # artifact must not care
    model = load_bundle(str(tmp_path))
    rng = np.random.default_rng(2)
    images = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    got = model.predict(images)
    x = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(zm.model.apply(variables, x, True), np.float32)
    # int8 path: close but not bit-equal
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert 0 < rel < 0.05, rel
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_w8a8_prequant_bakes_int8_constants(tiny, tmp_path, monkeypatch):
    """Under VITX_W8A8=1 the default export prequantizes host-side: the
    artifact bakes int8 weights + scales instead of fp32 kernels + an
    in-graph quantize sweep — smaller AND numerically identical to the
    dynamic-quantize export (same (w_q, scale) by construction)."""
    zm, variables = tiny
    monkeypatch.setenv("VITX_W8A8", "1")
    pre = export_classifier(zm, variables, image_size=32, batch_sizes=[2])
    dyn = export_classifier(zm, variables, image_size=32, batch_sizes=[2],
                            prequant=False)
    assert pre["manifest"]["w8a8_prequant"] is True
    assert dyn["manifest"]["w8a8_prequant"] is False
    nb_pre = len(pre["exports"][2].serialize())
    nb_dyn = len(dyn["exports"][2].serialize())
    assert nb_pre < 0.6 * nb_dyn, (nb_pre, nb_dyn)

    save_bundle(str(tmp_path), pre)
    monkeypatch.setenv("VITX_W8A8", "")      # artifact must not care
    served = load_bundle(str(tmp_path))
    rng = np.random.default_rng(5)
    images = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    got = served.predict(images)
    ref = np.asarray(dyn["exports"][2].call(jnp.asarray(images)), np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_w8a8_prequant_detector(tmp_path, monkeypatch):
    """Detection bundles prequantize the QDense weights (DETR transformer)
    the same way and still match the live dynamic-w8a8 predict."""
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    from vit_torch_tpu.serving import export_detector

    size = 32
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                     num_heads=4, enc_layers=1, dec_layers=1, ffn_dim=64)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), True)["params"]
    tr = DetectionTrainer(model, params, image_size=size, num_classes=3,
                          lr=1e-4, augment=False)
    monkeypatch.setenv("VITX_W8A8", "1")
    exported = export_detector(tr, image_size=size, batch_sizes=[2])
    assert exported["manifest"]["w8a8_prequant"] is True
    save_bundle(str(tmp_path), exported)
    batch = {
        "image": np.random.default_rng(6).integers(
            0, 255, (2, size, size, 3), dtype=np.uint8),
        "scale": np.ones((2,), np.float32),
        "pad": np.zeros((2, 2), np.float32),
    }
    live = jax.device_get(tr._predict(tr.params, batch))  # dynamic w8a8
    monkeypatch.setenv("VITX_W8A8", "")
    served = load_bundle(str(tmp_path))
    out = served.predict_tree(batch)
    for k in live:
        np.testing.assert_allclose(out[k], live[k], atol=1e-5, rtol=1e-4)


def test_param_dtype_bf16_halves_artifact(tiny, tmp_path):
    zm, variables = tiny
    full = export_classifier(zm, variables, image_size=32, batch_sizes=[2])
    half = export_classifier(zm, variables, image_size=32, batch_sizes=[2],
                             param_dtype="bfloat16")
    assert half["manifest"]["param_dtype"] == "bfloat16"
    b_full = len(full["exports"][2].serialize())
    b_half = len(half["exports"][2].serialize())
    assert b_half < 0.65 * b_full, (b_half, b_full)
    save_bundle(str(tmp_path), half)
    model = load_bundle(str(tmp_path))
    rng = np.random.default_rng(5)
    images = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    got = model.predict(images)
    ref = np.asarray(full["exports"][2].call(jnp.asarray(images)))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    assert (got.argmax(-1) == ref.argmax(-1)).all()


def test_multi_platform_export(tiny, tmp_path):
    """platforms=['cpu','tpu'] emits one artifact deployable on either
    backend (lowered from a CPU host — no TPU needed to export).  NB: the
    compute graph is the trace-time dispatch (plain XLA attention when
    traced on CPU), so TPU-kernel-optimal artifacts should be exported
    on-device."""
    zm, variables = tiny
    exported = export_classifier(zm, variables, image_size=32,
                                 batch_sizes=[2], platforms=["cpu", "tpu"])
    assert exported["manifest"]["platforms"] == ["cpu", "tpu"]
    save_bundle(str(tmp_path), exported)
    model = load_bundle(str(tmp_path))
    logits = model.predict(np.zeros((2, 32, 32, 3), np.uint8))
    assert logits.shape == (2, 10) and np.isfinite(logits).all()


def test_predict_rejects_float_images(tiny, tmp_path):
    """Pre-scaled float inputs get the friendly-error layer, not a deep
    jax.export aval mismatch."""
    zm, variables = tiny
    exported = export_classifier(zm, variables, image_size=32,
                                 batch_sizes=[2])
    save_bundle(str(tmp_path), exported)
    model = load_bundle(str(tmp_path))
    with pytest.raises(ValueError, match="uint8"):
        model.predict(np.zeros((2, 32, 32, 3), np.float32))


def test_multi_device_export(tiny, tmp_path):
    """num_devices=2 exports a data-parallel bundle (batch sharded over a
    2-device mesh, params replicated); loading commits inputs to a
    matching mesh and results equal the single-device export."""
    zm, variables = tiny
    sharded = export_classifier(zm, variables, image_size=32,
                                batch_sizes=[4], num_devices=2)
    assert sharded["manifest"]["num_devices"] == 2
    assert sharded["exports"][4].nr_devices == 2
    save_bundle(str(tmp_path), sharded)
    served = load_bundle(str(tmp_path))

    rng = np.random.default_rng(9)
    images = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    got = served.predict(images)          # 3 pads up to the 4-bucket
    single = export_classifier(zm, variables, image_size=32,
                               batch_sizes=[4])
    ref = np.asarray(single["exports"][4].call(
        jnp.asarray(np.concatenate(
            [images, np.zeros((1, 32, 32, 3), np.uint8)]))))[:3]
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        export_classifier(zm, variables, image_size=32,
                          batch_sizes=[3], num_devices=2)


def test_export_detector_roundtrip(tmp_path):
    """DETR predict program exports and serves: pytree batch in, dict of
    scores/labels/boxes out, matching the live trainer predict."""
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    from vit_torch_tpu.serving import export_detector

    size = 32
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                     num_heads=4, enc_layers=1, dec_layers=1, ffn_dim=64)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), True)["params"]
    tr = DetectionTrainer(model, params, image_size=size, num_classes=3,
                          lr=1e-4, augment=False)
    exported = export_detector(tr, image_size=size, batch_sizes=[2])
    assert exported["manifest"]["format"].startswith(
        "vit_torch_tpu.serving.detection")
    save_bundle(str(tmp_path), exported)
    served = load_bundle(str(tmp_path))

    rng = np.random.default_rng(3)
    batch = {
        "image": rng.integers(0, 255, (3, size, size, 3), dtype=np.uint8),
        "scale": np.full((3,), 0.5, np.float32),
        "pad": np.zeros((3, 2), np.float32),
    }
    out = served.predict_tree(batch)    # 3 → chunk(2) + pad(1→2)
    assert set(out) == {"scores", "labels", "boxes"}
    assert out["boxes"].shape == (3, 8, 4)
    live = jax.device_get(tr._predict(
        tr.params, jax.tree.map(lambda a: a[:2], batch)))
    np.testing.assert_allclose(out["boxes"][:2], live["boxes"],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(out["scores"][:2], live["scores"],
                               atol=1e-5, rtol=1e-4)


def test_export_detector_with_masks(tmp_path):
    """--masks bundles carry the bit-packed mask output end-to-end."""
    from vit_torch_tpu.detection.detr import DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.detection.segmentation import DETRSegm
    from vit_torch_tpu.models.swin import SwinConfig, SwinTransformer
    from vit_torch_tpu.serving import export_detector, letterbox_images

    size = 32
    scfg = SwinConfig(embed_dim=16, depths=(1, 1, 1), num_heads=(2, 2, 4),
                      window_size=4, drop_path_rate=0.0)
    backbone = SwinTransformer(scfg, dtype=jnp.float32, multi_features=True,
                               name="backbone")
    dcfg = DETRConfig(num_classes=3, num_queries=6, hidden_dim=32,
                      enc_layers=1, dec_layers=1, ffn_dim=64)
    model = DETRSegm(dcfg, backbone, num_mask_heads=4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), True)["params"]
    tr = DetectionTrainer(model, params, image_size=size, num_classes=3,
                          lr=1e-4, masks=True, augment=False)
    exported = export_detector(tr, image_size=size, batch_sizes=[2])
    save_bundle(str(tmp_path), exported)
    served = load_bundle(str(tmp_path))
    rng = np.random.default_rng(7)
    batch = letterbox_images(
        [rng.integers(0, 255, (24, 40, 3), dtype=np.uint8),
         rng.integers(0, 255, (50, 18, 3), dtype=np.uint8)], size)
    out = served.predict_tree(batch)
    assert "masks_packed" in out
    assert out["masks_packed"].dtype == np.uint8
    assert out["masks_packed"].shape[:2] == (2, 6)
    assert out["boxes"].shape == (2, 6, 4)


def test_export_detector_frcnn(tmp_path):
    """FasterRCNN predict (incl. baked BatchNorm state) exports/serves."""
    from vit_torch_tpu.detection.engine import FasterRCNNTrainer
    from vit_torch_tpu.detection.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig)
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    from vit_torch_tpu.serving import export_detector

    size = 64
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               multi_features=True, name="backbone")
    n_stages = len(SWIN_CONFIGS["swin_test"].depths)
    cfg = FasterRCNNConfig(
        num_classes=3, image_size=size,
        strides=tuple(4 * 2 ** i for i in range(n_stages)),
        anchor_sizes=tuple(8.0 * 2 ** i for i in range(n_stages)),
        num_proposals=32, rpn_pre_nms_topk=64,
        rpn_batch=32, roi_batch=16, detections=10)
    model = FasterRCNN(cfg, backbone, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), deterministic=True)
    tr = FasterRCNNTrainer(model, variables["params"], cfg=cfg, lr=0.01,
                           augment=False)
    tr.model_state = {k: v for k, v in variables.items() if k != "params"}
    exported = export_detector(tr, image_size=size, batch_sizes=[2])
    save_bundle(str(tmp_path), exported)
    served = load_bundle(str(tmp_path))
    rng = np.random.default_rng(4)
    batch = {
        "image": rng.integers(0, 255, (2, size, size, 3), dtype=np.uint8),
        "scale": np.ones((2,), np.float32),
        "pad": np.zeros((2, 2), np.float32),
    }
    out = served.predict_tree(batch)
    live = jax.device_get(tr._predict(tr.params, batch))
    assert set(out) == set(live)
    for k in live:
        np.testing.assert_allclose(out[k], live[k], atol=1e-4, rtol=1e-4)


def test_multi_device_detector_export(tmp_path):
    """Detection bundles shard the batch pytree leaf-wise over the mesh."""
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    from vit_torch_tpu.serving import export_detector

    size = 32
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                     num_heads=4, enc_layers=1, dec_layers=1, ffn_dim=64)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), True)["params"]
    tr = DetectionTrainer(model, params, image_size=size, num_classes=3,
                          lr=1e-4, augment=False)
    exported = export_detector(tr, image_size=size, batch_sizes=[2],
                               num_devices=2)
    assert exported["manifest"]["num_devices"] == 2
    save_bundle(str(tmp_path), exported)
    served = load_bundle(str(tmp_path))
    batch = {
        "image": np.random.default_rng(8).integers(
            0, 255, (2, size, size, 3), dtype=np.uint8),
        "scale": np.ones((2,), np.float32),
        "pad": np.zeros((2, 2), np.float32),
    }
    out = served.predict_tree(batch)
    live = jax.device_get(tr._predict(tr.params, batch))
    for k in live:
        np.testing.assert_allclose(out[k], live[k], atol=1e-4, rtol=1e-4)


def test_export_detector_keypoints(tmp_path):
    """Keypoint R-CNN bundles carry decoded keypoints end-to-end."""
    from vit_torch_tpu.detection.engine import FasterRCNNTrainer
    from vit_torch_tpu.detection.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig)
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet
    from vit_torch_tpu.serving import export_detector

    size = 64
    cfg = FasterRCNNConfig(
        num_classes=3, image_size=size, strides=(4, 8),
        anchor_sizes=(8.0, 16.0), num_proposals=16,
        rpn_pre_nms_topk=32, rpn_batch=16, roi_batch=8, detections=8,
        num_keypoints=5, kp_conv_channels=(8,), kp_rois=8)
    # fp32 like the DETR export tests: bf16 convs round differently between
    # a constant-baked bundle and the live jit (XLA prepacks constant
    # weights), and an untrained model's NMS/soft-argmax ties amplify the
    # 1-ulp drift into pixel-scale keypoint differences
    backbone = ResNet(RESNET_CONFIGS["resnet_test"], features_only=True,
                      dtype=jnp.float32, name="backbone")
    model = FasterRCNN(cfg, backbone)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)),
                           deterministic=True)
    tr = FasterRCNNTrainer(model, variables["params"], cfg=cfg, lr=0.01,
                           augment=False)
    tr.model_state = {k: v for k, v in variables.items() if k != "params"}
    exported = export_detector(tr, image_size=size, batch_sizes=[2])
    save_bundle(str(tmp_path), exported)
    served = load_bundle(str(tmp_path))
    batch = {
        "image": np.random.default_rng(5).integers(
            0, 255, (2, size, size, 3), dtype=np.uint8),
        "scale": np.ones((2,), np.float32),
        "pad": np.zeros((2, 2), np.float32),
    }
    out = served.predict_tree(batch)
    assert "keypoints" in out
    assert out["keypoints"].shape == (2, cfg.detections, 5, 3)
    live = jax.device_get(tr._predict(tr.params, batch))
    np.testing.assert_allclose(out["keypoints"], live["keypoints"],
                               atol=1e-4, rtol=1e-4)


def test_letterbox_images_matches_training_loader():
    """Serving-side letterbox must reproduce the training loader's
    geometry bit-for-bit (same letterbox_params, pad value, resize)."""
    from PIL import Image
    from vit_torch_tpu.detection.coco_data import letterbox_params
    from vit_torch_tpu.serving import letterbox_images
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (37, 81, 3), dtype=np.uint8)
    S = 64
    batch = letterbox_images([img, img[:20, :20]], S)
    assert batch["image"].shape == (2, S, S, 3)
    scale, pad_x, pad_y, nh, nw = letterbox_params(37, 81, S)
    assert batch["scale"][0] == np.float32(scale)
    assert tuple(batch["pad"][0]) == (pad_x, pad_y)
    resized = np.asarray(Image.fromarray(img).resize((nw, nh),
                                                     Image.BILINEAR))
    np.testing.assert_array_equal(
        batch["image"][0, pad_y:pad_y + nh, pad_x:pad_x + nw], resized)
    # padding value matches the loader's 114-gray canvas
    assert batch["image"][0, 0, 0, 0] == 114


def test_export_cli(tmp_path):
    from vit_torch_tpu.cli.export import main
    out = str(tmp_path / "bundle")
    main(["--arch", "vit_tiny_test", "--classifier", "10",
          "--image_size", "32", "--bs", "2", "--dataset", "cifar10",
          "--device", "cpu", "--out", out])
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["batch_sizes"] == [2]
    assert manifest["norm"]["mean"][0] == pytest.approx(0.4914, abs=1e-3)
    model = load_bundle(out)
    logits = model.predict(np.zeros((2, 32, 32, 3), np.uint8))
    assert logits.shape == (2, 10) and np.isfinite(logits).all()
