"""Tests for the DETR segmentation head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.detection.detr import DETRConfig
from vit_torch_tpu.detection.segmentation import (
    DETRSegm, MHAttentionMap, dice_loss, mask_losses, postprocess_segm,
    sigmoid_focal_loss,
)
from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinConfig, SwinTransformer


def test_dice_loss_extremes():
    perfect = jnp.full((1, 4, 4), 20.0)       # sigmoid ~1
    target = jnp.ones((1, 4, 4))
    valid = jnp.ones(1)
    assert float(dice_loss(perfect, target, valid)) < 0.01
    wrong = jnp.full((1, 4, 4), -20.0)
    assert float(dice_loss(wrong, target, valid)) > 0.9
    # invalid entries contribute nothing
    assert float(dice_loss(wrong, target, jnp.zeros(1))) == 0.0


def test_focal_loss_downweights_easy():
    target = jnp.ones((1, 4, 4))
    valid = jnp.ones(1)
    easy = float(sigmoid_focal_loss(jnp.full((1, 4, 4), 5.0), target, valid))
    hard = float(sigmoid_focal_loss(jnp.full((1, 4, 4), -5.0), target, valid))
    assert easy < hard / 100


def test_mha_attention_map_shapes():
    m = MHAttentionMap(hidden_dim=32, num_heads=4, dtype=jnp.float32)
    q = jnp.zeros((2, 5, 32))
    mem = jnp.zeros((2, 8, 8, 32))
    variables = m.init(jax.random.PRNGKey(0), q, mem)
    out = m.apply(variables, q, mem)
    assert out.shape == (2, 5, 4, 8, 8)
    # reference MHAttentionMap: softmax JOINTLY over heads x H x W (the
    # flatten(2) softmax) — per query the total weight across all heads
    # and positions sums to 1, not per head
    np.testing.assert_allclose(np.asarray(out.sum(axis=(-1, -2, -3))), 1.0,
                               atol=1e-5)


def _segm_model():
    cfg = SwinConfig(embed_dim=16, depths=(1, 1, 1), num_heads=(2, 2, 4),
                     window_size=4, drop_path_rate=0.0)
    backbone = SwinTransformer(cfg, dtype=jnp.float32, multi_features=True,
                               name="backbone")
    dcfg = DETRConfig(num_classes=3, num_queries=6, hidden_dim=32,
                      enc_layers=1, dec_layers=1, ffn_dim=64)
    return DETRSegm(dcfg, backbone, num_mask_heads=4, dtype=jnp.float32)


def test_detr_segm_forward():
    model = _segm_model()
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    out = model.apply(variables, x, True)
    assert out["pred_logits"].shape == (2, 6, 4)
    assert out["pred_boxes"].shape == (2, 6, 4)
    # mask head upsamples through 2 FPN laterals: stride 16 -> 4
    assert out["pred_masks"].shape == (2, 6, 8, 8)
    # detection params are a subset layout-compatible with plain DETR
    assert "encoder_0" in variables["params"]
    assert "mask_head" in variables["params"]
    assert "bbox_attention" in variables["params"]


def test_mask_losses_matched_only():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(0, 1, (2, 4, 8, 8)), jnp.float32)
    gt = jnp.asarray(rng.integers(0, 2, (2, 3, 16, 16)), jnp.float32)
    assign = jnp.asarray([[0, -1, 2, -1], [-1, -1, -1, -1]])
    out = mask_losses(pred, gt, assign, jnp.ones((2, 3)), jnp.ones(2))
    assert np.isfinite(float(out["loss_mask"]))
    assert np.isfinite(float(out["loss_dice"]))
    # nothing matched in image 2 -> identical result if its preds change
    pred2 = pred.at[1].set(99.0)
    out2 = mask_losses(pred2, gt, assign, jnp.ones((2, 3)), jnp.ones(2))
    np.testing.assert_allclose(float(out["loss_mask"]),
                               float(out2["loss_mask"]), rtol=1e-6)


def test_postprocess_segm():
    masks = jnp.zeros((1, 2, 4, 4)).at[0, 0, :2].set(10.0)
    out = postprocess_segm(masks, image_size=16)
    assert out.shape == (1, 2, 16, 16)
    assert bool(out[0, 0, 0, 0]) and not bool(out[0, 1, 8, 8])


def test_pack_mask_bits_roundtrip():
    """Device bit-packing inverts exactly through np.unpackbits (the host
    side of the packed-mask D2H path in evaluate)."""
    from vit_torch_tpu.detection.segmentation import pack_mask_bits
    rng = np.random.default_rng(0)
    masks = rng.integers(0, 2, (2, 3, 8, 16)).astype(bool)
    packed = np.asarray(pack_mask_bits(jnp.asarray(masks)))
    assert packed.shape == (2, 3, 8, 2) and packed.dtype == np.uint8
    np.testing.assert_array_equal(np.unpackbits(packed, axis=-1),
                                  masks.astype(np.uint8))
    # non-multiple-of-8 width: zero-padded to the byte boundary, the
    # unpacker slices back (a free-integer --image_size must not crash)
    odd = rng.integers(0, 2, (2, 10, 10)).astype(bool)
    packed = np.asarray(pack_mask_bits(jnp.asarray(odd)))
    assert packed.shape == (2, 10, 2)
    np.testing.assert_array_equal(
        np.unpackbits(packed, axis=-1)[..., :10], odd.astype(np.uint8))


def test_dataset_loads_masks(tmp_path):
    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, make_synthetic_coco)
    img_dir, ann_file = make_synthetic_coco(str(tmp_path), n_images=2, size=32)
    ds = CocoDetectionDataset(img_dir, ann_file, image_size=32, max_boxes=8,
                              load_masks=True)
    s = ds[0]
    assert s["gt_masks"].shape == (8, 32, 32)
    n_valid = int(s["box_mask"].sum())
    for i in range(n_valid):
        x0, y0, x1, y1 = s["boxes"][i].astype(int)
        assert s["gt_masks"][i].sum() > 0
        # mask lives inside (slightly dilated) box
        ys, xs = np.nonzero(s["gt_masks"][i])
        assert xs.min() >= x0 - 1 and xs.max() <= x1 + 1
        assert ys.min() >= y0 - 1 and ys.max() <= y1 + 1


def test_unletterbox_masks_roundtrip():
    from vit_torch_tpu.detection.coco_data import letterbox_params
    from vit_torch_tpu.detection.engine import _unletterbox_masks
    h, w, S = 20, 40, 64
    scale, px, py, nh, nw = letterbox_params(h, w, S)
    # a mask occupying the letterboxed copy of rows 5-15, cols 10-30
    m = np.zeros((1, S, S), np.uint8)
    m[0, py + int(5 * scale):py + int(15 * scale),
      px + int(10 * scale):px + int(30 * scale)] = 1
    out = _unletterbox_masks(m, scale, np.asarray([px, py]),
                             np.asarray([h, w]))
    assert out.shape == (1, h, w)
    want = np.zeros((h, w), np.uint8)
    want[5:15, 10:30] = 1
    inter = np.logical_and(out[0], want).sum()
    union = np.logical_or(out[0], want).sum()
    assert inter / union > 0.8


def test_masks_cli_reports_segm_and_pq(tmp_path):
    """--test --masks must score segm AP and PQ (reference
    object/engine.py:58-67 + object_detr/datasets/panoptic_eval.py)."""
    from vit_torch_tpu.cli.coco import main
    fp = str(tmp_path / "stats.json")
    record = main(["--test", "--masks", "--epochs", "1",
                   "--no_initial_eval", "--stats_fp", fp])
    val = record["logs"][0]["val"]
    assert "segm" in val and "ap" in val["segm"]
    assert "panoptic" in val
    for k in ("pq", "sq", "rq"):
        assert np.isfinite(val["panoptic"][k])


def test_pq_update_perfect_prediction():
    from vit_torch_tpu.detection.coco_eval import COCO
    from vit_torch_tpu.detection.engine import _pq_update
    from vit_torch_tpu.detection.panoptic_eval import PQStat
    gt = COCO(dataset={
        "images": [{"id": 1, "height": 32, "width": 32}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [4, 4, 10, 10], "area": 100, "iscrowd": 0,
             "segmentation": [[4, 4, 14, 4, 14, 14, 4, 14]]},
        ],
        "categories": [{"id": 1, "name": "a"}],
    })
    masks = np.zeros((1, 32, 32), np.uint8)
    masks[0, 4:15, 4:15] = 1
    pq = PQStat()
    _pq_update(pq, gt, 1, {"masks": masks, "labels": np.asarray([1]),
                           "scores": np.asarray([0.9])})
    out = pq.summarize()
    assert out["pq"] > 0.9 and out["rq"] == 1.0


# ---------------------------------------------------------------------------
# run-length-domain segm eval (device mask_col_runs + host rle_from_col_runs)
# ---------------------------------------------------------------------------

def _blob_masks(n, S, seed=0, holes=False):
    """Binary masks with a few rectangles/ellipses (COCO-ish topology)."""
    rng = np.random.default_rng(seed)
    masks = np.zeros((n, S, S), bool)
    for i in range(n):
        for _ in range(rng.integers(1, 4)):
            y0, x0 = rng.integers(0, S - 4, 2)
            hh, ww = rng.integers(3, S // 2, 2)
            masks[i, y0:y0 + hh, x0:x0 + ww] = True
        if holes:
            y0, x0 = rng.integers(S // 4, S // 2, 2)
            masks[i, y0:y0 + 5, x0:x0 + 5] = False
    return masks


def test_mask_col_runs_matches_numpy_flips():
    from vit_torch_tpu.detection.segmentation import mask_col_runs
    S = 64
    masks = _blob_masks(4, S, seed=3, holes=True)
    runs, counts = jax.jit(lambda m: mask_col_runs(m, 8))(
        jnp.asarray(masks))
    runs, counts = np.asarray(runs), np.asarray(counts)
    for i in range(masks.shape[0]):
        for c in range(S):
            col = masks[i, :, c].astype(np.int8)
            flips = np.flatnonzero(np.diff(np.concatenate([[0], col])))
            assert counts[i, c] == len(flips)
            if len(flips) <= 8:
                np.testing.assert_array_equal(runs[i, c, :len(flips)],
                                              flips)
                assert (runs[i, c, len(flips):] == S).all()


@pytest.mark.parametrize("orig,scale,pad", [
    ((64, 64), 1.0, (0, 0)),           # identity
    ((128, 96), 0.5, (8, 0)),          # downscaled, x-padded
    ((50, 70), 0.9, (0, 9)),           # non-integer ratio
    ((200, 40), 0.3, (26, 2)),         # strong downscale, both pads
    ((30, 20), 2.0, (12, 2)),          # upscale (orig smaller than box)
])
def test_rle_from_col_runs_matches_pixel_path(orig, scale, pad):
    """runs-domain RLE == rle_encode(_unletterbox_masks(mask)) exactly,
    native and numpy fallbacks both."""
    from vit_torch_tpu.detection import _mask
    from vit_torch_tpu.detection.engine import _unletterbox_masks
    from vit_torch_tpu.detection.segmentation import mask_col_runs
    S = 64
    masks = _blob_masks(6, S, seed=11, holes=True)
    runs, counts = jax.jit(lambda m: mask_col_runs(m, 24))(
        jnp.asarray(masks))
    runs, counts = np.asarray(runs), np.asarray(counts)
    pixel = _unletterbox_masks(masks.astype(np.uint8), scale,
                               np.asarray(pad), np.asarray(orig))
    for i in range(masks.shape[0]):
        want = _mask.encode(pixel[i])
        got = _mask.rle_from_col_runs(runs[i], counts[i], scale=scale,
                                      pad=pad, orig_size=orig)
        assert got is not None
        assert got["size"] == want["size"]
        assert list(got["counts"]) == list(want["counts"]), (i, orig, scale)
        # numpy fallback path must agree bit-for-bit too
        orig_lib = _mask._LIB
        _mask._LIB = None
        try:
            import unittest.mock as mock
            with mock.patch.object(_mask, "_load_lib", lambda: None):
                got2 = _mask.rle_from_col_runs(
                    runs[i], counts[i], scale=scale, pad=pad,
                    orig_size=orig)
        finally:
            _mask._LIB = orig_lib
        assert list(got2["counts"]) == list(want["counts"])


def test_rle_from_col_runs_overflow_returns_none():
    from vit_torch_tpu.detection import _mask
    from vit_torch_tpu.detection.segmentation import mask_col_runs
    S = 32
    checker = np.indices((S, S)).sum(0) % 2 == 0     # S flips per column
    runs, counts = mask_col_runs(jnp.asarray(checker[None]), 8)
    assert int(np.asarray(counts).max()) > 8
    got = _mask.rle_from_col_runs(np.asarray(runs)[0],
                                  np.asarray(counts)[0], scale=1.0,
                                  pad=(0, 0), orig_size=(S, S))
    assert got is None


@pytest.mark.parametrize("orig,scale,pad", [
    ((64, 64), 1.0, (0, 0)),
    ((128, 96), 0.5, (8, 0)),
    ((50, 70), 0.9, (0, 9)),
    ((30, 20), 2.0, (12, 2)),
])
def test_rle_from_packed_cols_matches_pixel_path(orig, scale, pad):
    """Column-packed path (the shipped segm-eval hot path) == the pixel
    chain exactly — native and numpy fallback; includes a checkerboard
    (worst-case flips, no cap in this design)."""
    from vit_torch_tpu.detection import _mask
    from vit_torch_tpu.detection.engine import _unletterbox_masks
    from vit_torch_tpu.detection.segmentation import pack_mask_bits
    S = 64
    masks = _blob_masks(4, S, seed=21, holes=True)
    masks[3] = np.indices((S, S)).sum(0) % 2 == 0       # checkerboard
    pk = np.asarray(pack_mask_bits(
        jnp.swapaxes(jnp.asarray(masks), -1, -2)))
    pixel = _unletterbox_masks(masks.astype(np.uint8), scale,
                               np.asarray(pad), np.asarray(orig))
    for i in range(masks.shape[0]):
        want = _mask.encode(pixel[i])
        got = _mask.rle_from_packed_cols(pk[i], S, scale=scale, pad=pad,
                                         orig_size=orig)
        assert got["size"] == want["size"]
        assert list(got["counts"]) == list(want["counts"]), (i, orig)
        import unittest.mock as mock
        with mock.patch.object(_mask, "_load_lib", lambda: None):
            got2 = _mask.rle_from_packed_cols(pk[i], S, scale=scale,
                                              pad=pad, orig_size=orig)
        assert list(got2["counts"]) == list(want["counts"])
