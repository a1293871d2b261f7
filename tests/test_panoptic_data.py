"""CocoPanopticDataset: panoptic-PNG loading (reference
``object_detr/datasets/coco_panoptic.py`` parity)."""

import json
import os

import numpy as np
import pytest


def _write_panoptic(tmp_path, size=64):
    """Two images; each PNG encodes two rectangular segments."""
    from PIL import Image
    from vit_torch_tpu.detection.panoptic_data import id2rgb
    img_dir = tmp_path / "images"
    ann_dir = tmp_path / "panoptic"
    img_dir.mkdir()
    ann_dir.mkdir()
    images, annotations = [], []
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 80, (size, size, 3)).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"{i:06d}.jpg")
        ids = np.zeros((size, size), np.int32)
        segs = []
        for j, (sid, cat) in enumerate([(1000 + i, 1), (2000 + i, 2)]):
            x, y = 8 + 24 * j, 8 + 16 * j
            ids[y:y + 12, x:x + 16] = sid
            segs.append({"id": sid, "category_id": cat, "iscrowd": j,
                         "area": 12 * 16})
        Image.fromarray(id2rgb(ids)).save(ann_dir / f"{i:06d}.png")
        images.append({"id": i + 1, "file_name": f"{i:06d}.jpg",
                       "height": size, "width": size})
        annotations.append({"image_id": i + 1, "file_name": f"{i:06d}.png",
                            "segments_info": segs})
    ann_file = tmp_path / "panoptic.json"
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [
                       {"id": 1, "name": "thing", "isthing": 1},
                       {"id": 2, "name": "stuff", "isthing": 0}]}, f)
    return str(img_dir), str(ann_dir), str(ann_file)


def test_rgb_id_roundtrip():
    from vit_torch_tpu.detection.panoptic_data import id2rgb, rgb2id
    ids = np.asarray([[0, 1, 255], [256, 70000, 16777215]], np.int32)
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def test_masks_to_boxes():
    from vit_torch_tpu.detection.panoptic_data import masks_to_boxes
    m = np.zeros((2, 16, 16), np.uint8)
    m[0, 3:7, 2:10] = 1
    boxes = masks_to_boxes(m)
    np.testing.assert_array_equal(boxes[0], [2, 3, 10, 7])
    np.testing.assert_array_equal(boxes[1], [0, 0, 0, 0])


def test_panoptic_dataset_loads(tmp_path):
    from vit_torch_tpu.detection.panoptic_data import CocoPanopticDataset
    img_dir, ann_dir, ann_file = _write_panoptic(tmp_path)
    ds = CocoPanopticDataset(img_dir, ann_dir, ann_file, image_size=64,
                             max_boxes=8)
    assert len(ds) == 2 and ds.num_classes == 2
    s = ds[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["gt_masks"].shape == (8, 64, 64)
    assert s["box_mask"].sum() == 2
    # segment 1: rect at (8, 8) 16x12, category 1 -> label 1
    np.testing.assert_array_equal(s["boxes"][0], [8, 8, 24, 20])
    assert s["labels"][0] == 1 and s["labels"][1] == 2
    assert s["gt_masks"][0].sum() == 12 * 16
    # masks are cut from the id map: disjoint segments
    assert (s["gt_masks"][0] * s["gt_masks"][1]).sum() == 0


def test_panoptic_dataset_things_only_and_pq_gt(tmp_path):
    from vit_torch_tpu.detection.panoptic_data import CocoPanopticDataset
    img_dir, ann_dir, ann_file = _write_panoptic(tmp_path)
    ds = CocoPanopticDataset(img_dir, ann_dir, ann_file, image_size=64,
                             max_boxes=8, things_only=True)
    assert ds.num_classes == 1
    s = ds[0]
    assert s["box_mask"].sum() == 1          # stuff segment filtered
    gt_map, segments, crowd = ds.pq_ground_truth(1)
    assert gt_map.shape == (64, 64)
    assert segments == {1000: 1, 2000: 2}
    assert crowd == {2000}


def test_panoptic_dataset_batches_through_loader(tmp_path):
    from vit_torch_tpu.detection.coco_data import CocoLoader
    from vit_torch_tpu.detection.panoptic_data import CocoPanopticDataset
    img_dir, ann_dir, ann_file = _write_panoptic(tmp_path)
    ds = CocoPanopticDataset(img_dir, ann_dir, ann_file, image_size=64,
                             max_boxes=8)
    batch = next(iter(CocoLoader(ds, 2)))
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["gt_masks"].shape == (2, 8, 64, 64)
    assert batch["mask"].tolist() == [1.0, 1.0]
