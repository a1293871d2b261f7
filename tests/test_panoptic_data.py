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


def test_panoptic_instance_gt_view(tmp_path):
    """instance_gt() produces a COCO container the evaluators accept:
    RLE segmentations decode back to the segment masks, xywh boxes match."""
    from vit_torch_tpu.detection import _mask
    from vit_torch_tpu.detection.panoptic_data import CocoPanopticDataset
    img_dir, ann_dir, ann_file = _write_panoptic(tmp_path)
    ds = CocoPanopticDataset(img_dir, ann_dir, ann_file, image_size=64,
                             max_boxes=8)
    gt = ds.coco
    assert sorted(gt.get_img_ids()) == [1, 2]
    anns = gt.img_to_anns[1]
    assert len(anns) == 2
    a = anns[0]
    assert a["bbox"] == [8.0, 8.0, 16.0, 12.0]
    m = _mask.decode(a["segmentation"])
    assert m.sum() == 12 * 16
    assert anns[1]["iscrowd"] == 1


def test_panoptic_cli_end_to_end(tmp_path):
    """--panoptic_root trains the DETR mask head on panoptic PNGs and
    scores bbox/segm AP + PQ against the instance-gt view."""
    import json as _json
    for split in ("train", "validation"):
        root = tmp_path / split
        root.mkdir()
        img_dir, ann_dir, ann_file = _write_panoptic(root)
        os.rename(img_dir, root / "data")
        os.rename(ann_dir, root / "panoptic")
        os.rename(ann_file, root / "panoptic.json")
    from vit_torch_tpu.cli.coco import main
    stats = tmp_path / "stats.json"
    record = main([
        "--panoptic_root", str(tmp_path), "--backbone", "swin_test3",
        "--image_size", "64", "--bs", "2", "--epochs", "1",
        "--max_boxes", "8", "--enc_layers", "1", "--dec_layers", "1",
        "--hidden_dim", "64", "--num_queries", "8", "--device", "cpu",
        "--stats_fp", str(stats)])
    row = record["logs"][-1]
    assert "loss_mask" in row["train"]
    assert "segm" in row["val"] and "panoptic" in row["val"]
    assert _json.load(open(stats))["logs"]


def test_make_synthetic_panoptic_roundtrips(tmp_path):
    """The synthetic panoptic writer produces a split the loader, PQ gt
    accessor, and instance-gt view all consume consistently."""
    from vit_torch_tpu.detection.panoptic_data import (
        CocoPanopticDataset, make_synthetic_panoptic)
    root = make_synthetic_panoptic(str(tmp_path), n_images=4, size=64,
                                   seed=3)
    ds = CocoPanopticDataset(os.path.join(root, "data"),
                             os.path.join(root, "panoptic"),
                             os.path.join(root, "panoptic.json"),
                             image_size=64, max_boxes=8)
    assert len(ds) == 4
    assert ds.num_classes == 4                 # 3 things + background
    item = ds[0]
    n = int(item["box_mask"].sum())
    assert n >= 2                              # background + >=1 rectangle
    for i in range(n):
        m = item["gt_masks"][i]
        assert m.sum() > 0
        x0, y0, x1, y1 = item["boxes"][i]
        ys, xs = np.nonzero(m)
        assert (x0, y0, x1, y1) == (xs.min(), ys.min(),
                                    xs.max() + 1, ys.max() + 1)
    # every segment id in the PNG is annotated with a live category
    gt_map, segments, crowd = ds.pq_ground_truth(ds.ids[0])
    assert set(np.unique(gt_map)) == set(segments)
    assert not crowd
    # instance view: valid RLE gt for bbox/segm COCOeval
    coco = ds.instance_gt()
    assert len(coco.imgs) == 4
    anns = coco.img_to_anns[ds.ids[0]]
    assert len(anns) == len(segments)
    areas = {a["category_id"]: a["area"] for a in anns}
    assert areas[100] > 0                      # stuff background present
    # things_only drops the stuff segment
    ds_things = CocoPanopticDataset(os.path.join(root, "data"),
                                    os.path.join(root, "panoptic"),
                                    os.path.join(root, "panoptic.json"),
                                    image_size=64, max_boxes=8,
                                    things_only=True)
    assert ds_things.num_classes == 3


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
