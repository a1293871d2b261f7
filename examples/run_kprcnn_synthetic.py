"""Keypoint R-CNN convergence check on the synthetic keypoint dataset.

Trains FasterRCNN + KeypointHead from scratch on bright rectangles whose
annotations carry a 5-point skeleton (4 corners + a drawn center dot) and
records the bbox-AP and keypoint-AP (OKS) curves — evidence that the
heatmap loss, RoI keypoint branch, static-grid decode and OKS COCOeval
converge end-to-end, not just run.  Writes
``examples/kprcnn_synthetic_tpu.json``.

Reference capability: torchvision ``keypointrcnn_resnet50_fpn`` behind
``object/coco_utils.py:222-251`` ``get_coco_kp``.

Usage:  python examples/run_kprcnn_synthetic.py [--device cpu] [--epochs 25]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--epochs", default=25, type=int)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "kprcnn_synthetic_tpu.json"))
    args = p.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, CocoLoader, make_synthetic_coco)
    from vit_torch_tpu.detection.engine import FasterRCNNTrainer
    from vit_torch_tpu.detection.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig)
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet

    size = 96
    tmp = tempfile.mkdtemp(prefix="kprcnn_conv_")
    tr_img, tr_ann = make_synthetic_coco(
        os.path.join(tmp, "train"), n_images=128, size=size, seed=0,
        keypoints=True)
    va_img, va_ann = make_synthetic_coco(
        os.path.join(tmp, "val"), n_images=32, size=size, seed=1,
        keypoints=True)
    train_ds = CocoDetectionDataset(tr_img, tr_ann, image_size=size,
                                    max_boxes=8, load_keypoints=True)
    val_ds = CocoDetectionDataset(va_img, va_ann, image_size=size,
                                  max_boxes=8)
    train_loader = CocoLoader(train_ds, 16, shuffle=True)
    val_loader = CocoLoader(val_ds, 16)

    backbone = ResNet(RESNET_CONFIGS["resnet_test"], dtype=jnp.float32,
                      features_only=True, name="backbone")
    cfg = FasterRCNNConfig(
        num_classes=train_ds.num_classes, image_size=size,
        strides=(4, 8), anchor_sizes=(12.0, 28.0),
        num_proposals=128, rpn_pre_nms_topk=512,
        rpn_batch=128, roi_batch=64, detections=20,
        num_keypoints=train_ds.num_keypoints,
        kp_conv_channels=(64,) * 4, kp_rois=32)
    model = FasterRCNN(cfg, backbone, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), deterministic=True)
    # the synthetic (tl, tr, center, bl, br) skeleton mirrors tl↔tr and
    # bl↔br under hflip — without this swap half the flipped keypoint
    # supervision is contradictory
    trainer = FasterRCNNTrainer(model, variables["params"], cfg=cfg,
                                lr=0.01, augment=True,
                                kp_flip_inds=(1, 0, 2, 4, 3))
    trainer.model_state = {k: v for k, v in variables.items()
                           if k != "params"}

    record = {"info": {"dataset": "synthetic rectangles + 5-kp skeleton",
                       "images": 128, "size": size, "epochs": args.epochs,
                       "lr": 0.01, "augment": "hflip",
                       "backbone": "resnet_test",
                       "num_keypoints": train_ds.num_keypoints,
                       "device": jax.devices()[0].platform},
              "logs": []}
    t0 = time.time()
    # StepLR scaled to the run length (15-epoch step at the default 25)
    lr_step = max(args.epochs * 3 // 5, 1)
    for epoch in range(args.epochs):
        sched_lr = 0.01 * (0.1 ** (epoch // lr_step))
        trainer.base_lr = sched_lr
        trainer.set_lr(sched_lr)
        logs = trainer.train_one_epoch(train_loader, epoch)
        row = {"epoch": epoch, "train": logs}
        if epoch % 5 == 4 or epoch == args.epochs - 1:
            m = trainer.evaluate(val_loader, val_ds.coco,
                                 iou_types=("bbox", "keypoints"),
                                 label_to_cat=val_ds.label_to_cat)
            row["val"] = m
            print(f"epoch {epoch}: loss {logs['loss_total']:.3f} "
                  f"AP {m['bbox']['ap']:.3f} "
                  f"kpAP {m['keypoints']['ap']:.3f}")
        else:
            print(f"epoch {epoch}: loss {logs['loss_total']:.3f}")
        record["logs"].append(row)
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1, default=str)
    record["wall_time_s"] = time.time() - t0
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1, default=str)
    print("saved", args.out)


if __name__ == "__main__":
    main()
