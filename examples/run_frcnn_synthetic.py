"""FasterRCNN convergence check on the synthetic rectangle dataset.

Trains the two-stage detector from scratch on bright axis-aligned rectangles
(detection's `--test` data, scaled up) and records the AP curve — evidence
that the RPN/RoI losses, matching, NMS and box coding actually converge, not
just run.  Writes ``examples/frcnn_synthetic_tpu.json``.

Usage:  python examples/run_frcnn_synthetic.py [--device cpu] [--epochs 25]
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
        os.path.dirname(__file__), "frcnn_synthetic_tpu.json"))
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
    tmp = tempfile.mkdtemp(prefix="frcnn_conv_")
    tr_img, tr_ann = make_synthetic_coco(
        os.path.join(tmp, "train"), n_images=128, size=size, seed=0)
    va_img, va_ann = make_synthetic_coco(
        os.path.join(tmp, "val"), n_images=32, size=size, seed=1)
    train_ds = CocoDetectionDataset(tr_img, tr_ann, image_size=size,
                                    max_boxes=8)
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
        rpn_batch=128, roi_batch=64, detections=20)
    model = FasterRCNN(cfg, backbone, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), deterministic=True)
    trainer = FasterRCNNTrainer(model, variables["params"], cfg=cfg,
                                lr=0.01, augment=True)
    trainer.model_state = {k: v for k, v in variables.items()
                           if k != "params"}

    record = {"info": {"dataset": "synthetic rectangles", "images": 128,
                       "size": size, "epochs": args.epochs, "lr": 0.01,
                       "augment": "hflip", "backbone": "resnet_test",
                       "device": jax.devices()[0].platform},
              "logs": []}
    t0 = time.time()
    for epoch in range(args.epochs):
        sched_lr = 0.01 * (0.1 ** (epoch // 15))
        trainer.base_lr = sched_lr
        trainer.set_lr(sched_lr)
        logs = trainer.train_one_epoch(train_loader, epoch)
        row = {"epoch": epoch, "train": logs}
        if epoch % 5 == 4 or epoch == args.epochs - 1:
            m = trainer.evaluate(val_loader, val_ds.coco,
                                 label_to_cat=val_ds.label_to_cat)
            row["val"] = m
            print(f"epoch {epoch}: loss {logs['loss_total']:.3f} "
                  f"AP {m['bbox']['ap']:.3f} AP50 {m['bbox']['ap50']:.3f}")
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
