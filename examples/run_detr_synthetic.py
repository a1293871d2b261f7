"""DETR convergence check on the synthetic rectangle dataset.

Trains the set-prediction detector (Swin backbone + encoder/decoder
transformer + Hungarian-matched CE/L1/GIoU losses) from scratch on bright
axis-aligned rectangles and records the AP curve — evidence that the
matcher, set criterion, aux losses and box postprocess actually converge,
not just run.  Complements ``run_frcnn_synthetic.py`` (two-stage head) and
``run_kprcnn_synthetic.py`` (keypoint head).
Writes ``examples/detr_synthetic_tpu.json``.

Usage:  python examples/run_detr_synthetic.py [--device cpu] [--epochs 60]
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
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--lr", default=5e-4, type=float)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "detr_synthetic_tpu.json"))
    args = p.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, CocoLoader, make_synthetic_coco)
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer

    size = 96
    tmp = tempfile.mkdtemp(prefix="detr_conv_")
    # 1024 train images: DETR has no anchor/translation-equivariance prior,
    # so it needs an order of magnitude more data than FasterRCNN to
    # generalize (128 images: memorizes to train-AP 0.75 but val-AP 0.007)
    tr_img, tr_ann = make_synthetic_coco(
        os.path.join(tmp, "train"), n_images=1024, size=size, seed=0)
    va_img, va_ann = make_synthetic_coco(
        os.path.join(tmp, "val"), n_images=32, size=size, seed=1)
    train_ds = CocoDetectionDataset(tr_img, tr_ann, image_size=size,
                                    max_boxes=8)
    val_ds = CocoDetectionDataset(va_img, va_ann, image_size=size,
                                  max_boxes=8)
    train_loader = CocoLoader(train_ds, 16, shuffle=True)
    val_loader = CocoLoader(val_ds, 16)

    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    # Round-3 recipe: the round-2 stall (AP 0.022 @ 300 epochs) was query
    # collapse from a 0.02-std query-embedding init (all queries predicted
    # one blended box); with the N(0,1) init (torch nn.Embedding default)
    # plus pre-norm layers the same budget converges in <100 epochs.
    # Device (auction) matcher + chunked scan: one XLA dispatch per chunk.
    cfg = DETRConfig(num_classes=train_ds.num_classes, num_queries=16,
                     hidden_dim=128, num_heads=8, enc_layers=3, dec_layers=3,
                     ffn_dim=512, pre_norm=True)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), True)["params"]
    trainer = DetectionTrainer(model, params, image_size=size,
                               num_classes=train_ds.num_classes,
                               lr=args.lr, augment=True, matcher="device")

    record = {"info": {"dataset": "synthetic rectangles", "images": 1024,
                       "size": size, "epochs": args.epochs, "lr": args.lr,
                       "augment": "hflip", "backbone": "swin_test",
                       "head": "detr",
                       "device": jax.devices()[0].platform},
              "logs": []}
    t0 = time.time()
    # reference DETR schedule shape: long flat LR, one late 10x drop
    lr_step = max(args.epochs * 4 // 5, 1)
    for epoch in range(args.epochs):
        sched_lr = args.lr * (0.1 ** (epoch // lr_step))
        trainer.base_lr = sched_lr
        trainer.set_lr(sched_lr)
        logs = trainer.train_one_epoch_scan(train_loader, epoch,
                                            steps_per_dispatch=8,
                                            warmup=False)
        row = {"epoch": epoch, "train": logs}
        if epoch % 10 == 9 or epoch == args.epochs - 1:
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
