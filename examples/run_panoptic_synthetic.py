"""Panoptic convergence check: PQ/SQ/RQ on the synthetic panoptic set.

Trains DETRSegm on the panoptic instance view (things + the stuff
background segment, exactly the reference's ``--dataset_file
coco_panoptic`` protocol) and records bbox/segm AP plus the PQ curve —
the panoptic-path counterpart of ``run_detr_masks_synthetic.py``.
Writes ``examples/panoptic_synthetic_tpu.json``.

Usage:  python examples/run_panoptic_synthetic.py [--device cpu]
        [--epochs 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--lr", default=5e-4, type=float)
    p.add_argument("--images", default=1024, type=int,
                   help="train-set size (small values for CPU smokes)")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "panoptic_synthetic_tpu.json"))
    args = p.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vit_torch_tpu.detection.coco_data import CocoLoader
    from vit_torch_tpu.detection.detr import DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.detection.panoptic_data import (
        CocoPanopticDataset, make_synthetic_panoptic)
    from vit_torch_tpu.detection.segmentation import DETRSegm
    from vit_torch_tpu.models.swin import SwinConfig, SwinTransformer

    size = 96
    tmp = tempfile.mkdtemp(prefix="panoptic_conv_")

    def split(name, n, seed):
        root = make_synthetic_panoptic(os.path.join(tmp, name), n_images=n,
                                       size=size, seed=seed)
        return CocoPanopticDataset(
            os.path.join(root, "data"), os.path.join(root, "panoptic"),
            os.path.join(root, "panoptic.json"), image_size=size,
            max_boxes=8)

    train_ds = split("train", args.images, 0)
    val_ds = split("val", 32, 1)
    train_loader = CocoLoader(train_ds, 16, shuffle=True)
    val_loader = CocoLoader(val_ds, 16)

    scfg = SwinConfig(embed_dim=32, depths=(2, 2, 2), num_heads=(2, 4, 8),
                      window_size=6, drop_path_rate=0.0)
    backbone = SwinTransformer(scfg, dtype=jnp.float32, multi_features=True,
                               name="backbone")
    cfg = DETRConfig(num_classes=train_ds.num_classes, num_queries=16,
                     hidden_dim=128, num_heads=8, enc_layers=3, dec_layers=3,
                     ffn_dim=512, pre_norm=True)
    model = DETRSegm(cfg, backbone, num_mask_heads=8, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), True)["params"]
    trainer = DetectionTrainer(model, params, image_size=size,
                               num_classes=train_ds.num_classes,
                               lr=args.lr, masks=True, augment=True,
                               matcher="device")

    record = {"info": {"dataset": "synthetic panoptic (3 things + stuff "
                       "background)", "images": args.images, "size": size,
                       "epochs": args.epochs, "lr": args.lr,
                       "augment": "hflip", "backbone": "swin 32/(2,2,2)",
                       "head": "detr+segm panoptic",
                       "device": jax.devices()[0].platform},
              "logs": []}
    t0 = time.time()
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
                                 iou_types=("bbox", "segm"), panoptic=True,
                                 label_to_cat=val_ds.label_to_cat)
            row["val"] = m
            print(f"epoch {epoch}: loss {logs['loss_total']:.3f} "
                  f"bbox AP {m['bbox']['ap']:.3f} "
                  f"segm AP {m['segm']['ap']:.3f} "
                  f"PQ {m['panoptic']['pq']:.3f}")
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
