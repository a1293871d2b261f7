"""DETR-segm convergence check: instance masks on synthetic rectangles.

Trains DETRSegm (DETR + MHAttentionMap/FPN mask head, dice+focal losses)
from scratch and records the bbox AND segm AP curves — the mask-path
counterpart of ``run_detr_synthetic.py`` (reference
``object_detr/models/segmentation.py`` trained via ``--masks``).  The
synthetic rectangles' polygon segmentations are exact, so segm AP has a
clean ceiling.  Writes ``examples/detr_masks_synthetic_tpu.json``.

Usage:  python examples/run_detr_masks_synthetic.py [--device cpu]
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
        os.path.dirname(__file__), "detr_masks_synthetic_tpu.json"))
    args = p.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, CocoLoader, make_synthetic_coco)
    from vit_torch_tpu.detection.detr import DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.detection.segmentation import DETRSegm
    from vit_torch_tpu.models.swin import SwinConfig, SwinTransformer

    size = 96
    tmp = tempfile.mkdtemp(prefix="detr_masks_conv_")
    # same data budget as the bbox run (run_detr_synthetic.py): DETR needs
    # ~1k images to generalize on this generator
    tr_img, tr_ann = make_synthetic_coco(
        os.path.join(tmp, "train"), n_images=args.images, size=size, seed=0)
    va_img, va_ann = make_synthetic_coco(
        os.path.join(tmp, "val"), n_images=32, size=size, seed=1)
    train_ds = CocoDetectionDataset(tr_img, tr_ann, image_size=size,
                                    max_boxes=8, load_masks=True)
    val_ds = CocoDetectionDataset(va_img, va_ann, image_size=size,
                                  max_boxes=8, load_masks=True)
    train_loader = CocoLoader(train_ds, 16, shuffle=True)
    val_loader = CocoLoader(val_ds, 16)

    # 3-stage backbone (strides 4/8/16): last stage feeds the transformer,
    # earlier stages are the mask head's FPN laterals
    scfg = SwinConfig(embed_dim=32, depths=(2, 2, 2), num_heads=(2, 4, 8),
                      window_size=6, drop_path_rate=0.0)
    backbone = SwinTransformer(scfg, dtype=jnp.float32, multi_features=True,
                               name="backbone")
    # bbox-run recipe (N(0,1) query init + pre-norm + device matcher)
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

    record = {"info": {"dataset": "synthetic rectangles + exact polygon "
                       "masks", "images": args.images, "size": size,
                       "epochs": args.epochs, "lr": args.lr,
                       "augment": "hflip", "backbone": "swin 32/(2,2,2)",
                       "head": "detr+segm",
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
                                 iou_types=("bbox", "segm"),
                                 label_to_cat=val_ds.label_to_cat)
            row["val"] = m
            print(f"epoch {epoch}: loss {logs['loss_total']:.3f} "
                  f"bbox AP {m['bbox']['ap']:.3f} "
                  f"segm AP {m['segm']['ap']:.3f}")
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
