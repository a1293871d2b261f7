"""COCO detection CLI.

Capability parity with the reference's detection entry points
(``object/coco_pipeline.py`` argparse ``:51-72``, ``--test`` smoke mode
``:75-82``, ``do_training`` per-epoch JSON with flattened ap/ap50/.../arl
``:442-559``; ``object_detr/main.py``): trains the DETR-style set-prediction
detector over a zoo backbone on a COCO-format directory and streams per-epoch
stats (train losses + the 12 COCO metrics) to JSON.

Usage:
    python -m vit_torch_tpu.cli.coco --data_root /path/coco \
        --backbone swin_tiny_patch4_window7_224 --epochs 5 --bs 8
    python -m vit_torch_tpu.cli.coco --test          # synthetic smoke run
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_args_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("coco detection")
    p.add_argument("--data_root", default="", type=str,
                   help="COCO dir: {train,validation}/{data,labels.json}")
    p.add_argument("--backbone", default="swin_tiny_patch4_window7_224")
    p.add_argument("--head", default="detr", choices=["detr", "faster_rcnn"],
                   help="detection head: DETR set-prediction (object_detr/) "
                        "or FasterRCNN two-stage (object/)")
    p.add_argument("--keypoints", action="store_true",
                   help="add a Keypoint R-CNN head (faster_rcnn only) and "
                        "score the keypoints iou_type (reference "
                        "object/coco_utils.py:222-251 get_coco_kp)")
    p.add_argument("--panoptic_root", default="", type=str,
                   help="panoptic-PNG dataset root "
                        "(root/{train,validation}/{data,panoptic,"
                        "panoptic.json}; reference --dataset_file "
                        "coco_panoptic). Implies --masks.")
    p.add_argument("--scan", default=1, type=int,
                   help="train steps per XLA dispatch (faster_rcnn, or detr "
                        "with --matcher device; >1 enables chunked-scan "
                        "training)")
    p.add_argument("--matcher", default="host", choices=["host", "device"],
                   help="DETR matching: host = exact scipy Hungarian (one "
                        "round-trip per step), device = in-program auction "
                        "assignment (single XLA dispatch, scan-capable)")
    p.add_argument("--opt", default="adamw", choices=["adamw", "sgd"],
                   help="DETR optimizer: adamw = upstream-DETR recipe, sgd "
                        "= the reference fork's actual recipe (momentum .9, "
                        "coupled wd; object_detr/main.py:239-252)")
    p.add_argument("--masks", action="store_true",
                   help="train the DETR instance-mask head (DETRsegm)")
    p.add_argument("--image_size", default=512, type=int)
    p.add_argument("--bs", default=8, type=int)
    p.add_argument("--epochs", default=10, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--lr_step", default=8, type=int,
                   help="StepLR period in epochs (reference "
                        "object/coco_pipeline.py:464-476)")
    p.add_argument("--lr_gamma", default=0.1, type=float,
                   help="StepLR decay factor")
    p.add_argument("--weight_decay", default=1e-4, type=float)
    p.add_argument("--torch_ckpt", default="", type=str,
                   help="local torch state_dict for the backbone (the "
                        "reference trains detection from *pretrained* "
                        "backbones: object/coco_pipeline.py:428-438, "
                        "object_detr/models/detr.py:41-43)")
    p.add_argument("--no_hflip", action="store_true",
                   help="disable train-time random horizontal flip "
                        "(reference object/transforms.py:7-31)")
    p.add_argument("--aug_crop", action="store_true",
                   help="DETR train-time RandomSelect zoom-crop (reference "
                        "object_detr/datasets/transforms.py:242-260)")
    p.add_argument("--aug_erase", action="store_true",
                   help="DETR train-time RandomErasing (reference "
                        "object_detr/datasets/transforms.py RandomErasing)")
    p.add_argument("--no_initial_eval", action="store_true",
                   help="skip the epoch-0 validation pass (reference "
                        "object/coco_pipeline.py:518-528)")
    p.add_argument("--ckpt_dir", default="", type=str,
                   help="orbax checkpoint dir (net-new: the reference has "
                        "no detection checkpointing; its --resume is dead, "
                        "object_detr/main.py:107-109)")
    p.add_argument("--resume", default="", type=str,
                   help="resume training from this checkpoint dir")
    p.add_argument("--num_queries", default=100, type=int)
    p.add_argument("--pre_norm", action="store_true",
                   help="pre-norm DETR transformer (reference "
                        "normalize_before variant, transformer.py:18-59; "
                        "trains stably from scratch without warmup)")
    p.add_argument("--position_embedding", default="sine",
                   choices=["sine", "learned"],
                   help="DETR position encoding variant (reference "
                        "object_detr/models/position_encoding.py:12-76)")
    p.add_argument("--enc_layers", default=6, type=int)
    p.add_argument("--dec_layers", default=6, type=int)
    p.add_argument("--hidden_dim", default=256, type=int)
    p.add_argument("--max_boxes", default=64, type=int)
    p.add_argument("--limit_train", default=0, type=int)
    p.add_argument("--limit_test", default=0, type=int)
    p.add_argument("--labels", default=[], nargs="+", type=int,
                   help="category-id subset filter")
    p.add_argument("--stats_fp",
                   default=f"./logs/coco/stats_{time.strftime('%y%m%d_%H%M%S')}.json")
    p.add_argument("--mesh", default="", type=str,
                   help="data-parallel device mesh spec, e.g. 'data=8' or ''"
                        " = single device (detection DP: params replicated,"
                        " batch sharded, GSPMD gradient all-reduce)")
    p.add_argument("--export_bundle", default="", type=str,
                   help="after training, export the predict program as a "
                        "serving bundle (StableHLO) to this directory")
    p.add_argument("--export_bs", default="1,8", type=str,
                   help="comma-separated batch-size buckets for "
                        "--export_bundle")
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--test", action="store_true",
                   help="smoke mode: tiny synthetic dataset, 2 epochs "
                        "(reference object/coco_pipeline.py:75-82)")
    return p


def _load_pretrained_backbone(torch_ckpt: str, family: str, params: dict,
                              model_state: dict):
    """Replace the detection model's backbone subtree from a local torch
    state_dict (the reference's pretrained-backbone path; importer layouts in
    ``checkpoint/torch_import.py``)."""
    from vit_torch_tpu.checkpoint.torch_import import (
        import_backbone, load_torch_state_dict)
    sd = load_torch_state_dict(torch_ckpt)
    target_colls = {k: v.get("backbone") for k, v in model_state.items()
                    if isinstance(v, dict)}
    imported = import_backbone(family, sd, params["backbone"], target_colls)
    params = {**params, "backbone": imported["params"]}
    for coll, tree in imported.items():
        if coll == "params":
            continue
        model_state[coll] = {**model_state.get(coll, {}), "backbone": tree}
    print(f"loaded pretrained {family} backbone from {torch_ckpt}")
    return params, model_state


def main(argv: Optional[Sequence[str]] = None) -> dict:
    args = get_args_parser().parse_args(argv)
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, CocoLoader, make_synthetic_coco)
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.utils.stats import default_hardware

    if args.keypoints and args.head != "faster_rcnn":
        raise SystemExit("--keypoints requires --head faster_rcnn")
    if args.keypoints and (args.masks or args.panoptic_root):
        raise SystemExit("--keypoints cannot be combined with --masks/"
                         "--panoptic_root (no mask+keypoint model)")
    if args.panoptic_root and args.head == "faster_rcnn":
        raise SystemExit("--panoptic_root requires --head detr (the "
                         "faster_rcnn head produces no mask predictions)")
    if args.masks and args.head == "faster_rcnn":
        raise SystemExit("--masks requires --head detr (the faster_rcnn "
                         "head produces no mask predictions)")
    if args.panoptic_root:
        # panoptic segments train the mask head in BOTH real and --test
        # runs (the real-data branch below additionally swaps the dataset)
        args.masks = True
    if args.test:
        import tempfile
        tmp = tempfile.mkdtemp(prefix="coco_smoke_")
        img_dir, ann_file = make_synthetic_coco(tmp, n_images=16, size=64,
                                                keypoints=args.keypoints)
        train_dirs = val_dirs = (img_dir, ann_file)
        args.epochs = min(args.epochs, 2)
        args.bs = min(args.bs, 4)
        args.image_size = 64
        args.max_boxes = 8
        args.enc_layers, args.dec_layers = 1, 1
        args.hidden_dim, args.num_queries = 64, 8
        if args.backbone == get_args_parser().get_default("backbone"):
            # pick a tiny smoke backbone matching the head (an explicit
            # --backbone is respected, e.g. swin-FRCNN module surgery)
            if args.masks:
                args.backbone = "swin_test3"
            elif args.head == "faster_rcnn":
                args.backbone = "resnet_test"
            else:
                args.backbone = "swin_test"
    else:
        assert args.data_root or args.panoptic_root, \
            "--data_root or --panoptic_root required (or --test)"
        train_dirs = (os.path.join(args.data_root, "train", "data"),
                      os.path.join(args.data_root, "train", "labels.json"))
        val_dirs = (os.path.join(args.data_root, "validation", "data"),
                    os.path.join(args.data_root, "validation", "labels.json"))

    cats = args.labels or None
    if args.panoptic_root and not args.test:
        # panoptic-PNG dataset (reference --dataset_file coco_panoptic);
        # segments train the mask head, eval runs on the instance-gt view
        from vit_torch_tpu.detection.panoptic_data import CocoPanopticDataset

        def _pan(split, limit):
            root = os.path.join(args.panoptic_root, split)
            return CocoPanopticDataset(
                os.path.join(root, "data"), os.path.join(root, "panoptic"),
                os.path.join(root, "panoptic.json"),
                image_size=args.image_size, max_boxes=args.max_boxes,
                limit=limit)

        train_ds = _pan("train", args.limit_train)
        val_ds = _pan("validation", args.limit_test)
    else:
        train_ds = CocoDetectionDataset(*train_dirs,
                                        image_size=args.image_size,
                                        max_boxes=args.max_boxes,
                                        limit=args.limit_train,
                                        category_ids=cats,
                                        load_masks=args.masks,
                                        load_keypoints=args.keypoints)
        val_ds = CocoDetectionDataset(*val_dirs, image_size=args.image_size,
                                      max_boxes=args.max_boxes,
                                      limit=args.limit_test,
                                      category_ids=cats)
    train_loader = CocoLoader(train_ds, args.bs, shuffle=True)
    val_loader = CocoLoader(val_ds, args.bs)
    print(f"train: {len(train_ds)} images, val: {len(val_ds)} images, "
          f"{train_ds.num_classes} classes")

    mesh = None
    if args.mesh:
        from vit_torch_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(args.mesh)
        if any(mesh.shape.get(ax, 1) != 1 for ax in ("model", "seq", "pipe")):
            raise SystemExit("detection supports data-parallel meshes only "
                             "(e.g. --mesh data=8)")
        if args.bs % mesh.shape["data"]:
            raise SystemExit(f"--bs {args.bs} must be a multiple of the "
                             f"data axis size ({mesh.shape['data']})")
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet
    dummy = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)

    if args.head == "faster_rcnn":
        from vit_torch_tpu.detection.engine import FasterRCNNTrainer
        from vit_torch_tpu.detection.faster_rcnn import (
            FasterRCNN, FasterRCNNConfig)
        if args.backbone in SWIN_CONFIGS:
            # the reference's module-surgery experiment: Swin stage maps
            # into the FRCNN FPN (object/module_surgery.py:92-126)
            backbone = SwinTransformer(SWIN_CONFIGS[args.backbone],
                                       dtype=dtype, multi_features=True,
                                       name="backbone")
            family = "swin"
            n_stages = len(SWIN_CONFIGS[args.backbone].depths)
        else:
            rn_arch = args.backbone if args.backbone in RESNET_CONFIGS else \
                ("resnet_test" if args.test else "resnext50_32x4d")
            backbone = ResNet(RESNET_CONFIGS[rn_arch], dtype=dtype,
                              features_only=True, name="backbone")
            family = "resnet"
            n_stages = len(RESNET_CONFIGS[rn_arch].layers)
        strides = tuple(4 * 2 ** i for i in range(n_stages))
        sizes = tuple(32.0 * 2 ** i for i in range(n_stages))
        if args.test:
            sizes = tuple(8.0 * 2 ** i for i in range(n_stages))
        kp_kw = {}
        if args.keypoints:
            kp_kw = dict(num_keypoints=train_ds.num_keypoints,
                         kp_conv_channels=((64,) * 2 if args.test
                                           else (512,) * 8),
                         kp_rois=16 if args.test else 128)
        cfg = FasterRCNNConfig(
            num_classes=train_ds.num_classes, image_size=args.image_size,
            strides=strides, anchor_sizes=sizes,
            num_proposals=64 if args.test else 256,
            rpn_pre_nms_topk=128 if args.test else 1000,
            rpn_batch=64 if args.test else 256,
            roi_batch=32 if args.test else 128,
            detections=20 if args.test else 100, **kp_kw)
        model = FasterRCNN(cfg, backbone, dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0), dummy,
                               deterministic=True)
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        if args.torch_ckpt:
            params, model_state = _load_pretrained_backbone(
                args.torch_ckpt, family, params, model_state)
        kp_flip = None
        if args.keypoints:
            from vit_torch_tpu.detection.keypoint import (
                COCO_KP_FLIP_INDS, kp_flip_inds_from_names)
            if train_ds.num_keypoints == 17 and not train_ds.kp_names:
                kp_flip = COCO_KP_FLIP_INDS
            elif train_ds.kp_names:
                # mirror-pair swap derived from the schema's keypoint names
                # (COCO left_*/right_*, or e.g. tl/tr + bl/br corners)
                kp_flip = kp_flip_inds_from_names(train_ds.kp_names)
        trainer = FasterRCNNTrainer(model, params, cfg=cfg, lr=args.lr,
                                    augment=not args.no_hflip,
                                    kp_flip_inds=kp_flip, mesh=mesh)
        trainer.model_state = model_state
    else:
        if args.backbone not in SWIN_CONFIGS:
            raise ValueError(
                f"unsupported DETR backbone {args.backbone!r} (use a swin "
                f"config, or --head faster_rcnn for resnets)")
        cfg = DETRConfig(num_classes=train_ds.num_classes,
                         num_queries=args.num_queries,
                         hidden_dim=args.hidden_dim,
                         enc_layers=args.enc_layers,
                         dec_layers=args.dec_layers,
                         pre_norm=args.pre_norm,
                         position_embedding=args.position_embedding)
        if args.masks:
            from vit_torch_tpu.detection.segmentation import DETRSegm
            backbone = SwinTransformer(SWIN_CONFIGS[args.backbone],
                                       dtype=dtype, multi_features=True,
                                       name="backbone")
            model = DETRSegm(cfg, backbone, dtype=dtype)
        else:
            backbone = SwinTransformer(SWIN_CONFIGS[args.backbone],
                                       dtype=dtype, features_only=True,
                                       name="backbone")
            model = DETR(cfg, backbone, dtype=dtype)
        params = model.init(jax.random.PRNGKey(0), dummy, True)["params"]
        if args.torch_ckpt:
            params, _ = _load_pretrained_backbone(
                args.torch_ckpt, "swin", params, {})
        trainer = DetectionTrainer(model, params, image_size=args.image_size,
                                   num_classes=train_ds.num_classes,
                                   lr=args.lr, masks=args.masks,
                                   augment=not args.no_hflip,
                                   aug_crop=args.aug_crop,
                                   aug_erase=args.aug_erase,
                                   matcher=args.matcher, opt=args.opt,
                                   mesh=mesh,
                                   weight_decay=args.weight_decay)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model: {n_params / 1e6:.1f}M params ({args.head})")

    record = {
        "info": vars(args),
        "telem": {"hardware": default_hardware(),
                  "time_start": time.time(), "completed": False},
        "logs": [],
    }

    def save():
        os.makedirs(os.path.dirname(os.path.abspath(args.stats_fp)),
                    exist_ok=True)
        record["telem"]["time_updated"] = time.time()
        with open(args.stats_fp, "w") as f:
            json.dump(record, f, indent=2, default=str)

    def log_fn(i, n, logs):
        print(f"\r  [{i + 1}/{n}] " + " ".join(
            f"{k}[{v:.4f}]" for k, v in logs.items()), end="", flush=True)

    # mask models get segm + PQ scoring (reference object/engine.py:58-67
    # auto-adds segm; object_detr/datasets/panoptic_eval.py for PQ)
    iou_types = ["bbox"]
    if args.masks:
        iou_types.append("segm")
    if args.keypoints:
        iou_types.append("keypoints")
    eval_kw = dict(label_to_cat=val_ds.label_to_cat,
                   iou_types=tuple(iou_types), panoptic=args.masks)

    def _ckpt_state():
        return {"params": trainer.params, "opt_state": trainer.opt_state,
                "model_state": getattr(trainer, "model_state", {}),
                "rng": trainer.rng}

    start_epoch = 0
    if args.resume:
        from vit_torch_tpu.checkpoint.orbax_io import (
            latest_step, restore_checkpoint)
        restored = restore_checkpoint(args.resume, _ckpt_state())
        trainer.params = restored["params"]
        trainer.opt_state = restored["opt_state"]
        if restored.get("model_state"):
            trainer.model_state = restored["model_state"]
        trainer.rng = restored["rng"]
        last = latest_step(args.resume)
        start_epoch = (last if last is not None else -1) + 1
        print(f"resumed from {args.resume} at epoch {start_epoch}")

    if not args.no_initial_eval and start_epoch == 0:
        # initial validation before any training (reference
        # object/coco_pipeline.py:518-528)
        metrics = trainer.evaluate(val_loader, val_ds.coco, **eval_kw)
        record["initial"] = metrics
        ap0 = metrics.get("bbox", {})
        print(f"initial: AP {ap0.get('ap', 0):.4f}")
        save()

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        # StepLR(lr_step, lr_gamma) decay, reference coco_pipeline.py:464-476
        sched_lr = args.lr * args.lr_gamma ** (epoch // max(args.lr_step, 1))
        trainer.base_lr = sched_lr        # epoch-0 warmup ramps to this
        trainer.set_lr(sched_lr)
        use_scan = args.scan > 1 and (
            args.head == "faster_rcnn" or args.matcher == "device")
        if use_scan:
            # chunked-scan training (FasterRCNN, or DETR with the device
            # matcher: no host round-trip) — amortizes per-dispatch latency
            train_logs = trainer.train_one_epoch_scan(
                train_loader, epoch, steps_per_dispatch=args.scan,
                log_fn=log_fn)
        else:
            train_logs = trainer.train_one_epoch(train_loader, epoch,
                                                 log_fn=log_fn)
        print()
        metrics = trainer.evaluate(val_loader, val_ds.coco, **eval_kw)
        row = {"epoch": epoch, "time": time.time() - t0,
               "train": train_logs, "val": metrics}
        record["logs"].append(row)
        save()
        ap = metrics.get("bbox", {})
        line = (f"epoch {epoch}: loss {train_logs['loss_total']:.4f} "
                f"AP {ap.get('ap', 0):.4f} AP50 {ap.get('ap50', 0):.4f}")
        if "segm" in metrics:
            line += f" segmAP {metrics['segm'].get('ap', 0):.4f}"
        if "keypoints" in metrics:
            line += f" kpAP {metrics['keypoints'].get('ap', 0):.4f}"
        if "panoptic" in metrics:
            line += f" PQ {metrics['panoptic'].get('pq', 0):.4f}"
        print(line)
        if args.ckpt_dir:
            from vit_torch_tpu.checkpoint.orbax_io import save_checkpoint
            save_checkpoint(args.ckpt_dir, _ckpt_state(), epoch)

    if args.export_bundle:
        # ship the trained predict program as a serving bundle
        # (serving/export.py; weights + BN state baked, in-graph postprocess)
        from vit_torch_tpu.serving import export_detector, save_bundle
        exported = export_detector(
            trainer, image_size=args.image_size,
            batch_sizes=[int(b) for b in args.export_bs.split(",") if b])
        save_bundle(args.export_bundle, exported)
        record["export_bundle"] = exported["manifest"]
        print("serving bundle saved to", args.export_bundle)

    record["telem"]["completed"] = True
    save()
    print("stats saved to", args.stats_fp)
    return record


if __name__ == "__main__":
    main()
