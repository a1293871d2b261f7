"""Detection train-step throughput on the real TPU chip.

Measures steady-state FasterRCNN (resnext50-FPN class backbone, 512 px)
and DETR (swin_tiny backbone, 512 px) train-step rates — the per-step
dispatch path detection actually uses in production (unlike the
classification epoch-scan path, detection steps dispatch individually:
DETR needs the host Hungarian assignment each step).  Writes
``examples/detection_bench_tpu.json``.

The reference logs no detection throughput (its logs carry only AP), so
these numbers stand alone as the framework's detection perf record.

Usage: python examples/bench_detection.py [--device cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _batch(bs: int, size: int, max_boxes: int = 16, masks: bool = False):
    rng = np.random.default_rng(0)
    boxes = []
    for _ in range(bs * max_boxes):
        x1, y1 = rng.uniform(0, size - 40, 2)
        w, h = rng.uniform(16, 40, 2)
        boxes.append([x1, y1, x1 + w, y1 + h])
    batch = {
        "image": rng.integers(0, 255, (bs, size, size, 3)).astype(np.float32),
        "boxes": np.asarray(boxes, np.float32).reshape(bs, max_boxes, 4),
        "labels": rng.integers(1, 4, (bs, max_boxes)).astype(np.int32),
        "box_mask": np.ones((bs, max_boxes), np.float32),
        "mask": np.ones((bs,), np.float32),
    }
    return jax.device_put(batch)


def bench_frcnn(size: int = 512, bs: int = 8, steps: int = 20) -> dict:
    from vit_torch_tpu.detection.engine import FasterRCNNTrainer
    from vit_torch_tpu.detection.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig)
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet

    backbone = ResNet(RESNET_CONFIGS["resnext50_32x4d"], dtype=jnp.bfloat16,
                      features_only=True, name="backbone")
    n_stages = 4
    cfg = FasterRCNNConfig(
        num_classes=5, image_size=size,
        strides=tuple(4 * 2 ** i for i in range(n_stages)),
        anchor_sizes=tuple(32.0 * 2 ** i for i in range(n_stages)))
    model = FasterRCNN(cfg, backbone, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)),
                           deterministic=True)
    trainer = FasterRCNNTrainer(
        model, variables["params"], cfg=cfg, lr=2e-3, augment=True)
    trainer.model_state = {k: v for k, v in variables.items()
                           if k != "params"}
    batch = _batch(bs, size)
    rng = jax.random.PRNGKey(0)

    def step():
        nonlocal rng
        rng, sr = jax.random.split(rng)
        trainer.params, trainer.opt_state, logs, trainer.model_state = \
            trainer._train_step(trainer.params, trainer.opt_state, batch,
                                sr, trainer.model_state)
        return logs

    logs = step()
    float(logs["loss"])                  # compile + D2H fence
    t0 = time.perf_counter()
    for _ in range(steps):
        logs = step()
    float(logs["loss"])                  # fence
    dt = time.perf_counter() - t0

    # chunked-scan mode: `steps` train steps in ONE dispatch
    stacked = jax.tree.map(lambda a: jnp.stack([a] * steps), batch)
    p, o, losses, ms, _ = trainer._train_chunk(
        trainer.params, trainer.opt_state, stacked, rng, trainer.model_state)
    float(losses["loss"][-1])            # compile + fence
    t0 = time.perf_counter()
    p, o, losses, ms, _ = trainer._train_chunk(
        p, o, stacked, rng, ms)
    float(losses["loss"][-1])
    dt_scan = time.perf_counter() - t0
    return {"name": f"faster_rcnn resnext50 {size}px bs{bs}",
            "step_ms": round(1000 * dt / steps, 2),
            "img_per_sec": round(steps * bs / dt, 2),
            "step_ms_scan": round(1000 * dt_scan / steps, 2),
            "img_per_sec_scan": round(steps * bs / dt_scan, 2)}


def bench_detr(size: int = 512, bs: int = 8, steps: int = 20) -> dict:
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.detection.matcher import hungarian_match
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer

    backbone = SwinTransformer(SWIN_CONFIGS["swin_tiny_patch4_window7_224"],
                               dtype=jnp.bfloat16, features_only=True,
                               name="backbone")
    cfg = DETRConfig(num_classes=5)
    model = DETR(cfg, backbone, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), True)["params"]
    trainer = DetectionTrainer(model, params, image_size=size,
                               num_classes=5, lr=1e-4, augment=True)
    batch = _batch(bs, size)
    # the Hungarian loop must see a HOST box_mask: a device-resident mask
    # costs a tunnel round-trip per image per decoder layer (measured
    # 2262 ms/step vs 2.4 ms — this was the entire round-2 "11x DETR gap")
    host_mask = np.asarray(batch["box_mask"])
    rng = jax.random.PRNGKey(0)

    def step():
        nonlocal rng
        rng, sr = jax.random.split(rng)
        costs, aug_bm = jax.device_get(
            trainer._forward_costs(trainer.params, batch, sr))
        assign = np.stack([hungarian_match(costs[li], aug_bm)
                           for li in range(costs.shape[0])])
        trainer.params, trainer.opt_state, logs = trainer._train_step(
            trainer.params, trainer.opt_state, batch, jnp.asarray(assign),
            sr)
        return logs

    logs = step()
    float(logs["loss_total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        logs = step()
    float(logs["loss_total"])
    dt = time.perf_counter() - t0

    # device-matcher fused step: matching runs in-program (one dispatch)
    trainer.matcher = "device"
    p, o, logs = trainer._train_step_fused(trainer.params, trainer.opt_state,
                                           batch, rng)
    float(logs["loss_total"])                # compile + fence
    t0 = time.perf_counter()
    for _ in range(steps):
        p, o, logs = trainer._train_step_fused(p, o, batch, rng)
    float(logs["loss_total"])
    dt_fused = time.perf_counter() - t0

    # chunked-scan: `steps` fused steps in ONE dispatch
    stacked = jax.tree.map(lambda a: jnp.stack([a] * steps), batch)
    p, o, losses, _ = trainer._train_chunk(trainer.params, trainer.opt_state,
                                           stacked, rng)
    float(losses["loss_total"][-1])          # compile + fence
    t0 = time.perf_counter()
    p, o, losses, _ = trainer._train_chunk(p, o, stacked, rng)
    float(losses["loss_total"][-1])
    dt_scan = time.perf_counter() - t0
    return {"name": f"detr swin_tiny {size}px bs{bs}",
            "step_ms": round(1000 * dt / steps, 2),
            "img_per_sec": round(steps * bs / dt, 2),
            "step_ms_fused": round(1000 * dt_fused / steps, 2),
            "img_per_sec_fused": round(steps * bs / dt_fused, 2),
            "step_ms_scan": round(1000 * dt_scan / steps, 2),
            "img_per_sec_scan": round(steps * bs / dt_scan, 2)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "detection_bench_tpu.json"))
    args = p.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    results = {"device": jax.devices()[0].device_kind,
               "frcnn": bench_frcnn(), "detr": bench_detr()}
    print(json.dumps(results))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
