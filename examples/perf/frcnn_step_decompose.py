"""Decompose the FasterRCNN train step (512px/bs8/resnext50-FPN — the
detection-bench config, 168.8 ms/step recorded).  The FRCNN family never
got a roofline: this measures where the step time actually goes.

Timing-only ablations (numerics garbage, shapes preserved), each a fresh
trainer build + compile, slope-timed (per-step = Δwall/Δsteps over 4/16
scanned steps — params/opt-state carried through a lax.scan so the update
chain is real):

- full:        production step (baseline; should match the bench)
- fwd_loss:    forward + losses only, no grad/update (backward share)
- no_nms:      nms_padded -> top-k passthrough (the fori_loop greedy NMS
               is 1000-trip sequential — prime suspect)
- no_roialign: roi_align -> broadcast of a fixed feature slice
- no_matching: match_to_gt + sample_balanced -> fixed labels/indices
- backbone_only: grad of sum(backbone fwd) at the same shape (floor)

Writes examples/perf/frcnn_step_decompose.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

SIZE = int(os.environ.get("FRCNN_PROBE_SIZE", "512"))
BS = int(os.environ.get("FRCNN_PROBE_BS", "8"))
CHUNKS = (4, 16)
TRIALS = 3


def _batch():
    rng = np.random.default_rng(0)
    max_boxes = 16
    boxes = []
    for _ in range(BS * max_boxes):
        x1, y1 = rng.uniform(0, SIZE - 40, 2)
        w, h = rng.uniform(16, 40, 2)
        boxes.append([x1, y1, x1 + w, y1 + h])
    return jax.device_put({
        "image": rng.integers(0, 255, (BS, SIZE, SIZE, 3)).astype(np.float32),
        "boxes": np.asarray(boxes, np.float32).reshape(BS, max_boxes, 4),
        "labels": rng.integers(1, 4, (BS, max_boxes)).astype(np.int32),
        "box_mask": np.ones((BS, max_boxes), np.float32),
        "mask": np.ones((BS,), np.float32),
    })


def _build():
    from vit_torch_tpu.detection.engine import FasterRCNNTrainer
    from vit_torch_tpu.detection.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig)
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet

    backbone = ResNet(RESNET_CONFIGS["resnext50_32x4d"], dtype=jnp.bfloat16,
                      features_only=True, name="backbone")
    n_stages = 4
    cfg = FasterRCNNConfig(
        num_classes=5, image_size=SIZE,
        strides=tuple(4 * 2 ** i for i in range(n_stages)),
        anchor_sizes=tuple(32.0 * 2 ** i for i in range(n_stages)))
    model = FasterRCNN(cfg, backbone, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3)),
                           deterministic=True)
    trainer = FasterRCNNTrainer(model, variables["params"], cfg=cfg,
                                lr=2e-3, augment=True)
    trainer.model_state = {k: v for k, v in variables.items()
                           if k != "params"}
    return trainer


def _slope(run, fence):
    mins = []
    for length in CHUNKS:
        out = run(length)
        fence(out)
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            out = run(length)
            fence(out)
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    return (mins[1] - mins[0]) / (CHUNKS[1] - CHUNKS[0])


def time_step(trainer, batch) -> float:
    """Slope-timed production-step chain (the trainer's own _train_chunk:
    K steps per dispatch, params/opt carried through the scan)."""
    def run(length):
        batches = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (length,) + a.shape), batch)
        return trainer._train_chunk(trainer.params, trainer.opt_state,
                                    batches, jax.random.PRNGKey(1),
                                    trainer.model_state)
    return _slope(run, lambda out: float(out[2]["loss"][-1]))


def time_fwd_loss(trainer, batch) -> float:
    from vit_torch_tpu.detection import faster_rcnn as F
    model, cfg = trainer.model, trainer.cfg
    norm = trainer.norm

    def make(length):
        @jax.jit
        def run(params, model_state, batch, rng):
            images = (batch["image"] / 255.0 - jnp.asarray(norm["mean"])) \
                / jnp.asarray(norm["std"])
            images = images.astype(jnp.bfloat16)
            targets = {k: batch[k]
                       for k in ("boxes", "labels", "box_mask", "mask")}

            def one(c, sr):
                # carry-dependent input: without this the loop-invariant
                # forward hoists out of the scan and the slope reads ~0
                # (the 64px CPU smoke measured fwd_loss at 1.5 ms vs a
                # 4000 ms full step that way)
                img = images + (c * 1e-24).astype(images.dtype)
                out, _ = model.apply({"params": params, **model_state},
                                     img, rng=None, deterministic=False,
                                     mutable=list(model_state.keys()))
                losses = F.faster_rcnn_losses(out, targets, cfg, sr)
                return c + losses["loss"], 0
            rngs = jax.random.split(rng, length)
            c, _ = jax.lax.scan(one, jnp.float32(0), rngs)
            return c
        return run

    fns = {length: make(length) for length in CHUNKS}
    return _slope(
        lambda n: fns[n](trainer.params, trainer.model_state, batch,
                         jax.random.PRNGKey(1)),
        lambda out: float(out))


def time_backbone_only(trainer, batch) -> float:
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet
    backbone = ResNet(RESNET_CONFIGS["resnext50_32x4d"], dtype=jnp.bfloat16,
                      features_only=True)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, SIZE, SIZE, 3)), False)
    images = batch["image"].astype(jnp.bfloat16)

    def make(length):
        @jax.jit
        def run(variables, images):
            def loss_fn(params, model_state):
                feats, new_state = backbone.apply(
                    {"params": params, **model_state}, images, False,
                    mutable=list(model_state.keys()))
                return sum(jnp.sum(f.astype(jnp.float32) ** 2)
                           for f in feats), new_state

            def one(c, _):
                # (c * 1e-24) underflows to zero in bf16 at runtime but
                # cannot be constant-folded away like c * 0 could
                params = jax.tree.map(
                    lambda t: t + (c * 1e-24).astype(t.dtype),
                    variables["params"])
                model_state = {k: v for k, v in variables.items()
                               if k != "params"}
                (l, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, model_state)
                gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                           for g in jax.tree.leaves(grads))
                return c + l + gsum, 0
            c, _ = jax.lax.scan(one, jnp.float32(0), None, length=length)
            return c
        return run

    fns = {length: make(length) for length in CHUNKS}
    return _slope(lambda n: fns[n](variables, images),
                  lambda out: float(out))


def main() -> None:
    from vit_torch_tpu.detection import faster_rcnn as F
    batch = _batch()
    results = []

    def record(name, dt):
        r = {"variant": name, "ms_per_step": round(1000 * dt, 2)}
        print(json.dumps(r), flush=True)
        results.append(r)

    orig = (F.nms_padded, F.roi_align, F.match_to_gt, F.sample_balanced)

    record("full", time_step(_build(), batch))
    record("fwd_loss", time_fwd_loss(_build(), batch))

    def nms_passthrough(boxes, scores, iou_threshold, max_outputs):
        return (jnp.arange(max_outputs, dtype=jnp.int32),
                jnp.ones((max_outputs,), bool))
    F.nms_padded = nms_passthrough
    record("no_nms", time_step(_build(), batch))
    F.nms_padded = orig[0]

    def fake_roi_align(feats, boxes, strides, out_size=7):
        B, R = boxes.shape[:2]
        C = feats[0].shape[-1]
        tile = feats[0][:, :out_size, :out_size, :]      # (B,os,os,C)
        scale = (boxes[..., 2] + boxes[..., 0])[..., None, None, None]
        return tile[:, None] * (1 + 0 * scale.astype(tile.dtype))
    F.roi_align = fake_roi_align
    record("no_roialign", time_step(_build(), batch))
    F.roi_align = orig[1]

    def fake_match(candidates, gt_boxes, gt_mask, *a, **kw):
        n = candidates.shape[0]
        best_gt = jnp.zeros((n,), jnp.int32)
        label = (jnp.arange(n) % 3 == 0).astype(jnp.int32)  # mixed pos/neg
        return best_gt, label
    def fake_sample(rng, label, num, pos_fraction):
        n = label.shape[0]
        idx = jnp.arange(num, dtype=jnp.int32) % n
        weight = jnp.ones((num,), jnp.float32)
        is_pos = (jnp.arange(num) % 4 == 0).astype(jnp.float32)
        return idx, weight, is_pos
    F.match_to_gt = fake_match
    F.sample_balanced = fake_sample
    try:
        record("no_matching", time_step(_build(), batch))
    except Exception as e:                # signature drift — skip, not fatal
        print(f"no_matching skipped: {type(e).__name__}: {e}", flush=True)
    F.match_to_gt, F.sample_balanced = orig[2], orig[3]

    record("backbone_only", time_backbone_only(_build(), batch))

    base = results[0]["ms_per_step"]
    for r in results[1:]:
        r["vs_full_pct"] = round(100 * (base - r["ms_per_step"]) / base, 1)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "frcnn_step_decompose.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind, "size": SIZE,
                   "bs": BS, "chunk_lengths": CHUNKS, "results": results},
                  f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
