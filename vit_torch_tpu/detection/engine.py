"""Detection train/eval engine.

Capability parity with the reference's detection engines
(``object/engine.py:14-110`` and ``object_detr/engine.py``): per-epoch train
loop with epoch-0 linear LR warmup, loss-dict logging, non-finite-loss abort,
and a COCO evaluation pass feeding ``CocoEvaluator``.

TPU structure: the forward + matching-cost computation is one jitted
program; only the tiny (B, Q, N_pad) cost tensor crosses to the host for the
Hungarian assignment (scipy); the loss + backward + optimizer update is a
second jitted program taking the fixed-shape assignment as input.  Aux
decoder losses are matched per-layer exactly like the reference criterion.
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jax.sharding import Mesh, NamedSharding, PartitionSpec

from vit_torch_tpu.data.augment import normalize
from vit_torch_tpu.data.datasets import NORM_VALUES
from vit_torch_tpu.detection.boxes import xyxy_to_cxcywh
from vit_torch_tpu.detection.coco_eval import CocoEvaluator
from vit_torch_tpu.detection.detr import detr_losses, postprocess
from vit_torch_tpu.detection.matcher import (
    auction_assign, cost_matrices, hungarian_match)
from vit_torch_tpu.detection.transforms import (
    random_erasing, random_hflip, random_zoom_crop)


def _replicate(tree, mesh: Mesh):
    return jax.device_put(tree, NamedSharding(mesh, PartitionSpec()))


def _shard_batch(batch: dict, mesh: Mesh, axis: int = 0) -> dict:
    """Shard every batched array over the mesh ``data`` axis (detection DP:
    the reference's DDP surface — ``DistributedSampler`` loading +
    ``reduce_dict`` loss averaging, ``object/engine.py:36`` — becomes GSPMD
    batch sharding; XLA inserts the gradient all-reduce over ICI).  The
    global batch size must divide the ``data`` axis size."""
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    data = NamedSharding(mesh, PartitionSpec(*spec))
    out = {}
    for k, v in batch.items():
        a = np.asarray(v)
        out[k] = jax.device_put(a, data) if a.ndim > axis else v
    return out


def _prep_targets(batch: Dict[str, np.ndarray], image_size: int,
                  boxes: Optional[jnp.ndarray] = None,
                  box_mask: Optional[jnp.ndarray] = None):
    if boxes is None:
        boxes = jnp.asarray(batch["boxes"])
    if box_mask is None:
        box_mask = jnp.asarray(batch["box_mask"])
    boxes = boxes / image_size                              # normalize to [0,1]
    return {
        "labels": jnp.asarray(batch["labels"]),
        "boxes_cxcywh": xyxy_to_cxcywh(boxes),
        "box_mask": box_mask,
        "mask": jnp.asarray(batch["mask"]),
    }


def _unletterbox_masks(masks: np.ndarray, scale: float, pad: np.ndarray,
                       orig_size: np.ndarray) -> np.ndarray:
    """(N, S, S) letterbox-resolution masks → (N, h, w) original-resolution
    binary masks (crop the content region, NEAREST-resize back).

    Vectorized: one index-gather resizes the whole mask stack — standard
    half-pixel-center nearest sampling (``floor((dst + 0.5) · src/dst)``),
    replacing the per-mask PIL round-trip the eval loop previously paid.
    PIL's NEAREST is not a pure index map (its resample path box-averages
    on some shapes), so the test pins exact equality on integer-ratio
    scalings and IoU ≥ 0.98 elsewhere."""
    masks = np.asarray(masks, np.uint8)
    h, w = int(orig_size[0]), int(orig_size[1])
    nh, nw = int(round(h * float(scale))), int(round(w * float(scale)))
    px, py = int(pad[0]), int(pad[1])
    if masks.shape[0] == 0 or nh <= 0 or nw <= 0:
        return np.zeros((masks.shape[0], h, w), np.uint8)
    crop = masks[:, py:py + nh, px:px + nw]
    ys = np.clip(np.floor((np.arange(h) + 0.5) * nh / h).astype(np.int64),
                 0, nh - 1)
    xs = np.clip(np.floor((np.arange(w) + 0.5) * nw / w).astype(np.int64),
                 0, nw - 1)
    return (crop[:, ys[:, None], xs[None, :]] > 0).astype(np.uint8)


def _pq_prepare(coco_gt, img_id: int, pred: Dict[str, np.ndarray]):
    """Pure per-image PQ inputs (threadable): rasterize the gt segment map
    from the COCO annotations and paint the predicted one."""
    from vit_torch_tpu.detection import _mask
    from vit_torch_tpu.detection.panoptic_eval import masks_to_segment_map
    info = coco_gt.imgs[img_id]
    h, w = int(info["height"]), int(info["width"])
    gt_map = np.zeros((h, w), np.int32)
    gt_segments: Dict[int, int] = {}
    crowd_ids = []
    for sid, ann in enumerate(coco_gt.img_to_anns.get(img_id, []), start=1):
        segm = ann.get("segmentation")
        if segm is None:
            continue
        rle = segm if isinstance(segm, dict) else _mask.poly_to_rle(segm, h, w)
        gt_map[_mask.decode(rle).astype(bool)] = sid
        gt_segments[sid] = int(ann["category_id"])
        if ann.get("iscrowd", 0):
            crowd_ids.append(sid)
    pred_map, pred_segments = masks_to_segment_map(
        pred["masks"], [int(l) for l in pred["labels"]],
        [float(s) for s in pred["scores"]], (h, w))
    return gt_map, gt_segments, pred_map, pred_segments, crowd_ids


def _pq_update(pq, coco_gt, img_id: int, pred: Dict[str, np.ndarray]) -> None:
    """Score one image's instance masks as panoptic segment maps."""
    pq.update(*_pq_prepare(coco_gt, img_id, pred))


class DetectionTrainer:
    def __init__(self, model, params, *, image_size: int, num_classes: int,
                 lr: float = 1e-4, weight_decay: float = 1e-4,
                 warmup_steps: int = 1000, grad_clip: float = 0.1,
                 masks: bool = False, augment: bool = False,
                 aug_crop: bool = False, aug_erase: bool = False,
                 matcher: str = "host",
                 opt: str = "adamw", momentum: float = 0.9,
                 mesh: Optional[Mesh] = None,
                 norm_values: Optional[dict] = None) -> None:
        """``matcher``: "host" = exact scipy Hungarian (two dispatches per
        step: forward+costs, then loss+backward); "device" = in-program
        auction assignment (ONE dispatch per step, chunked-scan capable —
        the TPU-native path, near-optimal matching).

        ``opt``: "adamw" (upstream-DETR recipe: clip 0.1 + AdamW) or "sgd"
        (the reference fork's actual recipe — SGD momentum .9 with torch's
        coupled weight decay, ``object_detr/main.py:239-252``).

        ``mesh``: data-parallel training over a ``data`` mesh axis — params
        replicated, batches sharded, GSPMD gradient all-reduce (the
        reference's DDP surface; SURVEY §2c).  Works with both matchers
        (the host Hungarian sees the gathered cost tensor).
        """
        self.model = model
        self.image_size = image_size
        self.num_classes = num_classes
        self.masks = masks
        self.augment = augment
        self.aug_crop = aug_crop
        self.aug_erase = aug_erase
        self.matcher = matcher
        self.warmup_steps = max(int(warmup_steps), 1)
        self.rng = jax.random.PRNGKey(0)
        self.norm = norm_values or NORM_VALUES["imagenet"]
        if opt == "sgd":
            self.tx = optax.chain(
                optax.add_decayed_weights(weight_decay),   # coupled wd
                optax.inject_hyperparams(
                    lambda learning_rate: optax.sgd(
                        learning_rate, momentum=momentum)
                )(learning_rate=lr))
        else:
            self.tx = optax.chain(
                optax.clip_by_global_norm(grad_clip),
                optax.inject_hyperparams(
                    lambda learning_rate: optax.adamw(
                        learning_rate, weight_decay=weight_decay)
                )(learning_rate=lr))
        self.base_lr = lr
        self.mesh = mesh
        self.params = params
        self.opt_state = self.tx.init(params)
        if mesh is not None:
            self.params = _replicate(self.params, mesh)
            self.opt_state = _replicate(self.opt_state, mesh)
        self._build_steps()

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        model, image_size, num_classes = (self.model, self.image_size,
                                          self.num_classes)
        norm = self.norm
        augment = self.augment
        aug_crop = self.aug_crop
        aug_erase = self.aug_erase
        erase_value = [255.0 * m for m in norm["mean"]]

        def _augmented(batch, rng, with_masks=False):
            """Flip (+ optional zoom-crop + optional erasing) of
            images+boxes(+masks) — the random draws are deterministic in
            the key, so forward_costs and train_step see the same
            augmentation."""
            images = jnp.asarray(batch["image"])
            boxes = jnp.asarray(batch["boxes"])
            box_mask = jnp.asarray(batch["box_mask"])
            masks = (jnp.asarray(batch["gt_masks"])
                     if with_masks and "gt_masks" in batch else None)
            # crop/erase are independent of hflip: --aug_crop/--aug_erase
            # still apply under --no_hflip (augment=False)
            if augment or aug_crop or aug_erase:
                r_flip, r_crop, r_erase = jax.random.split(rng, 3)
                if augment:
                    images, boxes, masks = random_hflip(
                        r_flip, images, boxes, image_size, masks)
                if aug_crop:
                    images, boxes, box_mask, masks = random_zoom_crop(
                        r_crop, images, boxes, box_mask, image_size, masks)
                if aug_erase:
                    # erase with the dataset mean so the patch normalizes
                    # to zero (torchvision post-normalize semantics)
                    images = random_erasing(r_erase, images,
                                            value=erase_value)
            return images, boxes, box_mask, masks

        @jax.jit
        def forward_costs(params, batch, rng):
            raw, boxes, box_mask, _ = _augmented(batch, rng)
            images = normalize(raw, **norm)
            # the TRAINING forward (same drop_rng fold as train_step's
            # loss_fn → bit-identical activations): the host Hungarian must
            # match on the same predictions the losses optimize (reference
            # object_detr/engine.py matches inside the train forward), and
            # deterministic=False keeps the int8 serving path (VITX_W8A8)
            # out of training even with the env flag set
            drop_rng = jax.random.fold_in(rng, 1)
            outputs = model.apply({"params": params}, images, False,
                                  rngs={"dropout": drop_rng})
            targets = _prep_targets(batch, image_size, boxes=boxes,
                                    box_mask=box_mask)
            layers = outputs.get("aux_outputs", []) + [outputs]
            costs = jnp.stack([
                cost_matrices(o["pred_logits"], o["pred_boxes"],
                              targets["labels"], targets["boxes_cxcywh"],
                              targets["box_mask"])
                for o in layers])                      # (L, B, Q, N)
            # the augmented mask rides along: crops can invalidate gts, and
            # the host Hungarian must see the same mask the losses use (the
            # fused path already does — in-program bm)
            return costs, targets["box_mask"]

        @jax.jit
        def train_step(params, opt_state, batch, assign, rng):
            raw, boxes, box_mask, gt_masks = _augmented(
                batch, rng, with_masks=self.masks)
            drop_rng = jax.random.fold_in(rng, 1)
            targets = _prep_targets(batch, image_size, boxes=boxes,
                                    box_mask=box_mask)

            def loss_fn(p):
                images = normalize(raw, **norm)
                outputs = model.apply({"params": p}, images, False,
                                      rngs={"dropout": drop_rng})
                layers = outputs.get("aux_outputs", []) + [outputs]
                total = 0.0
                logs = {}
                for li, o in enumerate(layers):
                    l = detr_losses(o, targets, assign[li], num_classes)
                    total = total + l["loss"]
                    if li == len(layers) - 1:
                        logs = l
                if self.masks and "pred_masks" in outputs:
                    from vit_torch_tpu.detection.segmentation import (
                        mask_losses)
                    ml = mask_losses(outputs["pred_masks"], gt_masks,
                                     assign[-1], targets["box_mask"],
                                     targets["mask"])
                    total = total + ml["loss_mask"] + ml["loss_dice"]
                    logs = {**logs, **ml}
                return total, logs

            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            logs = dict(logs)
            logs["loss_total"] = loss
            return params, opt_state, logs

        masks_on = self.masks

        @jax.jit
        def train_step_fused(params, opt_state, batch, rng):
            """ONE XLA program per step: forward, matching costs, in-program
            auction assignment (``matcher.auction_assign``), losses,
            backward, update — no host round-trip, so steps can also be
            lax.scan-chunked (``train_chunk``).  The reference needs a
            scipy round-trip per step (``object_detr/engine.py:28-68``)."""
            raw, boxes, box_mask, gt_masks = _augmented(
                batch, rng, with_masks=self.masks)
            drop_rng = jax.random.fold_in(rng, 1)
            targets = _prep_targets(batch, image_size, boxes=boxes,
                                    box_mask=box_mask)

            def loss_fn(p):
                images = normalize(raw, **norm)
                outputs = model.apply({"params": p}, images, False,
                                      rngs={"dropout": drop_rng})
                layers = outputs.get("aux_outputs", []) + [outputs]
                costs = jnp.stack([
                    cost_matrices(o["pred_logits"], o["pred_boxes"],
                                  targets["labels"],
                                  targets["boxes_cxcywh"],
                                  targets["box_mask"])
                    for o in layers])                       # (L, B, Q, N)
                L = costs.shape[0]
                bm = jnp.broadcast_to(targets["box_mask"][None],
                                      (L,) + targets["box_mask"].shape)
                assign = auction_assign(jax.lax.stop_gradient(costs), bm)
                total = 0.0
                logs = {}
                for li, o in enumerate(layers):
                    l = detr_losses(o, targets, assign[li], num_classes)
                    total = total + l["loss"]
                    if li == len(layers) - 1:
                        logs = l
                if masks_on and "pred_masks" in outputs:
                    from vit_torch_tpu.detection.segmentation import (
                        mask_losses)
                    ml = mask_losses(outputs["pred_masks"], gt_masks,
                                     assign[-1], targets["box_mask"],
                                     targets["mask"])
                    total = total + ml["loss_mask"] + ml["loss_dice"]
                    logs = {**logs, **ml}
                return total, logs

            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            logs = dict(logs)
            logs["loss_total"] = loss
            return params, opt_state, logs

        @jax.jit
        def train_chunk(params, opt_state, batches, rng):
            """K fused train steps in ONE dispatch (device matcher only) —
            the DETR counterpart of FasterRCNN's chunked-scan mode; the rng
            split sequence matches ``train_one_epoch`` exactly."""
            def body(carry, batch):
                params, opt_state, rng = carry
                rng, step_rng = jax.random.split(rng)
                params, opt_state, logs = train_step_fused(
                    params, opt_state, batch, step_rng)
                return (params, opt_state, rng), logs

            (params, opt_state, rng), logs = jax.lax.scan(
                body, (params, opt_state, rng), batches)
            return params, opt_state, logs, rng

        def predict_vars(variables, batch, with_runs: bool = False):
            """Predict from a full flax variables dict — the serving
            export's entry (``serving/export.py``): it merges the
            prequantized ``int8`` collection in next to the params."""
            images = normalize(jnp.asarray(batch["image"]), **norm)
            outputs = model.apply(variables, images, True)
            preds = postprocess(outputs, image_size,
                                jnp.asarray(batch["scale"]),
                                jnp.asarray(batch["pad"]))
            if masks_on and "pred_masks" in outputs:
                from vit_torch_tpu.detection.segmentation import (
                    pack_mask_bits, postprocess_segm)
                # (B, Q, S, S) bool at letterbox resolution, bit-packed
                # for the D2H (the transfer dominates eval wall on the
                # tunneled chip — PERF.md ledger)
                mb = postprocess_segm(outputs["pred_masks"], image_size)
                if with_runs:
                    # COLUMN-major packing: same 1-bit-per-pixel D2H, but
                    # the host C stitcher reads flips per RLE column with
                    # uniform-byte skipping — no per-pixel host work and
                    # no flip cap.  (Two earlier designs measured worse at
                    # the 1k-image scale: device top_k runs arrays paid a
                    # sort, and wide runs arrays paid 4.6x the transfer
                    # on the ~25 MB/s tunnel — PERF.md eval ledger.)
                    preds["masks_packed_cols"] = pack_mask_bits(
                        jnp.swapaxes(mb, -1, -2))
                else:
                    preds["masks_packed"] = pack_mask_bits(mb)
            return preds

        @jax.jit
        def predict(params, batch):
            return predict_vars({"params": params}, batch)

        @jax.jit
        def predict_runs(params, batch):
            return predict_vars({"params": params}, batch, with_runs=True)

        self._forward_costs = forward_costs
        self._train_step = train_step
        self._train_step_fused = train_step_fused
        self._train_chunk = train_chunk
        self._predict = predict
        self._predict_runs = predict_runs
        self._predict_vars = predict_vars

    def set_lr(self, lr: float) -> None:
        # inject_hyperparams state lives inside the chain at index 1
        inner = self.opt_state[1]
        self.opt_state = (self.opt_state[0], inner._replace(
            hyperparams={**inner.hyperparams,
                         "learning_rate": jnp.asarray(lr, jnp.float32)}))

    # ------------------------------------------------------------------
    def train_one_epoch(self, loader, epoch: int, print_freq: int = 10,
                        warmup: bool = True, log_fn: Optional[Callable] = None,
                        ) -> Dict[str, float]:
        """Reference ``train_one_epoch`` semantics (``object/engine.py:14-55``):
        linear warmup in epoch 0, running loss logging, sys.exit(1) on
        non-finite loss."""
        n_batches = len(loader)
        totals: Dict[str, float] = {}
        count = 0
        for i, batch in enumerate(loader):
            if warmup and epoch == 0:
                frac = (i + 1) / max(min(n_batches, self.warmup_steps), 1)
                self.set_lr(self.base_lr * min(frac, 1.0))
            self.rng, step_rng = jax.random.split(self.rng)
            dev_batch = (_shard_batch(batch, self.mesh)
                         if self.mesh is not None else batch)
            if self.matcher == "device":
                # single-dispatch path: auction matching runs in-program
                self.params, self.opt_state, logs = self._train_step_fused(
                    self.params, self.opt_state, dev_batch, step_rng)
            else:
                costs, aug_bm = jax.device_get(self._forward_costs(
                    self.params, dev_batch, step_rng))
                assign = np.stack([
                    hungarian_match(costs[li], aug_bm)
                    for li in range(costs.shape[0])])
                assign = jnp.asarray(assign)
                if self.mesh is not None:
                    assign = jax.device_put(assign, NamedSharding(
                        self.mesh, PartitionSpec(None, "data")))
                self.params, self.opt_state, logs = self._train_step(
                    self.params, self.opt_state, dev_batch, assign,
                    step_rng)
            logs = {k: float(v) for k, v in logs.items()}
            if not np.isfinite(logs["loss_total"]):
                print(f"Loss is {logs['loss_total']}, stopping training")
                print(logs)
                sys.exit(1)
            for k, v in logs.items():
                totals[k] = totals.get(k, 0.0) + v
            count += 1
            if log_fn and (i % print_freq == 0 or i == n_batches - 1):
                log_fn(i, n_batches, logs)
        return {k: v / max(count, 1) for k, v in totals.items()}

    def train_one_epoch_scan(self, loader, epoch: int,
                             steps_per_dispatch: int = 8,
                             warmup: bool = True,
                             log_fn: Optional[Callable] = None,
                             ) -> Dict[str, float]:
        """Chunked-scan epoch for the DEVICE matcher: ``steps_per_dispatch``
        fused train steps per XLA dispatch (in-program auction matching has
        no host round-trip, so whole chunks amortize the per-dispatch
        tunnel latency like FasterRCNN's scan mode).  Same rng split
        sequence as :meth:`train_one_epoch`; epoch-0 warmup updates the LR
        once per chunk; trailing batches run per-step."""
        if self.matcher != "device":
            raise ValueError("train_one_epoch_scan requires matcher='device'"
                             " (host Hungarian needs a round-trip per step)")
        n_batches = len(loader)
        totals: Dict[str, float] = {}
        count = 0
        done = 0
        buf: list = []
        step_keys = {"image", "boxes", "labels", "box_mask", "mask",
                     "gt_masks"}

        def _accum(logs):
            nonlocal count, done
            if not np.isfinite(logs["loss_total"]):
                print(f"Loss is {logs['loss_total']}, stopping training")
                print(logs)
                sys.exit(1)
            for k, v in logs.items():
                totals[k] = totals.get(k, 0.0) + v
            count += 1
            done += 1
            if log_fn and (done % steps_per_dispatch == 0
                           or done == n_batches):
                log_fn(done - 1, n_batches, logs)

        def flush():
            if not buf:
                return
            if len(buf) < steps_per_dispatch:
                for batch in buf:
                    self.rng, step_rng = jax.random.split(self.rng)
                    dev_batch = (_shard_batch(batch, self.mesh)
                                 if self.mesh is not None else batch)
                    self.params, self.opt_state, logs = \
                        self._train_step_fused(self.params, self.opt_state,
                                               dev_batch, step_rng)
                    logs = {k: float(v) for k, v in logs.items()}
                    _accum(logs)
                buf.clear()
                return
            batches = {k: np.stack([b[k] for b in buf])
                       for k in buf[0].keys() if k in step_keys}
            if self.mesh is not None:
                batches = _shard_batch(batches, self.mesh, axis=1)
            self.params, self.opt_state, losses, self.rng = \
                self._train_chunk(self.params, self.opt_state, batches,
                                  self.rng)
            losses = {k: np.asarray(v) for k, v in losses.items()}
            for i in range(len(buf)):
                _accum({k: float(v[i]) for k, v in losses.items()})
            buf.clear()

        for batch in loader:
            if warmup and epoch == 0:
                frac = (done + len(buf) + 1) / max(min(n_batches, self.warmup_steps), 1)
                self.set_lr(self.base_lr * min(frac, 1.0))
            buf.append(batch)
            if len(buf) == steps_per_dispatch:
                flush()
        flush()
        return {k: v / max(count, 1) for k, v in totals.items()}

    @jax.profiler.annotate_function
    def evaluate(self, loader, coco_gt, iou_types=("bbox",),
                 score_threshold: float = 0.0,
                 label_to_cat: Optional[Dict[int, int]] = None,
                 panoptic: bool = False,
                 ) -> Dict[str, Dict[str, float]]:
        """Reference ``evaluate`` (``object/engine.py:70-110``): predictions →
        CocoEvaluator update → sync → accumulate → summarize.
        ``label_to_cat`` maps contiguous model labels back to COCO ids.

        With ``"segm"`` in ``iou_types``, predicted instance masks are
        un-letterboxed to original resolution and RLE-scored (reference
        ``object/engine.py:58-67`` auto-adds segm for mask models); with
        ``panoptic=True`` they are additionally painted into segment maps
        and scored as PQ (reference ``object_detr/datasets/panoptic_eval.py``).
        """
        from concurrent.futures import ThreadPoolExecutor
        evaluator = CocoEvaluator(coco_gt, iou_types)
        want_masks = "segm" in iou_types or panoptic
        pq = None
        if panoptic:
            from vit_torch_tpu.detection.panoptic_eval import PQStat
            pq = PQStat()

        from vit_torch_tpu.detection import _mask

        def _prep_image(args):
            """Per-image host post-processing (pure → runs in the pool):
            score filter, label remap, mask RLE / un-letterbox, PQ
            rasterize."""
            preds, batch, b = args
            keep = preds["scores"][b] >= score_threshold
            labels = preds["labels"][b][keep]
            if label_to_cat:
                labels = np.asarray(
                    [label_to_cat.get(int(l), int(l)) for l in labels])
            update = {
                "boxes": preds["boxes"][b][keep],
                "scores": preds["scores"][b][keep],
                "labels": labels,
            }
            if "keypoints" in preds:
                update["keypoints"] = preds["keypoints"][b][keep]

            def _pixel_masks(packed):
                # packed width is byte-padded; slice back to image_size
                pix = np.unpackbits(np.asarray(packed),
                                    axis=-1)[..., :self.image_size]
                return _unletterbox_masks(
                    pix, batch["scale"][b], batch["pad"][b],
                    batch["orig_size"][b])

            masks = None
            if want_masks and "masks_packed_cols" in preds:
                # run-length-domain path: original-resolution RLE straight
                # from the column-major bit-packed masks — the C stitcher
                # extracts per-column flips with uniform-byte skipping, so
                # no per-pixel host work (the pixel chain was 95% of
                # segm-eval wall on this 1-core box) and the D2H stays at
                # 1 bit/pixel (PERF.md eval-at-scale ledger)
                pk = np.asarray(preds["masks_packed_cols"][b][keep])
                S = self.image_size
                geom = _mask.col_runs_geometry(
                    S, scale=float(batch["scale"][b]),
                    pad=batch["pad"][b], orig_size=batch["orig_size"][b])
                update["segm_rles"] = [
                    _mask.rle_from_packed_cols(
                        pk[i], S, orig_size=batch["orig_size"][b],
                        geom=geom)
                    for i in range(pk.shape[0])]
            elif want_masks and "masks_packed" in preds:
                masks = _pixel_masks(preds["masks_packed"][b][keep])
            elif want_masks and "masks" in preds:
                masks = _unletterbox_masks(
                    preds["masks"][b][keep], batch["scale"][b],
                    batch["pad"][b], batch["orig_size"][b])
            if masks is not None:
                update["masks"] = masks
            img_id = int(batch["image_id"][b])
            pq_args = (_pq_prepare(coco_gt, img_id, update)
                       if pq is not None and "masks" in update else None)
            return img_id, update, pq_args

        mesh = getattr(self, "mesh", None)
        # phase decomposition for the PERF.md eval-at-scale ledger:
        # t_get = blocking D2H residue (past what copy_to_host_async hid),
        # t_host = per-image post-processing + evaluator update,
        # t_final = COCO accumulate/summarize after the loop
        prof = {"t_get": 0.0, "t_host": 0.0, "t_final": 0.0, "images": 0}
        self.last_eval_profile = prof
        with ThreadPoolExecutor(max_workers=8) as pool:

            def _drain(batch, preds_dev):
                t0 = time.perf_counter()
                preds = jax.device_get(preds_dev)
                t1 = time.perf_counter()
                todo = [(preds, batch, b)
                        for b in range(len(batch["image_id"]))
                        if batch["mask"][b] != 0]
                # heavy per-image work in the pool; the stateful evaluator
                # and PQ accumulators update serially below
                for img_id, update, pq_args in pool.map(_prep_image, todo):
                    if pq_args is not None:
                        pq.update(*pq_args)
                    evaluator.update({img_id: update})
                t2 = time.perf_counter()
                prof["t_get"] += t1 - t0
                prof["t_host"] += t2 - t1
                prof["images"] += len(todo)

            # one-deep pipeline: enqueue batch i+1's predict (async JAX
            # dispatch) and start its D2H (copy_to_host_async) BEFORE the
            # blocking device_get + host post-processing of batch i, so both
            # the device compute AND the prediction transfer run ahead of the
            # host instead of idling through the RLE/COCO work (PERF.md
            # eval-at-scale ledger)
            pending = None
            for batch in loader:
                dev_batch = (_shard_batch(batch, mesh)
                             if mesh is not None else batch)
                # column-packed specialization only when segm RLEs will
                # actually be consumed (panoptic rasterizes pixels)
                use_runs = want_masks and pq is None
                pred_fn = (self._predict_runs if use_runs
                           else self._predict)
                preds_dev = dict(pred_fn(self.params, dev_batch))
                jax.tree_util.tree_map(
                    lambda a: a.copy_to_host_async(), preds_dev)
                if pending is not None:
                    _drain(*pending)
                pending = (batch, preds_dev)
            if pending is not None:
                _drain(*pending)
        t0 = time.perf_counter()
        evaluator.synchronize_between_processes()
        evaluator.accumulate()
        out = evaluator.summarize()
        if pq is not None:
            out["panoptic"] = {k: v for k, v in pq.summarize().items()
                               if k != "per_class"}
        # t_final covers ALL end-of-loop host accumulation incl. PQ —
        # anything left out would be misattributed to device compute by
        # the artifact's residual formula
        prof["t_final"] = time.perf_counter() - t0
        return out


class FasterRCNNTrainer:
    """Two-stage detector engine — the reference's FasterRCNN training path
    (``object/coco_pipeline.py:442-559`` with ``object/engine.py``), rebuilt
    fully jittable: matching and sampling run on device, so the entire train
    step is ONE XLA program (no host round-trip at all)."""

    def __init__(self, model, params, *, cfg, lr: float = 2e-3,
                 momentum: float = 0.9, weight_decay: float = 5e-4,
                 augment: bool = False, kp_flip_inds=None,
                 mesh: Optional[Mesh] = None,
                 norm_values: Optional[dict] = None) -> None:
        # reference optimizer: SGD(momentum .9, wd 5e-4), coco_pipeline.py:464-476
        # mesh: data-parallel GSPMD training (params replicated, batch
        # sharded on the 'data' axis) — the whole step incl. device-side
        # matching/sampling shards cleanly; BatchNorm means become global
        # (jnp.mean over the sharded axis lowers to an ICI all-reduce)
        self.model = model
        self.cfg = cfg
        self.augment = augment
        self.kp_flip_inds = kp_flip_inds     # COCO left/right swap for hflip
        self.mesh = mesh
        self.norm = norm_values or NORM_VALUES["imagenet"]
        self.tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            # decay added to the gradient *before* momentum = torch's
            # coupled SGD weight decay
            optax.add_decayed_weights(weight_decay),
            optax.inject_hyperparams(
                lambda learning_rate: optax.sgd(learning_rate,
                                                momentum=momentum))(
                learning_rate=lr))
        self.base_lr = lr
        self.weight_decay = weight_decay
        self.params = params
        self.opt_state = self.tx.init(params)
        if mesh is not None:
            self.params = _replicate(self.params, mesh)
            self.opt_state = _replicate(self.opt_state, mesh)
        self.rng = jax.random.PRNGKey(0)
        self._build_steps()

    def _build_steps(self) -> None:
        from vit_torch_tpu.detection.faster_rcnn import (
            faster_rcnn_losses, faster_rcnn_predict)
        model, cfg, norm = self.model, self.cfg, self.norm
        augment = self.augment

        kp_flip_inds = self.kp_flip_inds

        @jax.jit
        def train_step(params, opt_state, batch, rng, model_state):
            flip_rng, sample_rng = jax.random.split(rng)
            raw = jnp.asarray(batch["image"])
            boxes = jnp.asarray(batch["boxes"])
            keypoints = (jnp.asarray(batch["gt_keypoints"])
                         if "gt_keypoints" in batch else None)
            if augment:
                flipped = random_hflip(flip_rng, raw, boxes, cfg.image_size,
                                       keypoints=keypoints,
                                       kp_flip_inds=kp_flip_inds)
                if keypoints is None:
                    raw, boxes, _ = flipped
                else:
                    raw, boxes, _, keypoints = flipped

            drop_rng = jax.random.fold_in(rng, 1)

            def loss_fn(p):
                images = normalize(raw, **norm)
                variables = {"params": p, **model_state}
                mutable = list(model_state.keys())
                rngs = {"dropout": drop_rng}
                if mutable:
                    outputs, new_ms = model.apply(variables, images,
                                                  deterministic=False,
                                                  mutable=mutable, rngs=rngs)
                else:
                    outputs = model.apply(variables, images,
                                          deterministic=False, rngs=rngs)
                    new_ms = {}
                targets = {"boxes": boxes,
                           "labels": jnp.asarray(batch["labels"]),
                           "box_mask": jnp.asarray(batch["box_mask"]),
                           "mask": jnp.asarray(batch["mask"])}
                if keypoints is not None:
                    targets["keypoints"] = keypoints
                losses = faster_rcnn_losses(outputs, targets, cfg, sample_rng)
                return losses["loss"], (losses, new_ms)

            (loss, (losses, new_ms)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, losses, new_ms

        def predict_vars(variables, batch):
            """Predict from a full flax variables dict (params + BN state
            + optionally the serving export's prequantized ``int8``
            collection — ``serving/export.py``)."""
            images = normalize(jnp.asarray(batch["image"]), **norm)
            outputs = model.apply(variables, images, deterministic=True)
            return faster_rcnn_predict(outputs, cfg,
                                       jnp.asarray(batch["scale"]),
                                       jnp.asarray(batch["pad"]))

        @jax.jit
        def predict(params, batch, model_state):
            return predict_vars({"params": params, **model_state}, batch)

        @jax.jit
        def train_chunk(params, opt_state, batches, rng, model_state):
            """K train steps in ONE dispatch (lax.scan over stacked
            batches) — FasterRCNN's step has no host round-trip (device
            matching/sampling), so whole chunks amortize the per-dispatch
            latency like the classification epoch-scan (train/scan.py).
            The rng split sequence matches train_one_epoch's exactly."""
            def body(carry, batch):
                params, opt_state, model_state, rng = carry
                rng, step_rng = jax.random.split(rng)
                params, opt_state, losses, model_state = train_step(
                    params, opt_state, batch, step_rng, model_state)
                return (params, opt_state, model_state, rng), losses

            (params, opt_state, model_state, rng), losses = jax.lax.scan(
                body, (params, opt_state, model_state, rng), batches)
            return params, opt_state, losses, model_state, rng

        self._train_step = train_step
        self._train_chunk = train_chunk
        self._predict_fn = predict
        self._predict_vars = predict_vars
        self.model_state: Dict = {}

    def set_lr(self, lr: float) -> None:
        # chain = (clip, add_decayed_weights, inject_hyperparams(sgd))
        inner = self.opt_state[2]
        self.opt_state = (*self.opt_state[:2], inner._replace(
            hyperparams={**inner.hyperparams,
                         "learning_rate": jnp.asarray(lr, jnp.float32)}))

    def _predict(self, params, batch):
        return self._predict_fn(params, batch, self.model_state)

    def train_one_epoch(self, loader, epoch: int, print_freq: int = 10,
                        warmup: bool = True, log_fn: Optional[Callable] = None,
                        ) -> Dict[str, float]:
        n_batches = len(loader)
        totals: Dict[str, float] = {}
        count = 0
        for i, batch in enumerate(loader):
            if warmup and epoch == 0:
                frac = (i + 1) / max(min(n_batches, 1000), 1)
                self.set_lr(self.base_lr * min(frac, 1.0))
            self.rng, step_rng = jax.random.split(self.rng)
            if self.mesh is not None:
                batch = _shard_batch(batch, self.mesh)
            self.params, self.opt_state, logs, self.model_state = \
                self._train_step(self.params, self.opt_state, batch,
                                 step_rng, self.model_state)
            logs = {k: float(v) for k, v in logs.items()}
            if not np.isfinite(logs["loss"]):
                print(f"Loss is {logs['loss']}, stopping training")
                print(logs)
                sys.exit(1)
            for k, v in logs.items():
                totals[k] = totals.get(k, 0.0) + v
            count += 1
            if log_fn and (i % print_freq == 0 or i == n_batches - 1):
                log_fn(i, n_batches, logs)
        out = {k: v / max(count, 1) for k, v in totals.items()}
        out["loss_total"] = out.pop("loss")
        return out

    def train_one_epoch_scan(self, loader, epoch: int,
                             steps_per_dispatch: int = 8,
                             warmup: bool = True,
                             log_fn: Optional[Callable] = None,
                             ) -> Dict[str, float]:
        """Chunked-scan epoch: ``steps_per_dispatch`` train steps per XLA
        dispatch.  Numerically identical to :meth:`train_one_epoch` (same
        rng split sequence) except epoch-0 warmup updates the LR once per
        chunk instead of per step; trailing batches that do not fill a
        chunk run through the per-step path."""
        n_batches = len(loader)
        totals: Dict[str, float] = {}
        count = 0
        buf: list = []
        done = 0

        # only the keys train_step consumes — the loader's eval metadata
        # (image_id/scale/pad/orig_size) would otherwise be stacked and
        # shipped to the device every chunk for nothing
        step_keys = {"image", "boxes", "labels", "box_mask", "mask",
                     "gt_keypoints", "gt_masks"}

        def flush():
            if not buf:
                return
            if len(buf) < steps_per_dispatch:
                for batch in buf:     # tail: per-step (no extra compile)
                    self.rng, step_rng = jax.random.split(self.rng)
                    if self.mesh is not None:
                        batch = _shard_batch(batch, self.mesh)
                    self.params, self.opt_state, logs, self.model_state = \
                        self._train_step(self.params, self.opt_state, batch,
                                         step_rng, self.model_state)
                    _accum({k: float(v) for k, v in logs.items()})
                buf.clear()
                return
            batches = {k: np.stack([b[k] for b in buf])
                       for k in buf[0].keys() if k in step_keys}
            if self.mesh is not None:
                batches = _shard_batch(batches, self.mesh, axis=1)
            (self.params, self.opt_state, losses, self.model_state,
             self.rng) = self._train_chunk(self.params, self.opt_state,
                                           batches, self.rng,
                                           self.model_state)
            losses = {k: np.asarray(v) for k, v in losses.items()}
            for i in range(len(buf)):
                _accum({k: float(v[i]) for k, v in losses.items()})
            buf.clear()

        def _accum(logs):
            nonlocal count, done
            if not np.isfinite(logs["loss"]):
                print(f"Loss is {logs['loss']}, stopping training")
                print(logs)
                sys.exit(1)
            for k, v in logs.items():
                totals[k] = totals.get(k, 0.0) + v
            count += 1
            done += 1
            if log_fn and (done % steps_per_dispatch == 0
                           or done == n_batches):
                log_fn(done - 1, n_batches, logs)

        for batch in loader:
            if warmup and epoch == 0:
                frac = (done + len(buf) + 1) / max(min(n_batches, 1000), 1)
                self.set_lr(self.base_lr * min(frac, 1.0))
            buf.append(batch)
            if len(buf) == steps_per_dispatch:
                flush()
        flush()
        out = {k: v / max(count, 1) for k, v in totals.items()}
        out["loss_total"] = out.pop("loss")
        return out

    # COCO evaluation shares the DETR engine implementation
    evaluate = DetectionTrainer.evaluate
