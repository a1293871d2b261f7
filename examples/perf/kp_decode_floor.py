"""Keypoint metric-floor: score GT keypoints after HM-56 quantize+decode
(perfect boxes, perfect peaks) through the OKS evaluator — the decode
grid's contribution to the kpAP ceiling on the 96px synthetic set."""
import os, sys, tempfile
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from vit_torch_tpu.detection.coco_data import make_synthetic_coco
from vit_torch_tpu.detection.coco_eval import COCO, CocoEvaluator
from vit_torch_tpu.detection.keypoint import (
    keypoints_to_heatmap_targets, )

size = 96
tmp = tempfile.mkdtemp(prefix="kpfloor_")
va_img, va_ann = make_synthetic_coco(os.path.join(tmp, "val"), n_images=32,
                                     size=size, seed=1, keypoints=True)
coco = COCO(va_ann)
HM = 56

for jitter in (0.0, 0.5, 1.0, 2.0):   # px of simulated localization noise
    rng = np.random.default_rng(0)
    ev = CocoEvaluator(coco, iou_types=("keypoints",))
    preds = {}
    for img_id in coco.get_img_ids():
        anns = list(coco.img_to_anns.get(img_id, []))
        boxes, kps, labels = [], [], []
        for a in anns:
            if "keypoints" not in a:
                continue
            x, y, w, h = a["bbox"]
            box = np.array([x, y, x + w, y + h])
            kp = np.asarray(a["keypoints"], np.float64).reshape(-1, 3)
            tgt, valid = keypoints_to_heatmap_targets(
                jnp.asarray(kp)[None], jnp.asarray(box)[None], HM)
            tgt = np.asarray(tgt)[0]; valid = np.asarray(valid)[0]
            by = (tgt // HM) + 0.5
            bx = (tgt % HM) + 0.5
            kx = box[0] + bx / HM * (box[2] - box[0])
            ky = box[1] + by / HM * (box[3] - box[1])
            if jitter:
                kx = kx + rng.normal(0, jitter, kx.shape)
                ky = ky + rng.normal(0, jitter, ky.shape)
            dec = np.stack([np.where(valid > 0, kx, kp[:, 0]),
                            np.where(valid > 0, ky, kp[:, 1]),
                            np.ones_like(kx)], -1)
            boxes.append(box); kps.append(dec); labels.append(a["category_id"])
        if boxes:
            preds[img_id] = {"boxes": np.stack(boxes),
                             "scores": np.ones(len(boxes)),
                             "labels": np.array(labels),
                             "keypoints": np.stack(kps)}
    ev.update(preds); ev.accumulate()
    m = ev.summarize()["keypoints"]
    print(f"jitter {jitter:3.1f}px: kpAP {m['ap']:.3f} AP50 {m['ap50']:.3f} "
          f"AP75 {m['ap75']:.3f}")
