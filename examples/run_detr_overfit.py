"""DETR pipeline-correctness check: overfit one tiny batch.

Set-prediction detectors trained *from scratch* converge slowly (the
reference never did it either — its DETR rides a pretrained
swin_large_22k backbone, ``object_detr/models/detr.py:41-43``), which
makes the slow AP climb of ``run_detr_synthetic.py`` hard to interpret
alone.  This check separates "pipeline bug" from "slow convergence": a
minimal DETR must drive its Hungarian-matched losses to near zero on a
4-image batch within 300 steps, and the *eval* decode (PostProcess →
un-letterbox → CocoEvaluator) must score those memorized boxes with high
AP50.  Writes ``examples/detr_overfit.json``.

Usage: python examples/run_detr_overfit.py  (CPU by default, ~5 min)
"""

from __future__ import annotations

import json
import os
import tempfile
import time

import jax


def main() -> None:
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vit_torch_tpu.detection.coco_data import (
        CocoDetectionDataset, CocoLoader, make_synthetic_coco)
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.detection.matcher import hungarian_match
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer

    size = 96
    tmp = tempfile.mkdtemp(prefix="detr_overfit_")
    img, ann = make_synthetic_coco(tmp, n_images=4, size=size, seed=0)
    ds = CocoDetectionDataset(img, ann, image_size=size, max_boxes=8)
    loader = CocoLoader(ds, 4)
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    cfg = DETRConfig(num_classes=ds.num_classes, num_queries=8,
                     hidden_dim=64, num_heads=4, enc_layers=1, dec_layers=1,
                     ffn_dim=128)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
                        True)["params"]
    tr = DetectionTrainer(model, params, image_size=size,
                          num_classes=ds.num_classes, lr=1e-3, augment=False)
    batch = next(iter(loader))
    t0 = time.time()
    curve = []
    for step in range(300):
        tr.rng, sr = jax.random.split(tr.rng)
        costs, aug_bm = jax.device_get(tr._forward_costs(tr.params, batch, sr))
        assign = np.stack([hungarian_match(costs[li], aug_bm)
                           for li in range(costs.shape[0])])
        tr.params, tr.opt_state, logs = tr._train_step(
            tr.params, tr.opt_state, batch, jnp.asarray(assign), sr)
        if step % 50 == 0:
            curve.append({"step": step,
                          **{k: round(float(v), 4) for k, v in logs.items()}})
            print(curve[-1])
    m = tr.evaluate(loader, ds.coco, label_to_cat=ds.label_to_cat)
    out = {"info": {"images": 4, "steps": 300, "lr": 1e-3,
                    "model": "DETR swin_test h64 1enc/1dec q8"},
           "loss_curve": curve,
           "final_ap": m["bbox"]["ap"], "final_ap50": m["bbox"]["ap50"],
           "wall_time_s": round(time.time() - t0, 1)}
    print(f"overfit AP {m['bbox']['ap']:.3f} AP50 {m['bbox']['ap50']:.3f}")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "detr_overfit.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path)
    assert m["bbox"]["ap50"] > 0.5, "DETR failed to memorize 4 images"


if __name__ == "__main__":
    main()
