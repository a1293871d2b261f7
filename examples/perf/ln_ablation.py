"""Upper bound of the LayerNorm-fusion lever (PERF.md, ViT path).

XLA cannot fuse a row-reduction producer into a dot operand, so every
pre-norm LN materializes a full (B*N, C) activation write + read around
the following qkv/fc1 matmul.  Before building a fused LN+matmul Pallas
kernel, measure the ceiling: time the dino_vitb8 forward with LayerNorm
monkeypatched to Identity (numerics garbage, timing valid).  The delta is
the MOST any LN fusion could recover.

Writes examples/perf/ln_ablation.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20
BS = 32
SIZE = 224
ARCH = "dino_vitb8"


def bench(no_ln: bool) -> dict:
    import vit_torch_tpu.models.layers as L
    from vit_torch_tpu.models import VisionModelZoo

    orig = L.LayerNorm
    if no_ln:
        L.LayerNorm = lambda **kw: L.Identity()
    try:
        zm = VisionModelZoo.get_model(ARCH, classifier=[512, 10],
                                      image_size=SIZE, dtype=jnp.bfloat16)
        variables = zm.init(jax.random.PRNGKey(0), image_size=SIZE)
        apply_fn = zm.model.apply

        @jax.jit
        def run_chunk(variables, images):
            def one(_, img):
                return 0, apply_fn(variables, img, True)
            _, logits = jax.lax.scan(one, 0, images)
            return logits

        variables = jax.device_put(variables)
        rng = np.random.default_rng(0)
        images = jax.device_put(rng.standard_normal(
            (STEPS, BS, SIZE, SIZE, 3), dtype=np.float32).astype(jnp.bfloat16))
        out = run_chunk(variables, images)
        float(out[-1, 0, 0])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_chunk(variables, images)
            float(out[-1, 0, 0])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        return {"variant": "no_ln" if no_ln else "baseline",
                "img_per_sec": round(STEPS * BS / dt, 2),
                "ms_per_batch": round(1000 * dt / STEPS, 3)}
    finally:
        L.LayerNorm = orig


def main() -> None:
    results = [bench(False), bench(True)]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ln_ablation.json")
    blob = {"device": jax.devices()[0].device_kind, "arch": ARCH,
            "bs": BS, "steps_per_dispatch": STEPS, "results": results}
    with open(out, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(blob))


if __name__ == "__main__":
    main()
