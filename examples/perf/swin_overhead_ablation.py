"""Bound swin_base_384's inter-block overheads (PERF.md lever #1 tail).

The fused window-block kernel covers qkv+attention+proj; what remains in
XLA per block is LN ×2, the cyclic roll (shifted blocks), the window
partition/reverse transposes, residuals, and the MLP.  This probe bounds
the first three by timing-only ablations (numerics garbage, shapes and
schedule preserved):

- no_ln:          every LayerNorm -> Identity
- no_roll:        jnp.roll -> identity (shift/unshift copies removed)
- fake_partition: window partition/reverse -> contiguity-preserving
                  reshapes (the transpose+copy removed, shapes kept)
- all_off:        all three at once

Writes examples/perf/swin_overhead_ablation.json.
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
SIZE = 384
ARCH = "swin_base_patch4_window12_384_22k"


def bench(variant: str) -> dict:
    import vit_torch_tpu.models.layers as L
    import vit_torch_tpu.models.swin as S
    from vit_torch_tpu.models import VisionModelZoo

    no_ln = variant in ("no_ln", "all_off")
    no_roll = variant in ("no_roll", "all_off")
    fake_part = variant in ("fake_partition", "all_off")

    orig_ln_l, orig_ln_s = L.LayerNorm, S.LayerNorm
    orig_roll = jnp.roll
    orig_part, orig_rev = S.window_partition, S.window_reverse
    if no_ln:
        L.LayerNorm = lambda **kw: L.Identity()
        S.LayerNorm = L.LayerNorm
    if no_roll:
        jnp.roll = lambda a, shift, axis=None: a
    if fake_part:
        S.window_partition = lambda x, w: x.reshape(-1, w * w, x.shape[-1])
        S.window_reverse = lambda wins, w, H, W: wins.reshape(
            -1, H, W, wins.shape[-1])
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
        return {"variant": variant,
                "img_per_sec": round(STEPS * BS / dt, 2),
                "ms_per_batch": round(1000 * dt / STEPS, 3)}
    finally:
        L.LayerNorm, S.LayerNorm = orig_ln_l, orig_ln_s
        jnp.roll = orig_roll
        S.window_partition, S.window_reverse = orig_part, orig_rev


def main() -> None:
    results = []
    for variant in ("baseline", "no_ln", "no_roll", "fake_partition",
                    "all_off"):
        r = bench(variant)
        print(json.dumps(r), flush=True)
        results.append(r)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "swin_overhead_ablation.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind, "arch": ARCH,
                   "bs": BS, "steps_per_dispatch": STEPS,
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
