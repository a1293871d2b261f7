"""A/B the band-gather spatial window-block kernel on-chip (PERF lever #1).

Times swin_base_384 lineareval-style forward (bs32, 20-step scan per
dispatch) with VITX_FUSED_SPATIAL=0 (pre-partitioned kernel + XLA
partition/reverse transposes) vs =1 (row-band BlockSpec slices + in-VMEM
strided window repack — NOT the abandoned 6-D-view variant, which XLA
preceded with a physical relayout copy and measured only +0.7%; see
PERF.md lever #1), and checks logits agreement at the real shape.
`swin_overhead_ablation.json` bounds the recoverable overhead at +12.6%.

Writes examples/perf/swin_spatial_bench.json.
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
ARCH = sys.argv[1] if len(sys.argv) > 1 else "swin_base_patch4_window12_384_22k"
SIZE = 384 if "384" in ARCH else 224


def build(flag: str):
    os.environ["VITX_FUSED_SPATIAL"] = flag
    from vit_torch_tpu.models import VisionModelZoo
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

    return variables, run_chunk


def main() -> None:
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.standard_normal(
        (STEPS, BS, SIZE, SIZE, 3), dtype=np.float32).astype(jnp.bfloat16))
    results = []
    logits = {}
    for flag in ("0", "1"):
        variables, run_chunk = build(flag)
        variables = jax.device_put(variables)
        out = run_chunk(variables, images)
        logits[flag] = np.asarray(out[-1], np.float32)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_chunk(variables, images)
            float(out[-1, 0, 0])            # D2H fence (tunnel enqueue-ack)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        r = {"variant": "spatial" if flag == "1" else "baseline",
             "img_per_sec": round(STEPS * BS / dt, 2),
             "ms_per_batch": round(1000 * dt / STEPS, 3)}
        print(json.dumps(r), flush=True)
        results.append(r)
    diff = float(np.max(np.abs(logits["0"] - logits["1"])))
    scale = float(np.max(np.abs(logits["0"])))
    check = {"logits_max_abs_diff": diff, "logits_max_abs": scale,
             "agree": diff < 0.05 * max(scale, 1.0)}
    print(json.dumps(check), flush=True)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "swin_spatial_bench.json")
    blob = {"device": jax.devices()[0].device_kind, "bs": BS,
            "steps_per_dispatch": STEPS}
    if os.path.exists(out_path):
        with open(out_path) as f:
            blob = json.load(f)
        blob.pop("arch", None)    # legacy single-arch layout
        if "results" in blob:
            blob.setdefault("by_arch", {})[
                "swin_base_patch4_window12_384_22k"] = {
                    "results": blob.pop("results"),
                    "check": blob.pop("check", None)}
    blob.setdefault("by_arch", {})[ARCH] = {"results": results,
                                            "check": check}
    with open(out_path, "w") as f:
        json.dump(blob, f, indent=1)


if __name__ == "__main__":
    main()
