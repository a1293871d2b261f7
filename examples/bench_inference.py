"""Inference (serving) throughput on the real TPU chip.

Forward-only eval-mode throughput across batch sizes — the serving-side
complement to `bench.py`'s train-step numbers.  Methodology matches
bench.py: K forwards scan into one dispatch (amortizing the ~30 ms tunnel
latency), timing fenced by a D2H read of the last logits.

Writes ``examples/inference_bench_tpu.json``.

Usage: python examples/bench_inference.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = [
    ("dino_vitb8", 224, (1, 8, 32)),
    ("swin_base_patch4_window12_384_22k", 384, (1, 8, 32)),
    ("dino_vits16", 224, (1, 32)),
    # BN-carrying families: eval-mode conv+BN folding engages here
    # (VITX_FOLD_BN, models/layers.py:fold_conv_bn_eval)
    ("resnext50_32x4d", 224, (1, 32)),
    ("xcit_small_12_p16", 224, (1, 32)),
]

STEPS = 20


def bench_one(arch: str, image_size: int, bs: int,
              w8a8: bool = False) -> dict:
    from vit_torch_tpu.data.datasets import NORM_VALUES
    from vit_torch_tpu.models import VisionModelZoo

    # the dispatch helpers read the env at trace time; set it before jit
    os.environ["VITX_W8A8"] = "1" if w8a8 else ""

    zm = VisionModelZoo.get_model(arch, classifier=[512, 10],
                                  image_size=image_size, dtype=jnp.bfloat16)
    variables = zm.init(jax.random.PRNGKey(0), image_size=image_size)
    mean = jnp.asarray(NORM_VALUES["stl10"]["mean"], jnp.bfloat16)
    std = jnp.asarray(NORM_VALUES["stl10"]["std"], jnp.bfloat16)
    apply_fn = zm.model.apply

    @jax.jit
    def run_chunk(variables, images):
        # variables passed as an argument — closure capture would bake the
        # params into the HLO as literals (huge remote-compile upload)
        def one(_, img):
            x = (img.astype(jnp.bfloat16) / 255.0 - mean) / std
            logits = apply_fn(variables, x, True)
            return 0, logits

        _, logits = jax.lax.scan(one, 0, images)
        return logits

    variables = jax.device_put(variables)
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(
        0, 255, (STEPS, bs, image_size, image_size, 3), dtype=np.uint8))
    out = run_chunk(variables, images)
    float(out[-1, 0, 0])                 # compile + D2H fence
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_chunk(variables, images)
        float(out[-1, 0, 0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {"arch": arch, "image_size": image_size, "bs": bs,
            "quant": "w8a8" if w8a8 else "bf16",
            "img_per_sec": round(STEPS * bs / dt, 2),
            "latency_ms_per_batch": round(1000 * dt / STEPS, 3)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--w8a8", action="store_true",
                   help="also measure each config with the dynamic-int8 "
                        "serving path (VITX_W8A8=1)")
    p.add_argument("--only", default=None,
                   help="re-run only archs whose name contains this "
                        "substring, merging into the existing JSON")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "inference_bench_tpu.json"))
    args = p.parse_args()
    configs = CONFIGS[:1] if args.quick else CONFIGS
    if args.only:
        configs = [c for c in configs if args.only in c[0]]
    results = []
    if args.only and os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("results", [])
        keys = {(c[0], bs) for c in configs for bs in c[2]}
        results = [r for r in results
                   if (r.get("arch"), r.get("bs")) not in keys]
    quants = (False, True) if args.w8a8 else (False,)
    for arch, size, bss in configs:
        for bs in bss:
          for w8a8 in quants:
            try:
                r = bench_one(arch, size, bs, w8a8=w8a8)
            except Exception as e:
                r = {"arch": arch, "bs": bs, "quant": "w8a8" if w8a8 else "bf16",
                     "error": f"{type(e).__name__}: {e}"}
            print(json.dumps(r), flush=True)
            results.append(r)
            with open(args.out, "w") as f:
                json.dump({"device": jax.devices()[0].device_kind,
                           "steps_per_dispatch": STEPS,
                           "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
