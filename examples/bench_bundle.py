"""AOT serving-bundle throughput on the real TPU chip.

Measures what a *deployed* artifact delivers (vs `bench_inference.py`'s
live-forward numbers): export dino_vitb8 bundles in three variants —
bf16 params, dynamic W8A8 (fp32 kernels + in-graph weight quantize), and
prequant W8A8 (baked int8 constants) — then time `Exported.call` at each
batch size and record artifact bytes.

Methodology per the tunnel rules (CLAUDE.md): dispatches are issued
back-to-back (they pipeline on the device queue — this is exactly how a
serving process drives the chip) and the timer fences on a D2H read of
the last reply.  First call per bucket compiles; excluded.

Usage: python examples/bench_bundle.py [--quick]
Writes ``examples/bundle_bench_tpu.json``.
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

ARCH = "dino_vitb8"
IMAGE_SIZE = 224
CALLS = 20


def export_variant(zm, variables, *, bs: int, w8a8: bool, prequant: bool):
    from vit_torch_tpu.serving.export import export_classifier
    os.environ["VITX_W8A8"] = "1" if w8a8 else ""
    out = export_classifier(zm, variables, image_size=IMAGE_SIZE,
                            batch_sizes=[bs], param_dtype="bfloat16",
                            prequant=prequant)
    exp = out["exports"][bs]
    return exp, len(exp.serialize())


def bench_exported(exp, bs: int) -> dict:
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(
        0, 255, (bs, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.uint8))
    out = exp.call(images)
    float(np.asarray(out)[0, 0])           # compile + fence
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(CALLS):
            out = exp.call(images)
        float(np.asarray(out)[0, 0])       # D2H fence on the last reply
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return {"img_per_sec": round(CALLS * bs / dt, 2),
            "latency_ms_per_call": round(1000 * dt / CALLS, 3)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true", help="bs=8 only")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bundle_bench_tpu.json"))
    args = p.parse_args()

    from vit_torch_tpu.models import VisionModelZoo
    zm = VisionModelZoo.get_model(ARCH, classifier=[512, 10],
                                  image_size=IMAGE_SIZE, dtype=jnp.bfloat16)
    variables = zm.init(jax.random.PRNGKey(0), image_size=IMAGE_SIZE)

    variants = [("bf16", False, False),
                ("w8a8_dynamic", True, False),
                ("w8a8_prequant", True, True)]
    results = []
    for bs in ((8,) if args.quick else (8, 32)):
        for name, w8a8, prequant in variants:
            try:
                exp, nbytes = export_variant(zm, variables, bs=bs,
                                             w8a8=w8a8, prequant=prequant)
                r = {"variant": name, "bs": bs,
                     "artifact_bytes": nbytes, **bench_exported(exp, bs)}
            except Exception as e:
                r = {"variant": name, "bs": bs,
                     "error": f"{type(e).__name__}: {e}"}
            print(json.dumps(r), flush=True)
            results.append(r)
            with open(args.out, "w") as f:
                json.dump({"device": jax.devices()[0].device_kind,
                           "arch": ARCH, "image_size": IMAGE_SIZE,
                           "calls_per_timing": CALLS,
                           "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
