"""E2E A/B for eval-mode conv+BN folding (VITX_FOLD_BN, default on).

Slope-times the EVAL forward (per-batch = Δwall/Δscan-length over 10/40
step chunks) for the two BN-carrying zoo families, fold on vs off, and
asserts the two paths agree numerically on-chip.

Writes examples/perf/bn_fold_e2e.json.
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

CHUNKS = (10, 40)
TRIALS = 3
CONFIGS = [
    {"arch": "xcit_small_12_p16", "size": 224, "bs": 32},
    {"arch": "resnext50_32x4d", "size": 224, "bs": 32},
]


def bench(arch: str, size: int, bs: int, fold: bool) -> dict:
    os.environ["VITX_FOLD_BN"] = "1" if fold else "0"
    from vit_torch_tpu.models import VisionModelZoo
    zm = VisionModelZoo.get_model(arch, classifier=[512, 10],
                                  image_size=size)
    variables = jax.device_put(zm.init(jax.random.PRNGKey(0),
                                       image_size=size))
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.standard_normal(
        (max(CHUNKS), bs, size, size, 3), dtype=np.float32
    ).astype(jnp.bfloat16))
    apply_fn = zm.model.apply

    mins = []
    for length in CHUNKS:
        @jax.jit
        def run_chunk(variables, images):
            def one(_, img):
                logits = apply_fn(variables, img, True)
                return 0, jnp.sum(logits[:, :1])
            _, outs = jax.lax.scan(one, 0, images[:length])
            return outs
        outs = run_chunk(variables, images)
        float(outs[-1])                              # fence: D2H value read
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            outs = run_chunk(variables, images)
            float(outs[-1])
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    dt = (mins[1] - mins[0]) / (CHUNKS[1] - CHUNKS[0])
    # numerics check: single-batch logits under this flag setting
    logits = np.asarray(apply_fn(variables, images[0], True),
                        dtype=np.float32)
    return {"ms_per_batch": round(1000 * dt, 3),
            "img_s": round(bs / dt, 1), "logits": logits}


def main() -> None:
    rows = []
    for cfg in CONFIGS:
        on = bench(cfg["arch"], cfg["size"], cfg["bs"], fold=True)
        off = bench(cfg["arch"], cfg["size"], cfg["bs"], fold=False)
        err = float(np.max(np.abs(on.pop("logits") - off.pop("logits"))))
        row = {**cfg, "fold_on": on, "fold_off": off,
               "max_logit_diff": err,
               "speedup_pct": round(100 * (off["ms_per_batch"]
                                           / on["ms_per_batch"] - 1), 1)}
        print(json.dumps(row), flush=True)
        rows.append(row)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bn_fold_e2e.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "chunk_lengths": CHUNKS, "mode": "eval forward",
                   "rows": rows}, f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
