"""The bs128 augment collapse is a COMPOSITION effect: crop alone is
linear in B (augment_bisect.json: vmap_ds 10.5 us/img at bs128) but the
fused crop+flip+normalize chain explodes (bs128_bisect.json: 54.65 ms at
bs128 = 427 us/img).  A/B the full pipeline with each crop impl to find
which composition XLA mis-fuses:

- pipe_vmap_ds: crop via vmap(dynamic_slice) (pre-fix) + flip + norm
- pipe_take2:   crop via chained take_along_axis (shipped fix)
- pipe_nocrop:  flip + norm only
- pipe_noflip:  crop(take2) + norm only
- pipe_vmap_noflip: crop(vmap_ds) + norm only

Writes examples/perf/augment_compose_probe.json.
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
SIZE = 224
BATCHES = (32, 64, 128)


def crop_vmap_ds(rng, images, pad, fill=128):
    B, H, W, C = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     constant_values=fill)
    ry, rx = jax.random.split(rng)
    offs_y = jax.random.randint(ry, (B,), 0, 2 * pad + 1)
    offs_x = jax.random.randint(rx, (B,), 0, 2 * pad + 1)

    def crop_one(img, oy, ox):
        return jax.lax.dynamic_slice(img, (oy, ox, 0), (H, W, C))

    return jax.vmap(crop_one)(padded, offs_y, offs_x)


def _slope(make_run, fence):
    mins = []
    for length in CHUNKS:
        run = make_run(length)
        out = run()
        fence(out)
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            out = run()
            fence(out)
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    return (mins[1] - mins[0]) / (CHUNKS[1] - CHUNKS[0])


def bench(mode: str, bs: int) -> float:
    from vit_torch_tpu.data import augment as A
    from vit_torch_tpu.data.datasets import NORM_VALUES

    rng = np.random.default_rng(0)
    images = jax.device_put(rng.integers(
        0, 255, (bs, SIZE, SIZE, 3), dtype=np.uint8))
    pad = max(2, SIZE // 12)
    norm = NORM_VALUES["stl10"]

    def pipeline(r, x):
        r_crop, r_flip = jax.random.split(r)
        if mode == "pipe_vmap_ds":
            x = crop_vmap_ds(r_crop, x, pad)
        elif mode in ("pipe_take2", "pipe_noflip"):
            x = A.random_crop(r_crop, x, pad)
        elif mode == "pipe_vmap_noflip":
            x = crop_vmap_ds(r_crop, x, pad)
        if mode in ("pipe_vmap_ds", "pipe_take2", "pipe_nocrop"):
            x = A.random_hflip(r_flip, x)
        return A.normalize(x, dtype=jnp.bfloat16, **norm)

    def make_run(length):
        @jax.jit
        def run(r, images):
            def one(c, i):
                rr = jax.random.fold_in(r, i)
                x = pipeline(rr, images)
                return c + jnp.sum(x.astype(jnp.float32)), 0
            c, _ = jax.lax.scan(one, jnp.float32(0), jnp.arange(length))
            return c
        return lambda: run(jax.random.PRNGKey(0), images)

    return _slope(make_run, lambda out: float(out))


def main() -> None:
    rows = []
    for mode in ("pipe_take2", "pipe_noflip", "pipe_nocrop",
                 "pipe_vmap_noflip", "pipe_vmap_ds"):
        for bs in BATCHES:
            dt = bench(mode, bs)
            r = {"mode": mode, "bs": bs,
                 "ms_per_batch": round(1000 * dt, 3),
                 "us_per_img": round(1e6 * dt / bs, 2)}
            print(json.dumps(r), flush=True)
            rows.append(r)
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "augment_compose_probe.json")
            with open(out, "w") as f:
                json.dump({"device": jax.devices()[0].device_kind,
                           "size": SIZE, "chunk_lengths": CHUNKS,
                           "rows": rows}, f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
