"""Bisect the bs128 augment collapse (bs128_bisect.json: crop+flip+norm
goes 1.85 ms @ bs64 -> 54.65 ms @ bs128, 29x for 2x batch).

Times each augment stage alone at bs in (32, 64, 128), slope-timed,
plus three random-crop implementations:

- crop_vmap_ds:   current — vmap(dynamic_slice) over per-sample offsets
                  (lowers to a 2D-offset gather)
- crop_take2:     two chained single-axis take_along_axis gathers
                  (rows then cols; contiguous inner dims)
- crop_roll:      per-sample roll via two single-axis gathers on the
                  PADDED image then a static slice

Writes examples/perf/augment_bisect.json.
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


def crop_take2(rng, images, pad, fill=128):
    B, H, W, C = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     constant_values=fill)
    ry, rx = jax.random.split(rng)
    offs_y = jax.random.randint(ry, (B, 1), 0, 2 * pad + 1)
    offs_x = jax.random.randint(rx, (B, 1), 0, 2 * pad + 1)
    rows = offs_y + jnp.arange(H)[None, :]            # (B, H)
    x = jnp.take_along_axis(padded, rows[:, :, None, None], axis=1)
    cols = offs_x + jnp.arange(W)[None, :]            # (B, W)
    return jnp.take_along_axis(x, cols[:, None, :, None], axis=2)


def crop_roll(rng, images, pad, fill=128):
    B, H, W, C = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     constant_values=fill)
    HP = H + 2 * pad
    ry, rx = jax.random.split(rng)
    offs_y = jax.random.randint(ry, (B, 1), 0, 2 * pad + 1)
    offs_x = jax.random.randint(rx, (B, 1), 0, 2 * pad + 1)
    rows = (offs_y + jnp.arange(HP)[None, :]) % HP
    x = jnp.take_along_axis(padded, rows[:, :, None, None], axis=1)
    cols = (offs_x + jnp.arange(HP)[None, :]) % HP
    x = jnp.take_along_axis(x, cols[:, None, :, None], axis=2)
    return x[:, :H, :W]


def _slope(run_factory, fence):
    mins = []
    for length in CHUNKS:
        run = run_factory(length)
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

    def op(r, x):
        if mode == "crop_vmap_ds":
            return A.random_crop(r, x, pad).astype(jnp.float32)
        if mode == "crop_take2":
            return crop_take2(r, x, pad).astype(jnp.float32)
        if mode == "crop_roll":
            return crop_roll(r, x, pad).astype(jnp.float32)
        if mode == "hflip":
            return A.random_hflip(r, x.astype(jnp.float32))
        if mode == "normalize":
            return A.normalize(x, dtype=jnp.bfloat16, **norm).astype(
                jnp.float32)
        raise ValueError(mode)

    def make_run(length):
        @jax.jit
        def run(r, images):
            def one(c, i):
                rr = jax.random.fold_in(r, i)
                x = op(rr, images + i.astype(images.dtype))
                return c + jnp.sum(x, dtype=jnp.float32), 0
            c, _ = jax.lax.scan(one, jnp.float32(0), jnp.arange(length))
            return c
        return lambda: run(jax.random.PRNGKey(0), images)

    return _slope(make_run, lambda out: float(out))


def main() -> None:
    rows = []
    # crop_vmap_ds last: its bs32 compile wedged a 30-min remote-compile
    # hang on the first attempt — don't let it block the alternatives
    for mode in ("crop_take2", "crop_roll", "hflip", "normalize",
                 "crop_vmap_ds"):
        for bs in BATCHES:
            dt = bench(mode, bs)
            r = {"mode": mode, "bs": bs,
                 "ms_per_batch": round(1000 * dt, 3),
                 "us_per_img": round(1e6 * dt / bs, 2)}
            print(json.dumps(r), flush=True)
            rows.append(r)
            out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "augment_bisect.json")
            with open(out, "w") as f:
                json.dump({"device": jax.devices()[0].device_kind,
                           "size": SIZE, "chunk_lengths": CHUNKS,
                           "rows": rows}, f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
