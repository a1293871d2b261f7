"""Decompose the bs128 forward degradation (bs128_bisect.json: vits16
train fwd goes 100 -> 200 us/img from bs32 to bs128; flash on/off
identical, so not attention-specific).

Slope-times each ViT-S/16 sublayer in isolation at bs in (32, 128):

- attn_core: flash attention at (B, 6, 197, 64)
- attn_proj: qkv + out-proj matmuls (B*197, 384)x(384, 1152/384)
- mlp:       fc1 + gelu + fc2 (B*197, 384)x(384, 1536)x(1536, 384)
- ln:        LayerNorm over (B, 197, 384)
- embed:     patchify conv 16x16/s16 + pos add at (B, 224, 224, 3)

Writes examples/perf/fwd_bs_decompose.json.
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

CHUNKS = (8, 32)
TRIALS = 3
N, C, H, D, HID = 197, 384, 6, 64, 1536
BATCHES = (32, 128)


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
    from vit_torch_tpu.ops.flash_attention import flash_attention_bhnd

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    if mode == "attn_core":
        q, k, v = (jnp.asarray(rng.standard_normal((bs, H, N, D)), bf)
                   for _ in range(3))

        def op(x):
            return flash_attention_bhnd(q + x.astype(bf), k, v)
        arr = jnp.zeros(())
        reduce_out = lambda o: jnp.sum(o[:, :, :1, :1], dtype=jnp.float32)
    elif mode in ("attn_proj", "mlp"):
        x0 = jnp.asarray(rng.standard_normal((bs * N, C)), bf)
        if mode == "attn_proj":
            wq = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.05, bf)
            wo = jnp.asarray(rng.standard_normal((C, C)) * 0.05, bf)

            def op(x):
                y = x @ wq
                return y[:, :C] @ wo
        else:
            w1 = jnp.asarray(rng.standard_normal((C, HID)) * 0.05, bf)
            w2 = jnp.asarray(rng.standard_normal((HID, C)) * 0.05, bf)

            def op(x):
                return jax.nn.gelu(x @ w1, approximate=False) @ w2
        arr = x0
        reduce_out = lambda o: jnp.sum(o[:1, :1], dtype=jnp.float32)
    elif mode == "ln":
        x0 = jnp.asarray(rng.standard_normal((bs, N, C)), bf)

        def op(x):
            m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
            v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
            return ((x - m) * jax.lax.rsqrt(v + 1e-6)).astype(bf)
        arr = x0
        reduce_out = lambda o: jnp.sum(o[:1, :1, :1], dtype=jnp.float32)
    elif mode == "embed":
        x0 = jnp.asarray(rng.standard_normal((bs, 224, 224, 3)), bf)
        wc = jnp.asarray(rng.standard_normal((16, 16, 3, C)) * 0.05, bf)

        def op(x):
            y = jax.lax.conv_general_dilated(
                x, wc, (16, 16), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y
        arr = x0
        reduce_out = lambda o: jnp.sum(o[:1, :1, :1, :1], dtype=jnp.float32)
    else:
        raise ValueError(mode)

    def make_run(length):
        @jax.jit
        def run(arr):
            def one(c, i):
                x = arr + (c * 1e-24).astype(arr.dtype)
                o = op(x)
                return reduce_out(o).astype(jnp.float32), 0
            c, _ = jax.lax.scan(one, jnp.float32(0), jnp.arange(length))
            return c
        return lambda: run(arr)

    return _slope(make_run, lambda out: float(out))


def main() -> None:
    rows = []
    for mode in ("attn_core", "attn_proj", "mlp", "ln", "embed"):
        for bs in BATCHES:
            dt = bench(mode, bs)
            r = {"mode": mode, "bs": bs,
                 "ms_per_batch": round(1000 * dt, 3),
                 "us_per_img": round(1e6 * dt / bs, 2)}
            print(json.dumps(r), flush=True)
            rows.append(r)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fwd_bs_decompose.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "chunk_lengths": CHUNKS, "rows": rows}, f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
