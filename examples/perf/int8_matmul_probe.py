"""Probe: does the int8 MXU path (s8 x s8 -> s32) beat bf16 on this chip?

v5e datasheet peak: 197 TFLOP/s bf16, 394 TOP/s int8.  PERF.md lever #2
names quantization as the remaining headroom for the non-attention matmuls
(measured ~53% MXU on bf16).  This probe times XLA matmuls at the exact
dino_vitb8 token-matmul shapes (T=25120 tokens, C=768) in three flavors:

  1. bf16 @ bf16 -> fp32          (the production path)
  2. s8 @ s8 -> s32               (bare int8 MXU rate)
  3. dynamic W8A8: per-row act quant + s8 matmul + rescale (the real
     serving path including quantize/dequantize overhead)

Methodology: slope timing (see slope_timing.py) — per-matmul ms is the
slope of scan wall time over two step counts (20 and 120), which cancels
the ~22 ms per-dispatch tunnel floor exactly (the original STEPS=20
average baked 1.1 ms/rep of floor into every row, understating the fat
shapes ~2x and compressing the int8-vs-bf16 ratios).  min of 3 rounds per
step count.  Writes examples/perf/int8_matmul_probe.json.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    (25120, 768, 2304),   # qkv, dino_vitb8 bs32 (785 tok)
    (25120, 768, 3072),   # fc1
    (25120, 3072, 768),   # fc2
    (25120, 768, 768),    # proj
]
STEPS = (20, 120)


def _time(make, *args) -> float:
    """Slope of min-of-3 wall time over the two step counts."""
    mins = []
    for steps in STEPS:
        fn = make(steps)
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a[-1]).ravel()[0], out)  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree.map(lambda a: np.asarray(a[-1]).ravel()[0], out)
            ts.append(time.perf_counter() - t0)
        mins.append(min(ts))
    return (mins[1] - mins[0]) / (STEPS[1] - STEPS[0])


def bench_shape(M: int, K: int, N: int) -> dict:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    xq = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)
    w_scale = jnp.asarray(rng.uniform(0.01, 0.02, (N,)), jnp.float32)

    # Serialization pattern for every runner: the (M, K) carry is perturbed
    # by the step's (M, 1) output column (broadcast), so each matmul consumes
    # the previous one's result — XLA can neither hoist the dot out of the
    # scan nor DCE it — and the carry shape is K-independent of N (a
    # y[:, :K] feed-back breaks when K != N, e.g. the fc2 shape).
    def make_bf16(steps):
        @jax.jit
        def run_bf16(x, w):
            def one(c, _):
                y = jnp.dot(c, w, preferred_element_type=jnp.float32)
                return c + (y[:, :1] * 1e-6).astype(c.dtype), y[:1, :1]
            _, ys = jax.lax.scan(one, x, None, length=steps)
            return ys
        return run_bf16

    def make_s8(steps):
        @jax.jit
        def run_s8(xq, wq):
            def one(c, _):
                y = jax.lax.dot_general(
                    c, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return jnp.bitwise_xor(c, (y[:, :1] & 3).astype(jnp.int8)), \
                    y[:1, :1]
            _, ys = jax.lax.scan(one, xq, None, length=steps)
            return ys
        return run_s8

    def make_w8a8(steps):
        @jax.jit
        def run_w8a8(x, wq, w_scale):
            def one(c, _):
                ax = jnp.max(jnp.abs(c), axis=-1, keepdims=True)
                scale = (ax / 127.0).astype(jnp.float32) + 1e-8
                cq = jnp.clip(jnp.round(c.astype(jnp.float32) / scale),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.dot_general(
                    cq, wq, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = y.astype(jnp.float32) * scale * w_scale
                return c + (y[:, :1] * 1e-6).astype(c.dtype), y[:1, :1]
            _, ys = jax.lax.scan(one, x, None, length=steps)
            return ys
        return run_w8a8

    flops = 2.0 * M * K * N
    r = {}
    for name, make, args in [("bf16", make_bf16, (x, w)),
                             ("s8", make_s8, (xq, wq)),
                             ("w8a8_dynamic", make_w8a8, (x, wq, w_scale))]:
        dt = _time(make, *args)
        r[name] = {"ms": round(dt * 1e3, 4),
                   "tflops": round(flops / dt / 1e12, 1)}
    return {"shape": [M, K, N], **r}


def main() -> None:
    out = {"device": jax.devices()[0].device_kind, "steps": STEPS,
           "results": [bench_shape(*s) for s in SHAPES]}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "int8_matmul_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
