"""Isolated talking-heads attention core A/B at the cait_s24_224 shape
(B=32, H=8, N=197, D=48), slope-timed on-chip.

Context (cait_overhead_ablation on v5e): the attention core costs
5.24 ms of the 9.35 ms eval batch (24 layers -> ~6.8 us per program) while
its FLOPs roofline is ~0.5 ms; the v1 kernel's H^2-unrolled VPU mix loops
and head-stacked fp32 score lists are the suspects.

Variants (all timed over 24 sequential layer applications to match the
model's pipelining conditions):

- th_v1:      current kernel (ops/talking_heads.talking_heads_attention)
- th_xla:     the XLA einsum chain (_ref_forward)
- th_v2:      mix-as-matmul kernel (talking_heads_attention_bnc)
- flash:      plain (mix-free) flash attention at the same shape — the
              no-TH floor (numerics differ; timing reference only)

Writes examples/perf/th_core_probe.json.
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

CHUNKS = (4, 16)
TRIALS = 3
LAYERS = 24
B, H, N, D = 32, 8, 197, 48
C = H * D


def main() -> None:
    from vit_torch_tpu.ops import talking_heads as TH
    from vit_torch_tpu.ops.flash_attention import flash_attention_bhnd

    rng = np.random.default_rng(0)
    qkv_b = jnp.asarray(rng.standard_normal((3, B, H, N, D)), jnp.bfloat16)
    qkv_c = jnp.asarray(
        np.moveaxis(np.asarray(qkv_b, np.float32), 2, 3).reshape(
            3, B, N, C), jnp.bfloat16)
    wl = jnp.asarray(rng.standard_normal((H, H)) * 0.2, jnp.float32)
    bl = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
    ww = jnp.asarray(rng.standard_normal((H, H)) * 0.2, jnp.float32)
    bw = jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)
    scale = D ** -0.5

    def core(variant, q, k, v):
        if variant == "th_v1":
            return TH.talking_heads_attention(q, k, v, wl, bl, ww, bw,
                                              scale=scale)
        if variant == "th_xla":
            return TH._ref_forward(q, k, v, wl, bl.reshape(1, H), ww,
                                   bw.reshape(1, H), scale)
        if variant == "th_v2":
            return TH.talking_heads_attention_bnc(q, k, v, wl, bl, ww, bw,
                                                  num_heads=H, scale=scale)
        if variant == "flash":
            return flash_attention_bhnd(q, k, v, scale=scale)
        raise ValueError(variant)

    rows = []
    for variant in ("th_v1", "th_xla", "th_v2", "flash"):
        qkv = qkv_c if variant == "th_v2" else qkv_b
        q0, k0, v0 = qkv[0], qkv[1], qkv[2]

        def make_run(length):
            @jax.jit
            def run(q, k, v):
                def one(c, i):
                    # re-key q each rep so XLA can't hoist; chain output
                    # back in so reps serialize like model layers
                    qq = q + (c[:1, :1] * 1e-24).reshape(
                        (1,) * (q.ndim - 2) + (1, 1)).astype(q.dtype)
                    o = q
                    for _ in range(LAYERS):
                        o = core(variant, qq, k, v).astype(q.dtype)
                        qq = o
                    return o.reshape(-1, o.shape[-1])[:2, :2], 0
                c, _ = jax.lax.scan(
                    one, jnp.zeros((2, 2), q0.dtype), jnp.arange(length))
                return c
            return lambda: run(q0, k0, v0)

        mins = []
        for length in CHUNKS:
            run = make_run(length)
            out = run()
            float(out[0, 0])
            best = float("inf")
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                out = run()
                float(out[0, 0])
                best = min(best, time.perf_counter() - t0)
            mins.append(best)
        per_rep = (mins[1] - mins[0]) / (CHUNKS[1] - CHUNKS[0])
        per_layer_us = 1e6 * per_rep / LAYERS
        r = {"variant": variant,
             "ms_per_24layer_batch": round(1000 * per_rep, 3),
             "us_per_layer": round(per_layer_us, 2)}
        print(json.dumps(r), flush=True)
        rows.append(r)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "th_core_probe.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "shape": {"B": B, "H": H, "N": N, "D": D},
                   "layers": LAYERS, "chunk_lengths": CHUNKS,
                   "rows": rows}, f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
