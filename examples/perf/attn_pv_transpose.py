"""Attention-kernel experiment (PERF.md gap: 27 vs ~98 TF/s shape ceiling).

Idea: the PV matmul emits a 64-wide axis (head_dim) — half the 128-lane MXU.
Computing o^T = v^T @ p^T instead emits N-wide (785→pad) and contracts N,
with the 64 on the sublane axis.  QK^T keeps its 64-deep contraction either
way (can't pack heads without mixing them), so the ceiling moves only for
the PV half — measure whether Mosaic actually schedules it faster.

Micro-bench: one (B·H) grid of single-program exact-softmax attention at the
headline shape (B=32, H=12, N=785, D=64, bf16), three variants:
  a) baseline: s = q k^T; p = softmax; o = p v               (current)
  b) pv_t:     o^T = v^T p^T, transpose o back
  c) both_t:   s^T = k q^T (same shapes), then o^T = v^T p^T

Slope-timed (see slope_timing.py): the rep-count slope cancels the ~22 ms
per-dispatch tunnel floor the original length=10 average baked in.
"""
import functools
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, N, D = 32, 12, 785, 64
NP = 800          # pad N to a sublane multiple


def kern_base(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def kern_pvt(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = (jnp.exp(s - m))
    l = jnp.sum(p, axis=-1, keepdims=True)
    pt = p.astype(v.dtype).T                       # (N, N) -> (N, N)
    vt = v.T                                       # (N, D) -> (D, N)
    ot = jax.lax.dot(vt, pt, preferred_element_type=jnp.float32)  # (D, N)
    o_ref[0] = (ot.T / l).astype(o_ref.dtype)


def kern_botht(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    # st = s^T: softmax over axis 0 now
    m = jnp.max(st, axis=0, keepdims=True)
    p = jnp.exp(st - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    vt = v.T
    ot = jax.lax.dot(vt, p.astype(v.dtype),
                     preferred_element_type=jnp.float32)          # (D, N)
    o_ref[0] = (ot / l).T.astype(o_ref.dtype)


def run(kern, name):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), jnp.bfloat16)
    spec = pl.BlockSpec((1, NP, D), lambda i: (i, 0, 0))

    f = pl.pallas_call(
        functools.partial(kern, scale=D ** -0.5),
        out_shape=jax.ShapeDtypeStruct((B * H, NP, D), jnp.bfloat16),
        grid=(B * H,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )

    def make(length):
        @jax.jit
        def many(q, k, v):
            def body(c, _):
                return f(c, k, v), ()
            out, _ = jax.lax.scan(body, q, None, length=length)
            return out
        return many

    reps, trials, mins = (10, 60), 3, []
    out = None
    for r in reps:
        many = make(r)
        out = many(q, k, v)
        float(jnp.sum(out))                 # compile + warm, fence
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = many(q, k, v)
            float(jnp.sum(out))
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    dt = (mins[1] - mins[0]) / (reps[1] - reps[0])
    flops = 2 * B * H * (NP * NP * D * 2)
    print(f"{name}: {dt * 1000:.3f} ms  {flops / dt / 1e12:.1f} TF/s",
          flush=True)
    return out


o1 = run(kern_base, "baseline (p·v)  ")
o2 = run(kern_pvt, "pv-transposed   ")
o3 = run(kern_botht, "both-transposed ")
print("max |o2-o1|:", float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                            - o2.astype(jnp.float32)))))
print("max |o3-o1|:", float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                            - o3.astype(jnp.float32)))))
