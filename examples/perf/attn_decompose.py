"""Decompose the exact-softmax attention kernel's time: matmuls-only vs
softmax-only vs full, plus bf16-exp and no-max variants.

Slope-timed (see slope_timing.py): the rep-count slope cancels the ~22 ms
per-dispatch tunnel floor the original length=10 average baked in."""
import functools, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, N, D = 32, 12, 785, 64
NP = 800

def kern_mm_only(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    o = jax.lax.dot(s.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)

def kern_full(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)

def kern_nomax(q_ref, k_ref, v_ref, o_ref, *, scale):
    # inputs are N(0,1): s*scale bounded ~ +-8; exp safe without max-sub
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)

def kern_bf16exp(q_ref, k_ref, v_ref, o_ref, *, scale):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp((s - m).astype(jnp.bfloat16))
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)

def kern_exp2(q_ref, k_ref, v_ref, o_ref, *, scale):
    # exp(x) = 2^(x*log2e); exp2 may map better to the VPU
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * (scale * 1.4426950408889634)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)

def run(kern, name):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B * H, NP, D)), jnp.bfloat16)
    spec = pl.BlockSpec((1, NP, D), lambda i: (i, 0, 0))
    f = pl.pallas_call(
        functools.partial(kern, scale=D ** -0.5),
        out_shape=jax.ShapeDtypeStruct((B * H, NP, D), jnp.bfloat16),
        grid=(B * H,), in_specs=[spec, spec, spec], out_specs=spec,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)))
    def make(length):
        @jax.jit
        def many(q, k, v):
            def body(c, _):
                return f(c, k, v), ()
            out, _ = jax.lax.scan(body, q, None, length=length)
            return out
        return many
    reps, trials, mins = (10, 60), 3, []
    for r in reps:
        many = make(r)
        out = many(q, k, v); float(jnp.sum(out))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = many(q, k, v); float(jnp.sum(out))
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    dt = (mins[1] - mins[0]) / (reps[1] - reps[0])
    flops = 2 * B * H * (NP * NP * D * 2)
    print(f"{name}: {dt*1000:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)
    return out

o_mm = run(kern_mm_only, "matmuls only    ")
o1 = run(kern_full,    "full softmax    ")
o2 = run(kern_nomax,   "no max-subtract ")
o3 = run(kern_bf16exp, "bf16 exp        ")
o4 = run(kern_exp2,    "exp2            ")
for nm, o in (("nomax", o2), ("bf16exp", o3), ("exp2", o4)):
    print(f"max |{nm}-full|:", float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o.astype(jnp.float32)))))
