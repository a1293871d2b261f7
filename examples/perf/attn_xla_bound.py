"""Upper-bound check: pure-XLA batched QK^T + PV at the headline shape, plus
a pallas variant with q-blocked grid (multiple programs per bh => pipelining).

Slope-timed (see slope_timing.py): per-op ms is the slope of scan wall time
over two rep counts, cancelling the ~22 ms per-dispatch tunnel floor.  The
original version averaged over length=10 (2.2 ms/rep of floor baked into
every row) — variants that read "13-16.5 TF/s" truly span ~2x wider."""
import functools, json, os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, N, D = 32, 12, 785, 64
NP = 800
BH = B * H

RESULTS = []

rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (BH, NP, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 1, (BH, NP, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0, 1, (BH, NP, D)), jnp.bfloat16)

def bench(f, name, *args, reps=(10, 60), trials=3):
    """Slope timing: the output feeds the next step's q (no hoisting),
    and the rep-count slope cancels every per-dispatch constant."""
    def make(length):
        @jax.jit
        def many(q, k, v):
            def body(c, _):
                return f(c, k, v), ()
            out, _ = jax.lax.scan(body, q, None, length=length)
            return out
        return many
    mins = []
    for r in reps:
        many = make(r)
        float(jnp.sum(many(*args)))         # compile + warm, D2H fence
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(jnp.sum(many(*args)))
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    dt = (mins[1] - mins[0]) / (reps[1] - reps[0])
    flops = 2 * BH * (NP * NP * D * 2)
    print(f"{name}: {dt*1000:.3f} ms  {flops/dt/1e12:.1f} TF/s", flush=True)
    RESULTS.append({"variant": name.strip(), "ms": round(dt * 1000, 4),
                    "tflops_s": round(flops / dt / 1e12, 2)})

def xla_attn(q, k, v):
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnm,bmd->bnd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)

def xla_mm(q, k, v):
    s = jnp.einsum("bnd,bmd->bnm", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    return jnp.einsum("bnm,bmd->bnd", s.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(jnp.bfloat16)

bench(xla_mm,   "XLA matmuls only", q, k, v)
bench(xla_attn, "XLA full attn   ", q, k, v)

# pallas with QB q-block grid: (bh, nq) programs, k/v full per program
for QB in (200, 400):
    def kern(q_ref, k_ref, v_ref, o_ref, *, scale):
        qq, kk, vv = q_ref[0], k_ref[0], v_ref[0]
        s = jax.lax.dot_general(qq, kk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot(p.astype(vv.dtype), vv,
                        preferred_element_type=jnp.float32)
        o_ref[0] = (o / l).astype(o_ref.dtype)
    f = pl.pallas_call(
        functools.partial(kern, scale=D ** -0.5),
        out_shape=jax.ShapeDtypeStruct((BH, NP, D), jnp.bfloat16),
        grid=(BH, NP // QB),
        in_specs=[pl.BlockSpec((1, QB, D), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, NP, D), lambda i, j: (i, 0, 0)),
                  pl.BlockSpec((1, NP, D), lambda i, j: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, QB, D), lambda i, j: (i, j, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")))
    bench(f, f"pallas qblock={QB:3d} ", q, k, v)

# pallas: 2 bh per program (wider batch per program)
for BB in (2, 4):
    def kern2(q_ref, k_ref, v_ref, o_ref, *, scale):
        qq, kk, vv = q_ref[...], k_ref[...], v_ref[...]
        s = jax.lax.dot_general(qq, kk, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(vv.dtype), vv,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[...] = (o / l).astype(o_ref.dtype)
    f = pl.pallas_call(
        functools.partial(kern2, scale=D ** -0.5),
        out_shape=jax.ShapeDtypeStruct((BH, NP, D), jnp.bfloat16),
        grid=(BH // BB,),
        in_specs=[pl.BlockSpec((BB, NP, D), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((BB, NP, D), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)))
    bench(f, f"pallas bh-block={BB} ", q, k, v)

# production flash_attention_bhnd (the model's head-major entry, unpadded
# N=785) at hb=1 vs hb=2 — VITX_FLASH_HEAD_BLOCK is read at trace time,
# and bench() re-jits per rep count
from vit_torch_tpu.ops.flash_attention import flash_attention_bhnd  # noqa: E402

q4 = q[:, :N].reshape(B, H, N, D)
k4 = k[:, :N].reshape(B, H, N, D)
v4 = v[:, :N].reshape(B, H, N, D)
for hb in ("1", "2"):
    os.environ["VITX_FLASH_HEAD_BLOCK"] = hb
    def prod(qq, kk, vv):
        return flash_attention_bhnd(qq, kk, vv)
    bench(prod, f"production flash hb={hb}", q4, k4, v4)
del os.environ["VITX_FLASH_HEAD_BLOCK"]

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "attn_xla_bound.json"), "w") as fp:
    json.dump({"shape": {"B": B, "H": H, "N": N, "N_pad": NP, "D": D},
               "method": "slope over rep counts (10, 60), min of 3 trials",
               "results": RESULTS}, fp, indent=1)
print("saved attn_xla_bound.json", flush=True)
