"""Anchor: production flash_attention_bhnd in the same scan harness as the
round-3 micro variants (B=32,H=12,N=785,D=64 bf16).

Slope-timed (see slope_timing.py): the rep-count slope cancels the ~22 ms
per-dispatch tunnel floor the original length=10 average baked in."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from vit_torch_tpu.ops.flash_attention import flash_attention_bhnd

B, H, N, D = 32, 12, 785, 64
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(0, 1, (B, H, N, D)), jnp.bfloat16)

def make(length):
    @jax.jit
    def many(q, k, v):
        def body(c, _):
            return flash_attention_bhnd(c, k, v), ()
        out, _ = jax.lax.scan(body, q, None, length=length)
        return out
    return many

reps, trials, mins = (10, 60), 3, []
for r in reps:
    many = make(r)
    float(jnp.sum(many(q, k, v)))           # compile + warm, fence
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jnp.sum(many(q, k, v)))
        best = min(best, time.perf_counter() - t0)
    mins.append(best)
dt = (mins[1] - mins[0]) / (reps[1] - reps[0])
flops = 2 * B * H * (N * N * D * 2)
print(f"prod flash bhnd: {dt*1000:.3f} ms  {flops/dt/1e12:.1f} TF/s (N=785 useful)")
flops_p = 2 * B * H * (800 * 800 * D * 2)
print(f"               = {flops_p/dt/1e12:.1f} TF/s at padded-800 accounting")
