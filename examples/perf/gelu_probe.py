"""Exact-GELU formulation A/B on TPU (bf16, stem-sized activations).

``jax.nn.gelu(approximate=False)`` lowers through ``lax.erfc`` — the
xcit stem probe suggested bf16 erfc costs as much as an fp32-upcast erf
while a bf16 ``lax.erf`` is ~9% cheaper at stem shapes
(examples/perf/xcit_stem_probe.json: full 1.417 vs gelu_bf16 1.291
ms/batch).  This isolates the elementwise op itself, slope-timed
(per-rep = Δwall/Δreps over 20/120-rep scans) at (32, 112, 112, 48).

Variants:
- erfc_bf16: 0.5*x*erfc(-x/√2) in bf16 — production gelu_exact today
- erf_bf16:  0.5*x*(1+erf(x/√2)) in bf16 — torch's formulation
- erf_fp32:  same, erf evaluated in fp32 with casts
- tanh_bf16: the tanh approximation (flax default; NOT parity-safe)

Writes examples/perf/gelu_probe.json.
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

CHUNKS = (20, 120)
TRIALS = 3
SHAPE = (32, 112, 112, 48)
SQRT_HALF = 0.7071067811865476


def _erfc_bf16(x):
    return 0.5 * x * jax.lax.erfc(-x * SQRT_HALF)


def _erf_bf16(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x * SQRT_HALF))


def _erf_fp32(x):
    x32 = x.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + jax.lax.erf(x32 * SQRT_HALF))).astype(x.dtype)


def _tanh_bf16(x):
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


VARIANTS = {"erfc_bf16": _erfc_bf16, "erf_bf16": _erf_bf16,
            "erf_fp32": _erf_fp32, "tanh_bf16": _tanh_bf16}


def bench(name: str) -> dict:
    fn = VARIANTS[name]
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal(SHAPE, dtype=np.float32) * 2, jnp.bfloat16))
    mins = []
    for length in CHUNKS:
        @jax.jit
        def run(x):
            def one(c, _):
                # data-dependent chain so reps cannot collapse; keep the
                # perturbation in x's dtype or the whole op promotes to f32.
                # The carry must consume EVERY element (jnp.sum) — a single
                # element lets XLA dead-code the rest of the map (the first
                # run of this probe "measured" 10 Telem/s that way)
                y = fn(x + c.astype(x.dtype))
                return jnp.sum(y.astype(jnp.float32)) * 1e-9, 0
            c, _ = jax.lax.scan(one, jnp.float32(0), None, length=length)
            return c
        float(run(x))
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            float(run(x))
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    dt = (mins[1] - mins[0]) / (CHUNKS[1] - CHUNKS[0])
    n = int(np.prod(SHAPE))
    return {"variant": name, "us_per_rep": round(1e6 * dt, 2),
            "gelem_s": round(n / dt / 1e9, 1)}


def main() -> None:
    # numerics: max |erf-form - erfc-form| in bf16 over the sampled range
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(4096, np.float32) * 3, jnp.bfloat16)
    diff = jnp.max(jnp.abs(_erf_bf16(x).astype(jnp.float32)
                           - _erfc_bf16(x).astype(jnp.float32)))
    results = [bench(v) for v in VARIANTS]
    for r in results:
        print(json.dumps(r), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "gelu_probe.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind, "shape": SHAPE,
                   "chunk_lengths": CHUNKS,
                   "erf_vs_erfc_max_abs_diff_bf16": float(diff),
                   "results": results}, f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
