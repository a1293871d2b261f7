"""Locate xcit_small_12_p16's e2e-vs-shape-bound gap (PERF.md cait/xcit
ledger: e2e 17.4% MFU vs a 57% HBM-clamped unfused bound — the widest gap
in the zoo).

Timing-only ablations (numerics garbage, shapes and schedule preserved)
of the non-matmul machinery, slope-timed (per-batch = Δwall/Δscan-length
over 10/40-step chunks — see slope_timing.py for why single-length
averages are poisoned by the ~22 ms dispatch floor):

- no_ln:            every LayerNorm -> Identity (3 per XCA block)
- no_l2norm:        STALE since the transpose-free xca_core rewrite
                    (models/xcit.py): the covariance is normalized on the
                    (d, d) output now, so patching _l2_normalize is a
                    no-op — expect 0; kept for continuity with the
                    recorded round-3 numbers
- xca_passthrough:  xca_core -> a (B, N, C) slice of the qkv output
                    (removes the channel-major transposes, norms, d×d
                    covariance softmax and apply; keeps qkv+proj matmuls)
- no_lpi:           the LPI depthwise-conv block -> identity
- no_stem:          conv patch-embed stack -> broadcast slice (stem is
                    ~16% of model FLOPs at the slowest measured rates)
- all_off:          all of the above

Writes examples/perf/xcit_overhead_ablation.json.
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
from flax import linen as nn

CHUNKS = (10, 40)
TRIALS = 3
BS = 32
SIZE = 224
ARCH = "xcit_small_12_p16"


class _NoLPI(nn.Module):
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw, deterministic: bool = True):
        return x


class _NoStem(nn.Module):
    patch_size: int
    embed_dim: int
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        s = x.shape[1] // self.patch_size
        t = jnp.broadcast_to(x[:, :s, :s, :1],
                             (B, s, s, self.embed_dim)).astype(self.dtype)
        return t.reshape(B, s * s, self.embed_dim), (s, s)


def bench(variant: str) -> dict:
    import vit_torch_tpu.models.layers as L
    import vit_torch_tpu.models.xcit as X
    from vit_torch_tpu.models import VisionModelZoo

    all_off = variant == "all_off"
    orig = (X.LayerNorm, X._l2_normalize, X.xca_core, X.LPI,
            X.ConvPatchEmbed)
    if variant == "no_ln" or all_off:
        X.LayerNorm = lambda **kw: L.Identity()
    if variant == "no_l2norm" or all_off:
        X._l2_normalize = lambda x: x
    if variant == "xca_passthrough" or all_off:
        X.xca_core = (lambda qkv, temperature, num_heads, dtype:
                      qkv[..., :qkv.shape[-1] // 3])
    if variant == "no_lpi" or all_off:
        X.LPI = _NoLPI
    if variant == "no_stem" or all_off:
        X.ConvPatchEmbed = _NoStem
    try:
        zm = VisionModelZoo.get_model(ARCH, classifier=[512, 10],
                                      image_size=SIZE, dtype=jnp.bfloat16)
        variables = jax.device_put(zm.init(jax.random.PRNGKey(0),
                                           image_size=SIZE))
        apply_fn = zm.model.apply
        rng = np.random.default_rng(0)
        images = jax.device_put(rng.standard_normal(
            (max(CHUNKS), BS, SIZE, SIZE, 3),
            dtype=np.float32).astype(jnp.bfloat16))

        mins = []
        for length in CHUNKS:
            @jax.jit
            def run_chunk(variables, images):
                def one(_, img):
                    return 0, apply_fn(variables, img, True)
                _, logits = jax.lax.scan(one, 0, images[:length])
                return logits
            out = run_chunk(variables, images)
            float(out[-1, 0, 0])                      # compile + D2H fence
            best = float("inf")
            for _ in range(TRIALS):
                t0 = time.perf_counter()
                out = run_chunk(variables, images)
                float(out[-1, 0, 0])
                best = min(best, time.perf_counter() - t0)
            mins.append(best)
        dt = (mins[1] - mins[0]) / (CHUNKS[1] - CHUNKS[0])
        return {"variant": variant,
                "img_per_sec": round(BS / dt, 2),
                "ms_per_batch": round(1000 * dt, 3)}
    finally:
        (X.LayerNorm, X._l2_normalize, X.xca_core, X.LPI,
         X.ConvPatchEmbed) = orig


def main() -> None:
    results = []
    for variant in ("baseline", "no_ln", "no_l2norm", "xca_passthrough",
                    "no_lpi", "no_stem", "all_off"):
        r = bench(variant)
        print(json.dumps(r), flush=True)
        results.append(r)
    base = results[0]["ms_per_batch"]
    for r in results[1:]:
        r["saved_pct"] = round(100 * (base - r["ms_per_batch"]) / base, 1)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "xcit_overhead_ablation.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind, "arch": ARCH,
                   "bs": BS, "chunk_lengths": CHUNKS,
                   "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
