"""Locate cait_s24_224's e2e-vs-shape-bound gap (PERF.md cait/xcit
ledger: e2e ~23% MFU vs a 38.8% HBM-clamped unfused bound).

Timing-only ablations (numerics garbage, shapes and schedule preserved),
slope-timed (per-batch = Δwall/Δscan-length over 10/40-step chunks):

- no_ln:           every LayerNorm -> Identity (2 per block + final)
- th_passthrough:  the fused talking-heads kernel -> returns q (keeps the
                   head-major qkv einsums + proj matmul; removes the
                   QKᵀ/mix/softmax/PV attention core)
- th_xla:          VITX_FUSED_TH=0 — the XLA talking-heads chain instead
                   of the Pallas kernel (A/B of the kernel itself)
- no_ca:           both ClassAttention blocks -> identity on the CLS row
- no_patch_embed:  PatchEmbed conv -> broadcast slice
- all_off:         no_ln + th_passthrough + no_ca + no_patch_embed

Writes examples/perf/cait_overhead_ablation.json.
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
BS = int(os.environ.get("CAIT_PROBE_BS", "32"))
SIZE = int(os.environ.get("CAIT_PROBE_SIZE", "224"))
ARCH = os.environ.get("CAIT_PROBE_ARCH", "cait_s24_224")


class _NoCA(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        return x[:, :1]


class _NoPatchEmbed(nn.Module):
    patch_size: int = 16
    embed_dim: int = 384
    use_bias: bool = True
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        s = x.shape[1] // self.patch_size
        t = jnp.broadcast_to(x[:, :s, :s, :1],
                             (B, s, s, self.embed_dim)).astype(self.dtype)
        return t.reshape(B, s * s, self.embed_dim)


def bench(variant: str) -> dict:
    import vit_torch_tpu.models.cait as Cm
    import vit_torch_tpu.models.layers as L
    import vit_torch_tpu.ops.talking_heads as TH
    from vit_torch_tpu.models import VisionModelZoo

    all_off = variant == "all_off"
    orig = (Cm.LayerNorm, TH.talking_heads_attention, Cm.ClassAttention,
            Cm.PatchEmbed, os.environ.get("VITX_FUSED_TH"))
    if variant == "no_ln" or all_off:
        Cm.LayerNorm = lambda **kw: L.Identity()
    if variant == "th_passthrough" or all_off:
        # keep qkv/proj matmuls; drop the attention core.  The call site
        # imports inside the function, so patch the source module.
        TH.talking_heads_attention = \
            lambda q, k, v, wl, bl, ww, bw, scale: q
    if variant == "th_xla":
        os.environ["VITX_FUSED_TH"] = "0"
    if variant == "no_ca" or all_off:
        Cm.ClassAttention = _NoCA
    if variant == "no_patch_embed" or all_off:
        Cm.PatchEmbed = _NoPatchEmbed
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
        (Cm.LayerNorm, TH.talking_heads_attention, Cm.ClassAttention,
         Cm.PatchEmbed) = orig[:4]
        if orig[4] is None:
            os.environ.pop("VITX_FUSED_TH", None)
        else:
            os.environ["VITX_FUSED_TH"] = orig[4]


def main() -> None:
    results = []
    for variant in ("baseline", "no_ln", "th_passthrough", "th_xla",
                    "no_ca", "no_patch_embed", "all_off"):
        r = bench(variant)
        print(json.dumps(r), flush=True)
        results.append(r)
    base = results[0]["ms_per_batch"]
    for r in results[1:]:
        r["saved_pct"] = round(100 * (base - r["ms_per_batch"]) / base, 1)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cait_overhead_ablation.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind, "arch": ARCH,
                   "bs": BS, "chunk_lengths": CHUNKS,
                   "results": results}, f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
