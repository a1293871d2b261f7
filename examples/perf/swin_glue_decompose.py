"""Decompose the swin_tiny GLUE floor (stem / merges / final head).

`swin_stage_decompose.json` (round 5) measured 1.73-1.78 ms/batch at
depths (0,0,0,0) — 20% of the swin_tiny forward — spent entirely outside
the blocks: patch-embed stem, 3 PatchMerging ops, final LN + avgpool.
This probe splits that floor by timing-only ablations at zero depths
(numerics garbage, shapes preserved):

- glue:      unmodified zero-depth model (baseline)
- no_stem:   patch embed (reshape+transpose+matmul+LN) -> broadcast of a
             zero map at the embedded shape
- no_merge:  PatchMerging -> strided-slice + channel self-concat (the
             2x2 gather, LN and reduction matmul removed; shapes kept)
- no_head:   final LayerNorm + token-mean -> one-pixel slice

Writes examples/perf/swin_glue_decompose.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 20
BS = 32
SIZE = 224


def bench(variant: str) -> float:
    import flax.linen as nn

    import vit_torch_tpu.models.swin as S
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer

    cfg = dataclasses.replace(SWIN_CONFIGS["swin_tiny_patch4_window7_224"],
                              depths=(0, 0, 0, 0), drop_path_rate=0.0)

    class _FakeMerge(nn.Module):
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            y = x[:, ::2, ::2]
            return jnp.concatenate([y, y], axis=-1)

    orig_merge = S.PatchMerging
    orig_ln = S.LayerNorm
    if variant == "no_merge":
        S.PatchMerging = _FakeMerge
    try:
        model = SwinTransformer(cfg, dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16))

        def fwd(variables, img):
            if variant == "no_stem":
                gh = SIZE // cfg.patch_size
                x = jnp.broadcast_to(
                    jnp.sum(img[:, :1, :1, :1]).astype(jnp.bfloat16),
                    (img.shape[0], gh, gh, cfg.embed_dim))
                # run only the post-stem part: merges + final norm/mean
                dim = cfg.embed_dim
                for li in range(len(cfg.depths) - 1):
                    x = S.PatchMerging(dtype=jnp.bfloat16)\
                        .bind({"params": variables["params"]
                               [f"layers_{li}_downsample"]})(x)
                    dim *= 2
                x = S.LayerNorm(dtype=jnp.bfloat16).bind(
                    {"params": variables["params"]["norm"]})(x)
                return jnp.mean(x, axis=(1, 2))
            return model.apply(variables, img, True)

        if variant == "no_head":
            base_apply = fwd
            fwd = lambda v, img: base_apply(v, img)[:, :1]  # noqa: E731

        @jax.jit
        def run_chunk(variables, images):
            def one(_, img):
                out = fwd(variables, img)
                if variant == "no_head":
                    pass
                return 0, out
            _, o = jax.lax.scan(one, 0, images)
            return o

        # no_head: cheaper to special-case by patching the model's tail is
        # messy — approximate by measuring glue minus (LN+mean) via
        # features_only mode instead
        if variant == "no_head":
            model2 = SwinTransformer(cfg, dtype=jnp.bfloat16,
                                     features_only=True)
            v2 = model2.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16))

            @jax.jit
            def run_chunk(variables, images):  # noqa: F811
                def one(_, img):
                    return 0, model2.apply(v2, img, True)[:, 0, 0]
                _, o = jax.lax.scan(one, 0, images)
                return o

        rng = np.random.default_rng(0)
        images = jax.device_put(rng.standard_normal(
            (STEPS, BS, SIZE, SIZE, 3),
            dtype=np.float32).astype(jnp.bfloat16))
        variables = jax.device_put(variables)
        out = run_chunk(variables, images)
        float(jnp.sum(out[-1, 0]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_chunk(variables, images)
            float(jnp.sum(out[-1, 0]))
            best = min(best, time.perf_counter() - t0)
        return best
    finally:
        S.PatchMerging = orig_merge
        S.LayerNorm = orig_ln


def main() -> None:
    results = {}
    for variant in ("glue", "no_stem", "no_merge", "no_head"):
        t = bench(variant)
        results[variant] = round(1000 * t / STEPS, 4)
        print(variant, results[variant], "ms/batch", flush=True)
    out = {"device": jax.devices()[0].device_kind, "bs": BS,
           "ms_per_batch": results,
           "note": "zero-depth swin_tiny; deltas vs 'glue' price each "
                   "glue component (timing-only ablations)"}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "swin_glue_decompose.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
