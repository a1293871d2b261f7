"""Decompose the 32px/bs128 ViT-B finetune step (VERDICT r4 #6).

The reference's actual CIFAR operating point (dino_vitb8 finetune 32px
bs128, N=17 tokens) runs 39.4% MFU with the fused-attn kernel correctly
guarded OUT (N=17 pads to the 128-row chunk).  Before building a
narrow-chunk attention variant, measure what the attention actually
costs at N=17: timing-only ablations of the full train step (augment +
fwd + bwd + adamw, bench.py methodology, slope-safe 20-step dispatch):

- full:     unmodified
- no_attn:  Attention module -> identity (qkv/attn/proj removed)
- no_mlp:   Mlp -> identity
- no_ln:    LayerNorm -> identity
- no_aug:   train augmentation -> passthrough normalize

Writes examples/perf/vit32_step_decompose.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

CFG = {"name": "dino_vitb8 finetune 32px bs128", "arch": "dino_vitb8",
       "image_size": 32, "bs": 128, "lineareval": False,
       "baseline_img_s": None}


def bench_variant(variant: str) -> dict:
    import flax.linen as nn
    import jax.numpy as jnp

    import bench
    import vit_torch_tpu.models.layers as L

    class _IdentityMod(nn.Module):
        @nn.compact
        def __call__(self, x, *a, **kw):
            return x

    orig = {}

    def patch(name, repl):
        orig[name] = getattr(L, name)
        setattr(L, name, repl)

    if variant == "no_attn":
        patch("Attention", lambda *a, **kw: _IdentityMod())
    elif variant == "no_mlp":
        patch("Mlp", lambda *a, **kw: _IdentityMod())
    elif variant == "no_ln":
        patch("LayerNorm", lambda *a, **kw: _IdentityMod())
    elif variant == "no_aug":
        import vit_torch_tpu.data.augment as A
        orig_aug = A.make_train_augment

        def fake(mean, std, dtype=jnp.bfloat16):
            real = orig_aug(mean, std, dtype=dtype)
            del real
            def aug(rng, images):
                return images.astype(dtype)
            return aug
        A.make_train_augment = fake
        import vit_torch_tpu.data.datasets  # noqa: F401
    try:
        # Block/vit read L.Attention etc. at call time (module attribute),
        # so the patch takes effect through the zoo build inside
        r = bench.bench_config(dict(CFG, name=f"{CFG['name']} [{variant}]"))
        r["variant"] = variant
        return r
    finally:
        for name, mod in orig.items():
            setattr(L, name, mod)
        if variant == "no_aug":
            import vit_torch_tpu.data.augment as A
            A.make_train_augment = orig_aug


def main() -> None:
    import jax
    rows = []
    for variant in ("full", "no_attn", "no_mlp", "no_ln", "no_aug"):
        r = bench_variant(variant)
        rows.append(r)
        print(json.dumps({k: r[k] for k in
                          ("variant", "img_per_sec_chip")}), flush=True)
    out = {"device": jax.devices()[0].device_kind, "config": CFG,
           "rows": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "vit32_step_decompose.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
