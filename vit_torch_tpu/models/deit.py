"""DeiT backbone (distillation-token ViT).

Capability parity with the reference's DeiT (``models/deit.py``):
``DistilledVisionTransformer`` — ViT with an extra distillation token and
dual heads averaged at inference (``:20-59``), the ``DeitCustom``/
``DeitCustomDistilled`` variants forcing head-averaging always (``:63-91``),
and the 8 registered configs (``:94-211``).  Note the reference facade marks
deit as NotImplemented (``models/vision_all.py:126-129``); this zoo wires it.

Head semantics here: the backbone returns the *averaged* (CLS + dist) token
features — the reference's ``DeitCustom`` forced-average behavior — so the
standard zoo classifier head applies on top.  Non-distilled deit configs are
plain ViTs and reuse the ViT backbone.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.models.layers import (
    Block, Dtype, LayerNorm, PatchEmbed, trunc_normal_init,
)
from vit_torch_tpu.models.vit import ViTConfig, VisionTransformer


DEIT_CONFIGS = {
    # (config, distilled)
    "deit_tiny_patch16_224": (ViTConfig(16, 192, 12, 3), False),
    "deit_small_patch16_224": (ViTConfig(16, 384, 12, 6), False),
    "deit_base_patch16_224": (ViTConfig(16, 768, 12, 12), False),
    "deit_base_patch16_384": (ViTConfig(16, 768, 12, 12), False),
    "deit_tiny_distilled_patch16_224": (ViTConfig(16, 192, 12, 3), True),
    "deit_small_distilled_patch16_224": (ViTConfig(16, 384, 12, 6), True),
    "deit_base_distilled_patch16_224": (ViTConfig(16, 768, 12, 12), True),
    "deit_base_distilled_patch16_384": (ViTConfig(16, 768, 12, 12), True),
    "deit_test_distilled": (ViTConfig(8, 64, 2, 2), True),
}


class DistilledVisionTransformer(nn.Module):
    """ViT with CLS + distillation tokens; returns averaged token features
    (reference ``models/deit.py:20-59`` + forced average ``:63-91``)."""

    config: ViTConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        B = x.shape[0]
        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=self.dtype,
                       name="patch_embed")(x)
        n = x.shape[1]
        cls_token = self.param("cls_token", trunc_normal_init,
                               (1, 1, cfg.embed_dim), jnp.float32)
        dist_token = self.param("dist_token", trunc_normal_init,
                                (1, 1, cfg.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed", trunc_normal_init,
                               (1, n + 2, cfg.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype), (B, 1, cfg.embed_dim))
        dist = jnp.broadcast_to(dist_token.astype(self.dtype), (B, 1, cfg.embed_dim))
        x = jnp.concatenate([cls, dist, x], axis=1) + pos_embed.astype(self.dtype)

        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))
        for i in range(cfg.depth):
            x = block_cls(cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                          qkv_bias=cfg.qkv_bias, dtype=self.dtype,
                          name=f"blocks_{i}")(x, deterministic)
        x = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        # averaged CLS/dist features (DeitCustom forced-average semantics)
        return (x[:, 0] + x[:, 1]) / 2

    @property
    def feature_dim(self) -> int:
        return self.config.embed_dim


def deit_flops(arch: str, image_size: int) -> int:
    """Analytic forward FLOPs per image (multiply-adds × 2) — plain ViT
    accounting with a second (distillation) token for distilled configs."""
    from vit_torch_tpu.models.vit import vit_flops
    cfg, distilled = DEIT_CONFIGS[arch]
    return vit_flops(cfg, image_size, extra_tokens=2 if distilled else 1)


def _build_deit(arch: str, image_channels: int, classifier, image_size: int,
                dtype, remat: bool):
    from vit_torch_tpu.models.layers import ClassifierHead
    from vit_torch_tpu.models.zoo import Classifier, ZooModel
    if arch not in DEIT_CONFIGS:
        raise ValueError(f"unknown deit arch {arch!r}; have "
                         f"{sorted(DEIT_CONFIGS)}")
    cfg, distilled = DEIT_CONFIGS[arch]
    if distilled:
        backbone = DistilledVisionTransformer(cfg, dtype=dtype, remat=remat,
                                              name="backbone")
    else:
        backbone = VisionTransformer(cfg, dtype=dtype, remat=remat,
                                     name="backbone")
    head = (ClassifierHead(tuple(classifier), dtype=dtype, name="head")
            if classifier else None)
    return ZooModel(arch=arch, family="deit",
                    model=Classifier(backbone, head),
                    feature_dim=cfg.embed_dim, patch_size=cfg.patch_size,
                    default_image_size=384 if "384" in arch else 224)


from vit_torch_tpu.models.zoo import register_family  # noqa: E402

register_family("deit")(_build_deit)
