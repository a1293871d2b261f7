"""Vision Transformer (DINO-style) backbone.

Capability parity with the DINO hub models the reference pulls via
``torch.hub.load('facebookresearch/dino:main', arch)`` (reference
``models/vision_all.py:154-184``): ViT-S/B at patch 16 and 8, CLS token,
learned position embeddings, pre-norm blocks, final LayerNorm, CLS-token
feature output (head handled by the zoo facade).

TPU-first: NHWC input, patch embed as reshape+matmul, static shapes (position
embeddings are created for the instantiated grid; checkpoint import
interpolates 224-trained tables to the target grid on the host), blocks
run under optional ``jax.checkpoint`` for rematerialisation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.models.layers import (
    Block, Dtype, LayerNorm, PatchEmbed, trunc_normal_init,
)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0


VIT_CONFIGS = {
    # DINO self-supervised checkpoints (facebookresearch/dino)
    "dino_vits16": ViTConfig(patch_size=16, embed_dim=384, depth=12, num_heads=6),
    "dino_vits8": ViTConfig(patch_size=8, embed_dim=384, depth=12, num_heads=6),
    "dino_vitb16": ViTConfig(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "dino_vitb8": ViTConfig(patch_size=8, embed_dim=768, depth=12, num_heads=12),
    # tiny config for smoke tests / CI (not a reference arch)
    "vit_tiny_test": ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=2),
    # plain supervised ViTs (timm naming), same topology
    "vit_small_patch16": ViTConfig(patch_size=16, embed_dim=384, depth=12, num_heads=6),
    "vit_base_patch16": ViTConfig(patch_size=16, embed_dim=768, depth=12, num_heads=12),
    "vit_large_patch16": ViTConfig(patch_size=16, embed_dim=1024, depth=24, num_heads=16),
}


class VisionTransformer(nn.Module):
    """ViT backbone returning CLS-token features ``(B, embed_dim)``.

    ``remat`` wraps each block in ``jax.checkpoint`` — the TPU-native
    equivalent of the reference's (dormant) ``torch.utils.checkpoint`` flag
    (reference ``models/swin.py:390-391``).
    """

    config: ViTConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    return_all_tokens: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        B, H, W, C = x.shape
        x = PatchEmbed(cfg.patch_size, cfg.embed_dim, dtype=self.dtype,
                       name="patch_embed")(x)
        n_patches = x.shape[1]

        cls_token = self.param("cls_token", trunc_normal_init,
                               (1, 1, cfg.embed_dim), jnp.float32)
        pos_embed = self.param("pos_embed", trunc_normal_init,
                               (1, n_patches + 1, cfg.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype),
                               (B, 1, cfg.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos_embed.astype(self.dtype)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))
        # stochastic depth decays linearly over depth (timm convention)
        for i in range(cfg.depth):
            dpr = cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
            x = block_cls(cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
                          qkv_bias=cfg.qkv_bias, drop=cfg.drop_rate,
                          attn_drop=cfg.attn_drop_rate, drop_path_rate=dpr,
                          dtype=self.dtype, name=f"blocks_{i}")(x, deterministic)
        x = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if self.return_all_tokens:
            return x
        return x[:, 0]

    @property
    def feature_dim(self) -> int:
        return self.config.embed_dim


def vit_flops(config: ViTConfig, image_size: int,
              image_channels: int = 3, extra_tokens: int = 1) -> int:
    """Analytic forward FLOPs per image (multiply-adds × 2), same accounting
    convention as ``swin_flops`` and the reference's per-module ``flops()``
    methods (``models/swin.py:149-160``).  ``extra_tokens`` is the number of
    non-patch tokens (1 = CLS; DeiT distilled adds a distillation token)."""
    p, d = config.patch_size, config.embed_dim
    n_patch = (image_size // p) ** 2
    n = n_patch + extra_tokens
    flops = 2 * n_patch * (p * p * image_channels) * d    # patch embed
    per_block = (
        2 * n * d * 3 * d                             # qkv projection
        + 2 * n * n * d * 2                           # QK^T and PV matmuls
        + 2 * n * d * d                               # output projection
        + 2 * n * d * int(d * config.mlp_ratio) * 2   # MLP fc1+fc2
    )
    return flops + config.depth * per_block
