"""CaiT backbone (Class-Attention in image Transformers).

Capability parity with the reference's CaiT (``models/cait.py``):
Class-Attention — CLS-query-only attention (``Class_Attention:21-55``),
``LayerScale_Block_CA`` (``:57-84``), Talking-Heads attention with pre- and
post-softmax head mixing ``proj_l``/``proj_w`` (``Attention_talking_head:
87-128``), ``LayerScale_Block`` (``:130-150``), and the model assembly
(patch-embed + patch-only pos-embed + depth×SA blocks + 2 CA blocks + norm →
cls token, ``cait_models:155-253``) with the registered XXS24→M48 sizes
(``:255-480``).

TPU notes: talking-heads head mixing is an einsum over the (small) head
dimension fused by XLA into the attention matmul chain; LayerScale is an
elementwise scale folded into the residual add.  Param names mirror torch
for the importer (blocks_i / blocks_token_only_i / gamma_1 / ...).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.models.layers import (
    DenseParams, Dtype, LayerNorm, Mlp, PatchEmbed, trunc_normal_init,
)


def _use_fused_talking_heads(N: int, num_heads: int, head_dim: int) -> bool:
    """Dispatch to the fused talking-heads kernel (``ops/talking_heads.py``).
    VITX_FUSED_TH=1 forces it on (CPU interpret, golden tests), =0 off;
    default is TPU-only, shapes permitting."""
    import os
    flag = os.environ.get("VITX_FUSED_TH", "")
    if flag == "0":
        return False
    from vit_torch_tpu.ops.attention import _active_seq_mesh
    if _active_seq_mesh() is not None:
        # sequence-parallel mesh: yield to the sharded attention path like
        # the other kernel dispatchers (layers.py:158-173)
        return False
    if flag != "1" and jax.default_backend() != "tpu":
        return False
    from vit_torch_tpu.ops.talking_heads import fits
    return fits(N, num_heads, head_dim)


@dataclasses.dataclass(frozen=True)
class CaiTConfig:
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 24
    num_heads: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_scale: float = 1e-5
    depth_token_only: int = 2
    default_image_size: int = 224


def _c(**kw) -> CaiTConfig:
    return CaiTConfig(**kw)


# reference registrations models/cait.py:255-480 (lowercase timm naming; the
# reference's capitalized spellings are aliased below)
CAIT_CONFIGS = {
    "cait_xxs24_224": _c(),
    "cait_xxs24_384": _c(default_image_size=384),
    "cait_xxs36_224": _c(depth=36),
    "cait_xxs36_384": _c(depth=36, default_image_size=384),
    "cait_xs24_384": _c(embed_dim=288, num_heads=6, default_image_size=384),
    "cait_s24_224": _c(embed_dim=384, num_heads=8),
    "cait_s24_384": _c(embed_dim=384, num_heads=8, default_image_size=384),
    "cait_s36_384": _c(embed_dim=384, num_heads=8, depth=36, init_scale=1e-6,
                       default_image_size=384),
    "cait_m36_384": _c(embed_dim=768, num_heads=16, depth=36, init_scale=1e-6,
                       default_image_size=384),
    "cait_m48_448": _c(embed_dim=768, num_heads=16, depth=48, init_scale=1e-6,
                       default_image_size=448),
    # tiny smoke config
    "cait_test": _c(embed_dim=32, depth=2, num_heads=2, patch_size=8),
}
# reference capitalized aliases (cait_XXS24_224 etc.)
for _k in list(CAIT_CONFIGS):
    parts = _k.split("_")
    if len(parts) == 3:
        CAIT_CONFIGS[f"cait_{parts[1].upper()}_{parts[2]}"] = CAIT_CONFIGS[_k]


def cait_flops(config: CaiTConfig, image_size: int) -> int:
    """Analytic forward FLOPs per image (multiply-adds × 2), same convention
    as ``vit_flops``/``swin_flops``.  Counts the talking-heads (H, H) score
    mixes (pre+post softmax) in the SA blocks and the CLS-query-only
    class-attention blocks (q/MLP on one token, k/v over all)."""
    p, d, H = config.patch_size, config.embed_dim, config.num_heads
    n = (image_size // p) ** 2                         # SA blocks: no CLS
    hidden = int(d * config.mlp_ratio)
    flops = 2 * n * (p * p * 3) * d                    # patch embed
    per_sa = (
        2 * n * d * 3 * d                              # qkv
        + 2 * n * n * d * 2                            # QK^T + PV
        + 2 * n * n * H * H * 2                        # proj_l + proj_w mixes
        + 2 * n * d * d                                # out proj
        + 2 * n * d * hidden * 2)                      # MLP
    flops += config.depth * per_sa
    nk = n + 1                                         # CA blocks see CLS too
    per_ca = (
        2 * 1 * d * d + 2 * nk * d * d * 2             # q (CLS) + k/v
        + 2 * 1 * nk * d * 2                           # attn matmuls
        + 2 * 1 * d * d                                # proj
        + 2 * 1 * d * hidden * 2)                      # CLS-only MLP
    return flops + config.depth_token_only * per_ca


class TalkingHeadAttention(nn.Module):
    """Self-attention with pre/post-softmax head mixing (reference
    ``Attention_talking_head``, models/cait.py:87-128)."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        d = C // H
        w_qkv, b_qkv = DenseParams(3 * C, self.qkv_bias, name="qkv")(C)
        w_proj, b_proj = DenseParams(C, name="proj")(C)
        wl = self.param("proj_l_kernel", trunc_normal_init, (H, H), jnp.float32)
        bl = self.param("proj_l_bias", nn.initializers.zeros, (H,), jnp.float32)
        ww = self.param("proj_w_kernel", trunc_normal_init, (H, H), jnp.float32)
        bw = self.param("proj_w_bias", nn.initializers.zeros, (H,), jnp.float32)
        dt = self.dtype
        if _use_fused_talking_heads(N, H, d):
            # fused Pallas kernel: all heads' scores stay in VMEM across
            # QKᵀ → proj_l mix → softmax → proj_w mix → PV (the XLA path
            # materializes (B, H, N, N) fp32 score tensors in HBM around
            # each stage); head-major q/k/v via einsum, as in
            # models/layers.py:Attention
            from vit_torch_tpu.ops.talking_heads import (
                talking_heads_attention)
            w3 = w_qkv.astype(dt).reshape(C, 3, H, d)
            qh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 0])
            kh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 1])
            vh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 2])
            if b_qkv is not None:
                b3 = b_qkv.astype(dt).reshape(3, H, 1, d)
                qh, kh, vh = qh + b3[0], kh + b3[1], vh + b3[2]
            out = talking_heads_attention(qh, kh, vh, wl, bl, ww, bw,
                                          scale=d ** -0.5)
            out = jnp.einsum("bhnd,hdc->bnc", out,
                             w_proj.astype(dt).reshape(H, d, C))
            return out + b_proj.astype(dt)
        qkv = jnp.dot(x, w_qkv.astype(dt))
        if b_qkv is not None:
            qkv = qkv + b_qkv.astype(dt)
        qkv = qkv.reshape(B, N, 3, H, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        # pre-softmax head mixing (proj_l)
        logits = jnp.einsum("bhqk,hg->bgqk", logits, wl) + bl[None, :, None, None]
        attn = jax.nn.softmax(logits, axis=-1)
        # post-softmax head mixing (proj_w)
        attn = jnp.einsum("bhqk,hg->bgqk", attn, ww) + bw[None, :, None, None]
        out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v)
        out = out.reshape(B, N, C)
        return jnp.dot(out, w_proj.astype(dt)) + b_proj.astype(dt)


class ClassAttention(nn.Module):
    """CLS-query-only attention (reference ``Class_Attention``,
    models/cait.py:21-55): q from x[:,0], k/v from all tokens."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        d = C // H
        q = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="q")(x[:, :1])
        k = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="k")(x)
        v = nn.Dense(C, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="v")(x)
        q = q.reshape(B, 1, H, d) * (d ** -0.5)
        k = k.reshape(B, N, H, d)
        v = v.reshape(B, N, H, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, 1, C)
        return nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                        name="proj")(out)


class LayerScaleBlock(nn.Module):
    """Pre-norm block with LayerScale residual gating (reference
    ``LayerScale_Block``, models/cait.py:130-150)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_scale: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        C = x.shape[-1]
        init = nn.initializers.constant(self.init_scale)
        g1 = self.param("gamma_1", init, (C,), jnp.float32)
        g2 = self.param("gamma_2", init, (C,), jnp.float32)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = TalkingHeadAttention(self.num_heads, self.qkv_bias,
                                 dtype=self.dtype, name="attn")(y, deterministic)
        x = x + g1.astype(self.dtype) * y
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y, deterministic)
        return x + g2.astype(self.dtype) * y


class LayerScaleBlockCA(nn.Module):
    """Class-attention block updating only the CLS token (reference
    ``LayerScale_Block_CA``, models/cait.py:57-84)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_scale: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, x_cls, deterministic: bool = True):
        C = x.shape[-1]
        init = nn.initializers.constant(self.init_scale)
        g1 = self.param("gamma_1", init, (C,), jnp.float32)
        g2 = self.param("gamma_2", init, (C,), jnp.float32)
        u = jnp.concatenate([x_cls, x], axis=1)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(u)
        y = ClassAttention(self.num_heads, self.qkv_bias, dtype=self.dtype,
                           name="attn")(y, deterministic)
        x_cls = x_cls + g1.astype(self.dtype) * y
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x_cls)
        y = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(
            y, deterministic)
        return x_cls + g2.astype(self.dtype) * y


class CaiT(nn.Module):
    """CaiT backbone returning CLS features (B, embed_dim)."""

    config: CaiTConfig
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
        pos_embed = self.param("pos_embed", trunc_normal_init,
                               (1, n, cfg.embed_dim), jnp.float32)
        x = x + pos_embed.astype(self.dtype)

        block_cls = LayerScaleBlock
        if self.remat:
            block_cls = nn.remat(LayerScaleBlock, static_argnums=(2,))
        for i in range(cfg.depth):
            x = block_cls(cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias,
                          cfg.init_scale, dtype=self.dtype,
                          name=f"blocks_{i}")(x, deterministic)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype),
                               (B, 1, cfg.embed_dim))
        for i in range(cfg.depth_token_only):
            cls = LayerScaleBlockCA(cfg.num_heads, cfg.mlp_ratio,
                                    cfg.qkv_bias, cfg.init_scale,
                                    dtype=self.dtype,
                                    name=f"blocks_token_only_{i}")(
                                        x, cls, deterministic)
        x = jnp.concatenate([cls, x], axis=1)
        x = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0]

    @property
    def feature_dim(self) -> int:
        return self.config.embed_dim


def _build_cait(arch: str, image_channels: int, classifier, image_size: int,
                dtype, remat: bool):
    from vit_torch_tpu.models.layers import ClassifierHead
    from vit_torch_tpu.models.zoo import Classifier, ZooModel
    if arch not in CAIT_CONFIGS:
        raise ValueError(f"unknown cait arch {arch!r}; have "
                         f"{sorted(CAIT_CONFIGS)}")
    cfg = CAIT_CONFIGS[arch]
    backbone = CaiT(cfg, dtype=dtype, remat=remat, name="backbone")
    head = (ClassifierHead(tuple(classifier), dtype=dtype, name="head")
            if classifier else None)
    return ZooModel(arch=arch, family="cait",
                    model=Classifier(backbone, head),
                    feature_dim=cfg.embed_dim, patch_size=cfg.patch_size,
                    default_image_size=cfg.default_image_size)


from vit_torch_tpu.models.zoo import register_family  # noqa: E402

register_family("cait")(_build_cait)
