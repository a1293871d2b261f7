"""XCiT backbone (Cross-Covariance Image Transformer).

Capability parity with the reference's XCiT (``models/xcit.py``): Fourier
positional encoding (``PositionalEncodingFourier:20-55``), conv patch-embed
stack of 3×3 stride-2 convs + BatchNorm (``:58-108``), Local Patch
Interaction depthwise convs (``LPI:111-141``), cross-covariance attention —
channel-wise attention with learnable per-head temperature and L2-normalized
q/k (``XCA:221-261``), ``ClassAttentionBlock`` with the ``tokens_norm``
variants (``:176-218``), and the 14 registered p16/p8 sizes (``:412-536``).
Note: the reference never wired xcit into its facade dispatch (SURVEY.md
§2a); this zoo does.

TPU notes:
- the reference's SyncBatchNorm becomes plain flax BatchNorm: under GSPMD
  jit the batch reductions are global across the data-sharded batch, which
  *is* SyncBN semantics without any process-group plumbing;
- the Fourier positional encoding depends only on (H, W) — it is computed
  from static iotas and folded by XLA into a constant per shape;
- XCA's d×d channel attention is linear in sequence length — the matmuls
  are (d, N)·(N, d) and (d, d)·(d, N), both MXU-friendly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.models.layers import (
    BatchNorm, Dtype, LayerNorm, Mlp, QDense, _use_w8a8, gelu_exact,
    trunc_normal_init,
)


@dataclasses.dataclass(frozen=True)
class XCiTConfig:
    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    eta: float = 1.0                 # LayerScale init
    tokens_norm: bool = True
    cls_attn_layers: int = 2
    use_pos: bool = True


def _x(**kw) -> XCiTConfig:
    return XCiTConfig(**kw)


# reference registrations models/xcit.py:412-536
XCIT_CONFIGS = {}
for _p in (16, 8):
    XCIT_CONFIGS.update({
        f"xcit_nano_12_p{_p}": _x(patch_size=_p, embed_dim=128, depth=12,
                                  num_heads=4, eta=1.0, tokens_norm=False),
        f"xcit_tiny_12_p{_p}": _x(patch_size=_p, embed_dim=192, depth=12,
                                  num_heads=4, eta=1.0),
        f"xcit_small_12_p{_p}": _x(patch_size=_p, embed_dim=384, depth=12,
                                   num_heads=8, eta=1.0),
        f"xcit_tiny_24_p{_p}": _x(patch_size=_p, embed_dim=192, depth=24,
                                  num_heads=4, eta=1e-5),
        f"xcit_small_24_p{_p}": _x(patch_size=_p, embed_dim=384, depth=24,
                                   num_heads=8, eta=1e-5),
        f"xcit_medium_24_p{_p}": _x(patch_size=_p, embed_dim=512, depth=24,
                                    num_heads=8, eta=1e-5),
        f"xcit_large_24_p{_p}": _x(patch_size=_p, embed_dim=768, depth=24,
                                   num_heads=16, eta=1e-5),
    })
XCIT_CONFIGS["xcit_test"] = _x(patch_size=8, embed_dim=32, depth=2,
                               num_heads=2)


def xcit_flops(config: XCiTConfig, image_size: int) -> int:
    """Analytic forward FLOPs per image (multiply-adds × 2), same convention
    as ``vit_flops``/``swin_flops``.  XCA attention is linear in N: the
    (d_h × d_h) covariance + apply matmuls cost ``4·N·d·d_h`` per block vs
    plain attention's ``4·N²·d``; LPI adds two depthwise 3×3 convs."""
    d, H = config.embed_dim, config.num_heads
    dh = d // H
    hidden = int(d * config.mlp_ratio)
    widths = ([d // 8, d // 4, d // 2, d] if config.patch_size == 16
              else [d // 4, d // 2, d])
    flops = 0
    cin, s = 3, image_size
    for w in widths:                                   # conv patch-embed stack
        s = (s + 1) // 2
        flops += 2 * s * s * w * cin * 9
        cin = w
    n = s * s
    per_block = (
        2 * n * d * 3 * d                              # qkv
        + 2 * n * dh * d * 2                           # XCA q·kᵀ + apply
        + 2 * n * d * d                                # proj
        + 2 * n * d * 9 * 2                            # LPI depthwise 3×3 ×2
        + 2 * n * d * hidden * 2)                      # MLP
    flops += config.depth * per_block
    nk = n + 1                                         # CA blocks see CLS
    per_ca = (
        2 * nk * d * 3 * d                             # fused qkv (all tokens)
        + 2 * 1 * nk * d * 2                           # CLS-query attn
        + 2 * 1 * d * d                                # proj
        + 2 * 1 * d * hidden * 2)                      # CLS-only MLP
    return flops + config.cls_attn_layers * per_ca


def fourier_pos_encoding(H: int, W: int, hidden_dim: int = 32,
                         temperature: float = 10000.0) -> jnp.ndarray:
    """Static (1, H, W, 2*hidden_dim) sine/cosine grid encoding (reference
    ``PositionalEncodingFourier`` semantics with an all-valid mask)."""
    scale = 2 * math.pi
    eps = 1e-6
    y = (jnp.arange(1, H + 1, dtype=jnp.float32)[:, None] / (H + eps)) * scale
    x = (jnp.arange(1, W + 1, dtype=jnp.float32)[None, :] / (W + eps)) * scale
    y = jnp.broadcast_to(y, (H, W))
    x = jnp.broadcast_to(x, (H, W))
    dim_t = jnp.arange(hidden_dim, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / hidden_dim)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    # interleave sin/cos over even/odd channels
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])],
                      axis=3).reshape(H, W, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])],
                      axis=3).reshape(H, W, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)[None]  # (1, H, W, 2h)


class ConvPatchEmbed(nn.Module):
    """3×3 stride-2 conv stack + BatchNorm (reference ``:58-108``).
    Input NHWC; returns (tokens, (Hp, Wp))."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        d = self.embed_dim
        if self.patch_size == 16:
            widths = [d // 8, d // 4, d // 2, d]
        elif self.patch_size == 8:
            widths = [d // 4, d // 2, d]
        else:
            raise ValueError("conv patch embed supports patch size 8 or 16")
        # NB: eval-mode BN folding (fold_conv_bn_eval) was tried here off
        # the stem-isolation probe (bn_fold −18% stem-level) and measured
        # e2e NEGATIVE (−1.7/−2.1% two runs, examples/perf/bn_fold_e2e.json)
        # — at these shapes XLA already fuses the BN affine into the GELU
        # epilogue pass, so folding saves nothing and perturbs the conv
        # fusion.  ResNet (BN+relu after every conv) keeps it at +21%.
        # e2e governs: module path here.
        for i, w in enumerate(widths):
            x = nn.Conv(w, (3, 3), strides=2, padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = BatchNorm(use_running_average=deterministic,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name=f"bn{i}")(x)
            if i < len(widths) - 1:
                x = gelu_exact(x)
        B, Hp, Wp, C = x.shape
        return x.reshape(B, Hp * Wp, C), (Hp, Wp)


class LPI(nn.Module):
    """Local Patch Interaction: depthwise 3×3 → GELU → BN → depthwise 3×3
    (reference ``:111-141``)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int], deterministic: bool = True):
        B, N, C = x.shape
        H, W = hw
        y = x.reshape(B, H, W, C)
        y = nn.Conv(C, (3, 3), padding=1, feature_group_count=C,
                    dtype=self.dtype, name="conv1")(y)
        y = gelu_exact(y)
        y = BatchNorm(use_running_average=deterministic, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        y = nn.Conv(C, (3, 3), padding=1, feature_group_count=C,
                    dtype=self.dtype, name="conv2")(y)
        return y.reshape(B, N, C)


def _l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize over the trailing axis in fp32 (reference
    ``F.normalize(dim=-1)`` semantics, eps-clamped)."""
    return x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                           keepdims=True), 1e-12)


def xca_core(qkv: jnp.ndarray, temperature: jnp.ndarray, num_heads: int,
             dtype: Dtype) -> jnp.ndarray:
    """The XCA math between the qkv and proj matmuls: L2-normalized d×d
    channel covariance, softmax, and the apply (reference ``XCA:221-261``).

    ``qkv`` is (B, N, 3C); returns (B, N, C).  Module-level so perf probes
    can ablate it and a fused-kernel dispatch can replace it wholesale —
    its FLOPs are ~2% of a block.

    Transpose-free formulation: the reference materializes channel-major
    (B, H, d, N) views of q/k/v, L2-normalizes them over N, and contracts
    over N — four full-tensor HBM transposes plus two norm sweeps.  Since
    ``normalize(q) · normalize(k)ᵀ == (q · kᵀ) / outer(|q|, |k|)``, the
    covariance is computed HERE directly from the (B, N, H, d) layout
    (einsum contracts the token axis in place) and the normalization is
    applied to the tiny (d, d) matrix afterward — exact same math modulo
    fp association, zero layout transposes (the XCA-glue ablation measured
    the channel-major round-trips at 8.3% of the xcit forward,
    ``examples/perf/xcit_overhead_ablation.json``)."""
    B, N, C3 = qkv.shape
    C = C3 // 3
    H, d = num_heads, C // num_heads
    qkv = qkv.reshape(B, N, 3, H, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B, N, H, d)
    # raw token-axis covariance (model dtype in, fp32 accumulate — the
    # same precision contract as every other attention logit here; the
    # reference's fp32-normalized-input dot differs only in where the
    # bf16 rounding lands), normalized on the d×d output
    cov = jnp.einsum("bnhd,bnhe->bhde", q, k,
                     preferred_element_type=jnp.float32)
    qn = jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=1), 1e-12)
    kn = jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=1), 1e-12)
    attn = cov / (qn[..., None] * kn[:, :, None, :])   # (B,H,d,1)·(B,H,1,e)
    attn = jax.nn.softmax(attn * temperature, axis=-1).astype(dtype)
    out = jnp.einsum("bhde,bnhe->bnhd", attn, v)
    return out.reshape(B, N, C)


class XCA(nn.Module):
    """Cross-covariance attention: d×d channel attention with L2-normalized
    q/k and learnable per-head temperature (reference ``XCA:221-261``)."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1), jnp.float32)
        quant = _use_w8a8(deterministic)   # int8 serving path
        qkv = QDense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                     kernel_init=trunc_normal_init, quant=quant,
                     name="qkv")(x)
        out = xca_core(qkv, temperature, self.num_heads, self.dtype)
        return QDense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                      quant=quant, name="proj")(out)


class XCABlock(nn.Module):
    """XCA → LPI → MLP, each with LayerScale (reference ``:268-293``)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    eta: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int], deterministic: bool = True):
        C = x.shape[-1]
        init = nn.initializers.constant(self.eta)
        g1 = self.param("gamma1", init, (C,), jnp.float32).astype(self.dtype)
        g2 = self.param("gamma2", init, (C,), jnp.float32).astype(self.dtype)
        g3 = self.param("gamma3", init, (C,), jnp.float32).astype(self.dtype)
        x = x + g1 * XCA(self.num_heads, self.qkv_bias, dtype=self.dtype,
                         name="attn")(
            LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x),
            deterministic)
        x = x + g3 * LPI(dtype=self.dtype, name="local_mp")(
            LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm3")(x), hw,
            deterministic)
        x = x + g2 * Mlp(int(C * self.mlp_ratio), dtype=self.dtype,
                         name="mlp")(
            LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x),
            deterministic)
        return x


class XCiTClassAttention(nn.Module):
    """CaiT-style class attention with fused qkv (reference
    ``ClassAttention:144-174``: qkv fused, q taken from token 0)."""

    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        d = C // H
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, d)
        q = qkv[:, :1, 0] * (d ** -0.5)                  # (B, 1, H, d)
        k, v = qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        cls = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, 1, C)
        cls = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(cls)
        return jnp.concatenate([cls, x[:, 1:]], axis=1)


class ClassAttentionBlock(nn.Module):
    """Reference ``ClassAttentionBlock:176-218`` incl. the tokens_norm
    variants and the cls-only MLP residual."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    eta: float = 1.0
    tokens_norm: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        C = x.shape[-1]
        init = nn.initializers.constant(self.eta)
        g1 = self.param("gamma1", init, (C,), jnp.float32).astype(self.dtype)
        g2 = self.param("gamma2", init, (C,), jnp.float32).astype(self.dtype)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = XCiTClassAttention(self.num_heads, self.qkv_bias,
                               dtype=self.dtype, name="attn")(y, deterministic)
        x = x + g1 * y
        norm2 = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        if self.tokens_norm:
            xn = norm2(x)
        else:
            xn = jnp.concatenate([norm2(x[:, :1]), x[:, 1:]], axis=1)
        # reference quirk kept for checkpoint parity (models/xcit.py:204-213,
        # == official facebookresearch/xcit): x_res is the *post-norm* tensor
        # and the residual concat re-adds the patch tokens, doubling them.
        cls = xn[:, :1] + g2 * Mlp(int(C * self.mlp_ratio), dtype=self.dtype,
                                   name="mlp")(xn[:, :1], deterministic)
        return jnp.concatenate([cls, 2.0 * xn[:, 1:]], axis=1)


class XCiT(nn.Module):
    config: XCiTConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        B = x.shape[0]
        x, (Hp, Wp) = ConvPatchEmbed(cfg.patch_size, cfg.embed_dim,
                                     dtype=self.dtype, name="patch_embed")(
                                         x, deterministic)
        if cfg.use_pos:
            pos = fourier_pos_encoding(Hp, Wp).reshape(1, Hp * Wp, 64)
            kernel = self.param("pos_proj_kernel", trunc_normal_init,
                                (64, cfg.embed_dim), jnp.float32)
            bias = self.param("pos_proj_bias", nn.initializers.zeros,
                              (cfg.embed_dim,), jnp.float32)
            x = x + (pos @ kernel + bias).astype(self.dtype)

        block_cls = XCABlock
        if self.remat:
            block_cls = nn.remat(XCABlock, static_argnums=(2, 3))
        for i in range(cfg.depth):
            x = block_cls(cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias,
                          cfg.eta, dtype=self.dtype,
                          name=f"blocks_{i}")(x, (Hp, Wp), deterministic)
        cls_token = self.param("cls_token", trunc_normal_init,
                               (1, 1, cfg.embed_dim), jnp.float32)
        cls = jnp.broadcast_to(cls_token.astype(self.dtype),
                               (B, 1, cfg.embed_dim))
        x = jnp.concatenate([cls, x], axis=1)
        for i in range(cfg.cls_attn_layers):
            x = ClassAttentionBlock(cfg.num_heads, cfg.mlp_ratio,
                                    cfg.qkv_bias, cfg.eta, cfg.tokens_norm,
                                    dtype=self.dtype,
                                    name=f"cls_attn_blocks_{i}")(
                                        x, deterministic)
        x = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x[:, 0]

    @property
    def feature_dim(self) -> int:
        return self.config.embed_dim


def _build_xcit(arch: str, image_channels: int, classifier, image_size: int,
                dtype, remat: bool):
    from vit_torch_tpu.models.layers import ClassifierHead
    from vit_torch_tpu.models.zoo import Classifier, ZooModel
    if arch not in XCIT_CONFIGS:
        raise ValueError(f"unknown xcit arch {arch!r}; have "
                         f"{sorted(XCIT_CONFIGS)}")
    cfg = XCIT_CONFIGS[arch]
    backbone = XCiT(cfg, dtype=dtype, remat=remat, name="backbone")
    head = (ClassifierHead(tuple(classifier), dtype=dtype, name="head")
            if classifier else None)
    return ZooModel(arch=arch, family="xcit",
                    model=Classifier(backbone, head),
                    feature_dim=cfg.embed_dim, patch_size=cfg.patch_size)


from vit_torch_tpu.models.zoo import register_family  # noqa: E402

register_family("xcit")(_build_xcit)
