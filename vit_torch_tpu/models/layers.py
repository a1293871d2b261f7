"""Shared transformer building blocks for the model zoo.

TPU-first design notes:
- NHWC / channels-last layouts everywhere.
- Patch embedding is a reshape + matmul (not a conv): a stride==kernel conv
  is exactly a blocked matmul, and expressing it as ``reshape → dot`` maps
  straight onto the MXU with no conv lowering.
- Attention goes through :func:`vit_torch_tpu.ops.dot_product_attention`
  (Pallas flash kernel on TPU, fused XLA fallback elsewhere).
- Params are float32; activations run in the module's ``dtype`` (bfloat16 by
  default) with fp32 softmax/LayerNorm accumulation.

Capability parity: the reference's per-model copies of Mlp/Attention/
PatchEmbed/DropPath (timm-derived, e.g. reference ``models/cait.py:87-150``,
``models/swin.py:410-455``) collapse into this single module.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch's ``nn.GELU()`` default. flax's ``nn.gelu``
    defaults to the tanh approximation, which breaks logits parity."""
    return nn.gelu(x, approximate=False)


import functools as _functools

# torch nn.LayerNorm uses eps=1e-5 (flax defaults to 1e-6) — required for
# logits parity with imported checkpoints
LayerNorm = _functools.partial(nn.LayerNorm, epsilon=1e-5)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return x


def drop_path(x: jax.Array, rate: float, deterministic: bool,
              rng: Optional[jax.Array]) -> jax.Array:
    """Stochastic depth: drop the whole residual branch per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)


class Mlp(nn.Module):
    """Transformer MLP: Dense → GELU → Dense (+dropout)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    act: Callable = gelu_exact

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Standard multi-head self-attention with a single fused QKV projection."""

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        head_dim = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       kernel_init=trunc_normal_init, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = self.qk_scale or head_dim ** -0.5
        out = dot_product_attention(q, k, v, scale=scale)
        out = out.reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init,
                       name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-norm transformer block: x + attn(LN(x)); x + mlp(LN(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, qkv_bias=self.qkv_bias,
                      qk_scale=self.qk_scale, attn_drop=self.attn_drop,
                      proj_drop=self.drop, dtype=self.dtype, name="attn")(
                          y, deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(dim * self.mlp_ratio), dropout=self.drop,
                dtype=self.dtype, name="mlp")(y, deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)
        return x


class PatchEmbed(nn.Module):
    """Image-to-patch embedding as reshape + matmul (MXU-native).

    Equivalent to the reference's stride==kernel ``nn.Conv2d`` patch embed
    (reference ``models/swin.py:410-455``; DINO ViT ``patch_embed.proj``
    proven Conv2d at ``models/vision_all.py:161-167``) — the conv kernel maps
    to our ``(p*p*C, D)`` matrix with layout ``(p, p, C) → flattened``.
    Input: NHWC. Output: ``(B, H/p * W/p, D)``.
    """

    patch_size: int
    embed_dim: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, f"image {H}x{W} not divisible by patch {p}"
        gh, gw = H // p, W // p
        x = x.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)          # (B, gh, gw, p, p, C)
        x = x.reshape(B, gh * gw, p * p * C)
        kernel = self.param("kernel", trunc_normal_init,
                            (p * p * C, self.embed_dim), jnp.float32)
        x = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.embed_dim,), jnp.float32)
            x = x + bias.astype(self.dtype)
        return x

    @staticmethod
    def grid_size(image_size: int, patch_size: int) -> Tuple[int, int]:
        return image_size // patch_size, image_size // patch_size


class ClassifierHead(nn.Module):
    """MLP classifier head with the reference's exact construction semantics:
    GELU between Linears, bias disabled on the last layer
    (reference ``models/vision_all.py:300-320``).

    ``units`` is the full stack including the final class count, i.e. the
    reference's ``classifier=[*fc, num_labels]``.
    """

    units: Sequence[int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n = len(self.units)
        for i, u in enumerate(self.units):
            is_last = i == n - 1
            x = nn.Dense(u, use_bias=not is_last, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name=f"fc{i}")(x)
            if not is_last:
                x = gelu_exact(x)
        return x
