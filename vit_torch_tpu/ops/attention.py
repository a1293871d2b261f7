"""Multi-head attention compute op.

Single entry point ``dot_product_attention`` used by every backbone in the
zoo.  On TPU it dispatches to the Pallas flash-attention kernel
(:mod:`vit_torch_tpu.ops.flash_attention`) when shapes allow; otherwise it
falls back to a straightforward XLA softmax-attention that the compiler fuses
well.  Replaces the reference's cuDNN-backed ``nn.MultiheadAttention`` /
manual ``q @ k.T`` matmuls (e.g. reference ``models/swin.py:105-144``,
``models/cait.py:111-128``).

Layout convention: ``(batch, seq, heads, head_dim)`` (flax convention).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


import os


def _flash_min_seq() -> int:
    """Sequence-length threshold for dispatching to the Pallas kernel
    (override with VITX_FLASH_MIN_SEQ; 0 disables, 1 forces)."""
    return int(os.environ.get("VITX_FLASH_MIN_SEQ", "256"))


# --- sequence-parallel (ring attention) dispatch -------------------------
# When a mesh with a >1 ``seq`` axis is active (set by the sharded train
# path), dot_product_attention routes plain (bias-free) attention through
# ring attention so the token axis shards across devices.
_SEQ_MESH = []


class sequence_parallel:
    """Context manager activating ring-attention dispatch over ``mesh``
    (trace-time: wrap the model apply inside the jitted step)."""

    def __init__(self, mesh):
        self.mesh = mesh

    def __enter__(self):
        _SEQ_MESH.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _SEQ_MESH.pop()
        return False


def _active_seq_mesh():
    if _SEQ_MESH:
        mesh = _SEQ_MESH[-1]
        if mesh is not None and dict(mesh.shape).get("seq", 1) > 1:
            return mesh
    return None


def _active_data_extent() -> int:
    """Data-parallel extent of the mesh active at trace time (1 when
    unsharded).  Inside a GSPMD-sharded step the traced batch dim is the
    GLOBAL batch; dispatch heuristics tuned on per-chip batch (e.g. the
    fused attention block's B >= 64 crossover) must divide by this."""
    if _SEQ_MESH:
        mesh = _SEQ_MESH[-1]
        if mesh is not None:
            return max(1, dict(mesh.shape).get("data", 1))
    return 1


def flash_profitable(n: int, num_heads: int, head_dim: int) -> bool:
    """Shared crossover heuristic for the Pallas flash kernel (used by the
    dispatcher below AND models.layers._attn_bhnd_layout — keep ONE copy).

    Short ViT sequences fit comfortably in VMEM and XLA's fused
    softmax-attention is already near speed-of-light there; the fused kernel
    wins once the N×N score matrix stops fitting.  Wide models cross over
    earlier: at N=197 (224px / patch 16) the kernel path measured +5% for
    C=768 (deit_base 1912→2012 img/s) but −9% for C=384 (dino_vits16), so
    half-threshold sequences dispatch only when H·D ≥ 768."""
    threshold = _flash_min_seq()
    if threshold <= 0 or head_dim > 256:
        return False
    return (n >= threshold
            or (2 * n >= threshold and num_heads * head_dim >= 768))


def _use_pallas(q: jax.Array) -> bool:
    if jax.default_backend() not in ("tpu",):
        return False
    b, n, h, d = q.shape
    return flash_profitable(n, h, d)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """Scaled dot-product attention over ``(B, N, H, Dh)`` tensors.

    ``bias`` is an additive logits bias broadcastable to ``(B, H, Nq, Nk)``
    (used for Swin's relative position bias and shifted-window masks).
    ``mask`` is a boolean mask broadcastable to the same shape; ``False``
    positions are excluded.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    seq_mesh = _active_seq_mesh()
    if seq_mesh is not None and bias is None and mask is None:
        from vit_torch_tpu.ops.ring_attention import ring_attention
        return ring_attention(q, k, v, seq_mesh, scale=scale)
    if use_pallas is None:
        use_pallas = _use_pallas(q) and bias is None and mask is None
    if use_pallas:
        from vit_torch_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, scale=scale)
    return _xla_attention(q, k, v, scale=scale, bias=bias, mask=mask)


def _xla_attention(q, k, v, *, scale, bias=None, mask=None):
    orig_dtype = q.dtype
    # logits in fp32 for numerical stability regardless of compute dtype
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1).astype(orig_dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)
