"""Ring attention — context/sequence-parallel attention over the mesh
``seq`` axis.

The reference has no sequence parallelism (SURVEY.md §5: max 2305 tokens);
this is the committed scale-out extension (§2c, §7 step 8) for large-image
ViT-B/8 configs: shard the sequence across devices, rotate K/V shards around
the ring with ``ppermute`` while accumulating an online softmax — the KV
transfer rides ICI point-to-point and overlaps with the attention matmuls.

Non-causal (ViT attention is bidirectional).  Built on ``shard_map`` so it
composes with the data/model axes of the same mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _local_ring(q, k, v, *, scale: float, axis_name: str, axis_size: int,
                kv_len: int):
    """Per-shard body: q/k/v are local sequence shards (B, n, H, D).
    ``kv_len`` is the true (unpadded) global sequence length — keys at
    global positions ≥ kv_len are padding and get masked out."""
    B, nq, H, D = q.shape
    qf = q.astype(jnp.float32)
    o = jnp.zeros((B, H, nq, D), jnp.float32)
    m = jnp.full((B, H, nq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((B, H, nq, 1), jnp.float32)
    kb, vb = k, v
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    my_idx = jax.lax.axis_index(axis_name)
    padded = kv_len < nq * axis_size

    for step in range(axis_size):
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kb.astype(jnp.float32)) * scale
        if padded:
            # kb at this step originated on shard (my_idx - step) mod size
            src = (my_idx - step) % axis_size
            col = src * nq + jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, nq), 3)
            s = jnp.where(col < kv_len, s, -jnp.inf)
        m_blk = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_blk)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o = o * alpha + jnp.einsum("bhqk,bkhd->bhqd",
                                   p, vb.astype(jnp.float32))
        m = m_new
        if step < axis_size - 1:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)
    out = o / jnp.maximum(l, 1e-30)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)      # (B, n, H, D)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh: Mesh,
                   *, scale: Optional[float] = None,
                   axis_name: str = "seq") -> jax.Array:
    """Sequence-parallel attention over ``(B, N, H, D)`` tensors whose
    sequence dimension is sharded on ``mesh[axis_name]``."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    axis_size = mesh.shape[axis_name]
    if axis_size == 1:
        from vit_torch_tpu.ops.attention import _xla_attention
        return _xla_attention(q, k, v, scale=scale)
    N = q.shape[1]
    n_pad = (-N) % axis_size
    if n_pad:
        # pad the token axis to an even shard split; padded keys are masked
        # in-kernel, padded query rows are sliced off below
        pad = ((0, 0), (0, n_pad), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    spec = P(None, axis_name, None, None)
    fn = functools.partial(_local_ring, scale=float(scale),
                           axis_name=axis_name, axis_size=int(axis_size),
                           kv_len=int(N))
    out = shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                    out_specs=spec)(q, k, v)
    return out[:, :N] if n_pad else out
