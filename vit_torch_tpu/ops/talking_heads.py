"""Fused talking-heads attention Pallas TPU kernel (CaiT).

CaiT's self-attention mixes heads BEFORE and AFTER the softmax
(reference ``models/cait.py:87-128`` ``Attention_talking_head``:
``proj_l``/``proj_w`` (H, H) mixes), which couples all heads at every
score element — the XLA path therefore materializes the full
``(B, H, N, N)`` fp32 score tensor in HBM around each mix/softmax stage.
This kernel keeps all H heads' scores resident in VMEM for one batch
element at a time: QKᵀ per head, the two (H, H) mixes as scaled
accumulations over the per-head score tiles, an exact softmax, and PV —
HBM traffic is just q/k/v in and the attention output out.

Layout: ``(B, H, N, D)`` head-major (same as ``flash_attention_bhnd``).
Padded key masking supports any N (scores column-masked past ``kv_len``).

Backward: custom VJP recomputing through the XLA einsum reference —
pure-fwd optimization (CaiT linear-eval gets the full win).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_torch_tpu.ops.flash_attention import _interpret, _round_up

_LANE = 128
# per-program fp32 score stacks: 4 lists of H × (N, N_pad) tiles
_VMEM_BUDGET = 11 * 1024 * 1024


def fits(N: int, num_heads: int, head_dim: int) -> bool:
    """True when one batch element's talking-heads stacks fit VMEM.

    Estimates peak residency at the kernel's PADDED shapes (the wrapper
    pads N to a 16 multiple; Mosaic pads lanes to 128): the ``s`` and
    ``probs`` lists (H fp32 tiles each) are live simultaneously with the
    per-g mix accumulators, plus double-buffered q/k/v/o IO blocks.

    This bound admits some shapes the pre-round-3 4-stack estimate
    rejected; the frontier was validated empirically on v5e — near-budget
    shapes (N=256 H=8 D=48 at 10.5 of 11 MB, N=240 H=8 D=64) compile and
    match the XLA reference on-chip, no Mosaic scoped-VMEM overflow."""
    rows = _round_up(N, 16)
    cols = _round_up(N, _LANE)
    dp = _round_up(head_dim, _LANE)
    # s + probs lists + mix accumulator headroom: 3 H-deep fp32 stacks
    scores = 3 * num_heads * rows * cols * 4
    qkv_io = 2 * 4 * num_heads * rows * dp * 2
    return scores + qkv_io <= _VMEM_BUDGET


def _kernel(q_ref, k_ref, v_ref, wl_ref, bl_ref, ww_ref, bw_ref, o_ref, *,
            scale: float, kv_len: int):
    H, N = q_ref.shape[1], q_ref.shape[2]
    s = []
    for h in range(H):
        sh = jax.lax.dot_general(
            q_ref[0, h], k_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # (N, N)
        s.append(sh)
    wl = wl_ref[...].astype(jnp.float32)
    bl = bl_ref[...].astype(jnp.float32)
    ww = ww_ref[...].astype(jnp.float32)
    bw = bw_ref[...].astype(jnp.float32)
    probs = []
    for g in range(H):
        sm = bl[0, g]
        for h in range(H):
            sm = sm + s[h] * wl[h, g]     # pre-softmax mix reads ALL of s
        if kv_len < N:
            col = jax.lax.broadcasted_iota(jnp.int32, sm.shape, 1)
            sm = jnp.where(col < kv_len, sm, -1e30)
        m = jnp.max(sm, axis=-1, keepdims=True)
        p = jnp.exp(sm - m)
        probs.append(p / jnp.sum(p, axis=-1, keepdims=True))
    for g in range(H):
        pm = bw[0, g]
        for h in range(H):
            pm = pm + probs[h] * ww[h, g]
        o = jax.lax.dot(pm.astype(v_ref.dtype), v_ref[0, g],
                        preferred_element_type=jnp.float32)
        o_ref[0, g] = o.astype(o_ref.dtype)


def _fwd_impl(q, k, v, wl, bl, ww, bw, scale, kv_len):
    B, H, N, D = q.shape
    spec = pl.BlockSpec((1, H, N, D), lambda b: (b, 0, 0, 0))
    wspec = pl.BlockSpec((H, H), lambda b: (0, 0))
    bspec = pl.BlockSpec((1, H), lambda b: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, kv_len=kv_len),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        grid=(B,),
        in_specs=[spec, spec, spec, wspec, bspec, wspec, bspec],
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(q, k, v, wl, bl, ww, bw)


def _ref_forward(q, k, v, wl, bl, ww, bw, scale, kv_len=None):
    """XLA einsum path (mirrors TalkingHeadAttention's math)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.einsum("bhqk,hg->bgqk", logits, wl.astype(jnp.float32))
    logits = logits + bl[0].astype(jnp.float32)[None, :, None, None]
    if kv_len is not None and kv_len < q.shape[2]:
        col = jnp.arange(q.shape[2])
        logits = jnp.where(col[None, None, None, :] < kv_len, logits, -1e30)
    attn = jax.nn.softmax(logits, axis=-1)
    attn = jnp.einsum("bhqk,hg->bgqk", attn, ww.astype(jnp.float32))
    attn = attn + bw[0].astype(jnp.float32)[None, :, None, None]
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(q.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _talking_heads(q, k, v, wl, bl, ww, bw, scale, kv_len):
    return _fwd_impl(q, k, v, wl, bl, ww, bw, scale, kv_len)


def _th_fwd(q, k, v, wl, bl, ww, bw, scale, kv_len):
    out = _fwd_impl(q, k, v, wl, bl, ww, bw, scale, kv_len)
    return out, (q, k, v, wl, bl, ww, bw)


def _th_bwd(scale, kv_len, res, do):
    _, vjp = jax.vjp(lambda *a: _ref_forward(*a, scale, kv_len), *res)
    return vjp(do)


_talking_heads.defvjp(_th_fwd, _th_bwd)


def talking_heads_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                            wl: jax.Array, bl: jax.Array,
                            ww: jax.Array, bw: jax.Array, *,
                            scale: Optional[float] = None) -> jax.Array:
    """Fused QKᵀ → proj_l mix → softmax → proj_w mix → PV over
    ``(B, H, N, D)`` tensors.  Differentiable in all array inputs.
    Call :func:`fits` first.
    """
    B, H, N, D = q.shape
    if scale is None:
        scale = D ** -0.5
    NP = _round_up(N, 16)
    kv_len = N
    if NP != N:
        padspec = ((0, 0), (0, 0), (0, NP - N), (0, 0))
        q = jnp.pad(q, padspec)
        k = jnp.pad(k, padspec)
        v = jnp.pad(v, padspec)
    out = _talking_heads(q, k, v, wl, bl.reshape(1, H), ww,
                         bw.reshape(1, H), float(scale), kv_len)
    return out[:, :, :N] if NP != N else out
