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


# ---------------------------------------------------------------------------
# v2: mix-as-matmul formulation over head-concatenated (B, N, C) tensors.
#
# The pre-softmax mix is LINEAR in the scores, so it folds into the QKᵀ
# contraction itself: with K̂ = [K_0 | K_1 | … | K_{H-1}] ∈ (N, C) the
# head-concatenated keys and Q̂_g = [wl_{0g}·Q_0 | … | wl_{H-1,g}·Q_{H-1}]
# (one per-lane rescale of the concatenated queries),
#
#     (Q̂_g · K̂ᵀ)[n, m] = Σ_h Σ_j wl[h,g]·q[n,h,j]·k[m,h,j]
#                       = Σ_h wl[h,g]·(Q_h K_hᵀ)[n, m]  — the mixed logits.
#
# The cross-head contraction over C = H·D (384 for CaiT-S) IS the mix, so
# the H² per-tile VPU accumulation loops of the v1 kernel become one
# MXU-dense matmul per output head (contraction 384 vs 48, full-lane
# output).  Post-softmax, X_g = P_g · V̂ ∈ (N, C) holds P_g V_h for EVERY
# h in its lane blocks, so the proj_w mix collapses to one VPU FMA per g
# with a host-expanded weight row (ww_exp[g, h·D+j] = ww[g,h]) — no lane
# slicing, no score stacks.  Scores are per-g transients: VMEM drops from
# H fp32 (N, N) stacks (~11 MB budget) to ~1.2 MB at the CaiT-S shape.
#
# Two exact algebraic simplifications vs the reference chain
# (reference models/cait.py:87-128):
#   * proj_l's bias bl[g] is constant across a softmax row — softmax is
#     shift-invariant, so it is a mathematical no-op and is dropped.
#   * proj_w's bias bw[g] adds bw[g]·Σ_m V_g[m, :] to the output — folded
#     in as bw_exp ⊙ colsum(V̂) (zero-padded kv rows keep the colsum
#     exact).
# ---------------------------------------------------------------------------

_V2_VMEM_BUDGET = 11 * 1024 * 1024


_V2_MAX_QBLOCK = 512


def _v2_bytes(NP: int, bq: int, H: int, CP: int, NPl: int) -> int:
    """Peak VMEM of one stacked v2 program at padded shapes."""
    io = 2 * (2 * NP * CP + 2 * bq * CP) * 2          # dbl-buffered q/k/v/o
    qhat = H * bq * CP * 2                             # stacked Q̂ (bf16)
    sp = 2 * H * bq * NPl * 4                          # s + p stacks (fp32)
    x = H * bq * CP * 4                                # stacked PV̂ out
    acc = bq * CP * 4                                  # fp32 out accumulator
    return io + qhat + sp + x + acc


def fits_v2(N: int, num_heads: int, head_dim: int) -> bool:
    """True when one (q-block, full-kv) v2 program fits VMEM."""
    C = num_heads * head_dim
    NP = _round_up(N, 16)
    return _v2_bytes(NP, _v2_qblock(NP, num_heads, C), num_heads,
                     _round_up(C, _LANE),
                     _round_up(NP, _LANE)) <= _V2_VMEM_BUDGET


def _kernel_v2(q_ref, k_ref, v_ref, wl_ref, ww_ref, bw_ref, o_ref, *,
               num_heads: int, kv_len: int):
    # Stacked single-dot schedule: the per-output-head Q̂_g rescales are
    # concatenated along rows into one (H·BQ, C) operand so QK̂, softmax
    # and PV̂ each run as ONE fat MXU/VPU op (M = H·BQ) instead of H
    # small serial ones — same FLOPs, deep MXU pipelining.
    khat = k_ref[0]                                    # (N, C) bf16
    vhat = v_ref[0]
    qb = q_ref[0].astype(jnp.float32)                  # (BQ, C)
    H, N = num_heads, khat.shape[0]
    BQ = qb.shape[0]
    qhat = jnp.concatenate(
        [(qb * wl_ref[g][None, :]).astype(khat.dtype) for g in range(H)],
        axis=0)                                        # (H·BQ, C)
    s = jax.lax.dot_general(qhat, khat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len < N:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    x = jax.lax.dot(p.astype(vhat.dtype), vhat,
                    preferred_element_type=jnp.float32)  # (H·BQ, C)
    vsum = jnp.sum(vhat.astype(jnp.float32), axis=0, keepdims=True)
    acc = jnp.broadcast_to(bw_ref[...].astype(jnp.float32) * vsum,
                           (BQ, khat.shape[1]))
    for g in range(H):
        acc = acc + (x[g * BQ:(g + 1) * BQ]
                     * ww_ref[g][None, :].astype(jnp.float32))
    o_ref[0] = acc.astype(o_ref.dtype)


def _v2_qblock(NP: int, H: int, C: int) -> int:
    """Largest ≤512-row q block tiling NP evenly whose stacked program
    fits the VMEM budget (NP is a 16-multiple)."""
    CP = _round_up(C, _LANE)
    NPl = _round_up(NP, _LANE)
    nblk = -(-NP // _V2_MAX_QBLOCK)
    while nblk <= NP // 16:
        if NP % (16 * nblk) == 0:
            bq = NP // nblk
            if _v2_bytes(NP, bq, H, CP, NPl) <= _V2_VMEM_BUDGET:
                return bq
        nblk += 1
    return 16


def _fwd_impl_v2(q, k, v, wl_exp, ww_exp, bw_exp, num_heads, kv_len):
    B, NP, C = q.shape
    bq = _v2_qblock(NP, num_heads, C)
    qspec = pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0))
    kvspec = pl.BlockSpec((1, NP, C), lambda b, i: (b, 0, 0))
    wspec = pl.BlockSpec(wl_exp.shape, lambda b, i: (0, 0))
    return pl.pallas_call(
        functools.partial(_kernel_v2, num_heads=num_heads, kv_len=kv_len),
        out_shape=jax.ShapeDtypeStruct((B, NP, C), q.dtype),
        grid=(B, NP // bq),
        in_specs=[qspec, kvspec, kvspec, wspec, wspec,
                  pl.BlockSpec((1, C), lambda b, i: (0, 0))],
        out_specs=qspec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, wl_exp, ww_exp, bw_exp)


def _ref_forward_bnc(q, k, v, wl, bl, ww, bw, num_heads, scale, kv_len=None):
    """XLA einsum reference on the (B, N, C) head-concatenated layout."""
    B, N, C = q.shape
    H, D = num_heads, C // num_heads

    def heads(t):
        return t.reshape(B, N, H, D).transpose(0, 2, 1, 3)

    out = _ref_forward(heads(q), heads(k), heads(v), wl, bl.reshape(1, H),
                       ww, bw.reshape(1, H), scale, kv_len)
    return out.transpose(0, 2, 1, 3).reshape(B, N, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _talking_heads_v2(q, k, v, wl_exp, ww_exp, bw_exp, params,
                      num_heads, scale, kv_len):
    return _fwd_impl_v2(q, k, v, wl_exp, ww_exp, bw_exp, num_heads, kv_len)


def _th_v2_fwd(q, k, v, wl_exp, ww_exp, bw_exp, params,
               num_heads, scale, kv_len):
    out = _fwd_impl_v2(q, k, v, wl_exp, ww_exp, bw_exp, num_heads, kv_len)
    return out, (q, k, v, params)


def _th_v2_bwd(num_heads, scale, kv_len, res, do):
    q, k, v, params = res
    wl, bl, ww, bw = params

    def ref(q, k, v, wl, bl, ww, bw):
        return _ref_forward_bnc(q, k, v, wl, bl, ww, bw, num_heads, scale,
                                kv_len)

    _, vjp = jax.vjp(ref, q, k, v, wl, bl, ww, bw)
    dq, dk, dv, dwl, dbl, dww, dbw = vjp(do)
    return dq, dk, dv, None, None, None, (dwl, dbl, dww, dbw)


_talking_heads_v2.defvjp(_th_v2_fwd, _th_v2_bwd)


def talking_heads_attention_bnc(q: jax.Array, k: jax.Array, v: jax.Array,
                                wl: jax.Array, bl: jax.Array,
                                ww: jax.Array, bw: jax.Array, *,
                                num_heads: int,
                                scale: Optional[float] = None) -> jax.Array:
    """v2 fused talking-heads attention over ``(B, N, C)`` tensors with
    heads concatenated along C (``[h0·D | h1·D | …]``).  Differentiable in
    all array inputs (backward recomputes through the XLA reference).
    Call :func:`fits_v2` first.
    """
    B, N, C = q.shape
    H, D = num_heads, C // num_heads
    if scale is None:
        scale = D ** -0.5
    # host-side expansions: one weight row per MXU pass / FMA pass
    wl_exp = jnp.repeat(wl.astype(jnp.float32).T, D, axis=1) * scale
    ww_exp = jnp.repeat(ww.astype(jnp.float32), D, axis=1)
    bw_exp = jnp.repeat(bw.astype(jnp.float32).reshape(1, H), D, axis=1)
    NP = _round_up(N, 16)
    kv_len = N
    if NP != N:
        padspec = ((0, 0), (0, NP - N), (0, 0))
        q = jnp.pad(q, padspec)
        k = jnp.pad(k, padspec)
        v = jnp.pad(v, padspec)
    out = _talking_heads_v2(q, k, v, wl_exp, ww_exp, bw_exp,
                            (wl, bl, ww, bw), H, float(scale), kv_len)
    return out[:, :N] if NP != N else out
