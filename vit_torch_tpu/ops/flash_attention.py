"""Fused attention Pallas TPU kernels (forward + custom-VJP backward).

Design rationale (TPU-first, not a generic flash port): every backbone in
this zoo is a *vision* transformer — sequence lengths are 145 (ViT-B/8 @96²)
to 2305 (ViT-B/8 @384²) tokens.  Padded to lane multiples, the entire K/V
for one (batch, head) is ≤ ~2.4k×128 ≈ 1.2 MB and the per-q-block score tile
≤ 128×2432×4 ≈ 1.2 MB — both fit comfortably in VMEM (~16 MB/core).  So
instead of the online-softmax two-level tiling (needed when K/V exceeds
VMEM), these kernels:

- tile only the **query** dimension (grid = batch × heads × q-blocks),
- keep full K/V rows resident in VMEM,
- compute an **exact single-pass softmax** per q-block (fp32 stats),
- never materialize the N×N score matrix in HBM (the XLA fallback does),
- need **zero residuals** for backward: dq/dkv kernels recompute P from
  Q/K in VMEM, which is cheaper than storing the (B,H,N,128)-duplicated
  l/m tensors a generic flash kernel would save.

The backward uses the standard identities (no lse needed because rows are
complete in-kernel):
    dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ∘ (dP − rowsum(P ∘ dP));
    dQ = dS K · scale;  dK = dSᵀ Q · scale.

Replaces the cuDNN attention matmuls behind the reference's backbones
(e.g. reference ``models/cait.py:111-128``, DINO hub ViT attention).
For sequences beyond VMEM capacity, ``vit_torch_tpu.ops.attention`` falls
back to fused XLA attention; ring/context parallelism over the mesh ``seq``
axis is the scale-out path (``parallel/``).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANE = 128
SUBLANE = 16

# Scoped-VMEM budgets (bytes) for the head-blocked single-block kernels.
# Calibration points (v5e, slope-timed probe `examples/perf/attn_xla_bound.py`):
# a 4-(b·h) forward at N=800 (~22 MB of fp32 score tiles) compiles and runs,
# so 24 MB is conservative; Mosaic remote_compile HTTP 500 = overflow.
_HB_FWD_VMEM = 24 * 1024 * 1024
_HB_BWD_VMEM = 24 * 1024 * 1024


def _interpret() -> bool:
    """Pallas TPU kernels run in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _head_block(num_heads: int, n_pad: int, d: int, *, bwd: bool) -> int:
    """Heads batched per program on the single-q-block path.

    Packing 2 heads per program batches the small-K (64-deep) attention
    matmuls across heads on the MXU: +14% measured at the headline shape
    (B=32, H=12, N=785, D=64 — 61.1 vs 53.5 TF/s slope-timed, see
    `examples/perf/attn_xla_bound.json` and PERF.md).  Gated by a scoped-VMEM
    estimate of the fp32 score tiles; override with VITX_FLASH_HEAD_BLOCK
    (1 disables, 2/4 force a width).
    """
    forced = os.environ.get("VITX_FLASH_HEAD_BLOCK")
    if forced is not None:
        hb = int(forced)
        return hb if hb > 1 and num_heads % hb == 0 else 1
    score_bufs = 3 if bwd else 2            # {p, dp, ds} vs {s, p}
    budget = _HB_BWD_VMEM if bwd else _HB_FWD_VMEM
    for hb in (2,):
        bytes_est = hb * (score_bufs * n_pad * n_pad * 4
                          + (8 if bwd else 4) * n_pad * d * 2)
        if num_heads % hb == 0 and bytes_est <= budget:
            return hb
    return 1


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    # matmul inputs stay in the storage dtype (bf16 in production — full-rate
    # MXU) with fp32 accumulation; softmax stats are fp32
    q = q_ref[0, 0]                              # (bq, D)
    k = k_ref[0, 0]                              # (N, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if kv_len < k.shape[0]:                      # mask padded keys (static)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0]                              # (N, D)
    # normalize AFTER the PV matmul: an (bq, D) divide instead of (bq, N)
    o = jax.lax.dot(p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    o_ref[0, 0] = (o / l).astype(o_ref.dtype)


def _fwd_kernel_hb(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """Head-blocked single-pass forward: (HB, N, D) per program, attention
    matmuls batched over the HB heads so the MXU pipelines across heads."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]            # (HB, N, D)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if kv_len < k.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, MASK_VALUE)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


# --------------------------------------------------------------------------
# backward
# --------------------------------------------------------------------------

def _recompute_p(q, k, scale, kv_len):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if kv_len < k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, MASK_VALUE)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, *,
                   scale: float, kv_len: int):
    q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
    p = _recompute_p(q, k, scale, kv_len)                       # (bq, N) f32
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (bq, N)
    di = jnp.sum(p * dp, axis=1, keepdims=True)                 # (bq, 1)
    ds = (p * (dp - di) * scale).astype(k.dtype)                # (bq, N)
    dq_ref[0, 0] = jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                      *, scale: float, kv_len: int):
    """Single-block backward (block_q == padded seq): computes P once and
    emits dq/dk/dv in one pass — 6 matmuls + 1 softmax instead of the 9 + 2
    of the split dq/dkv kernels."""
    q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
    p = _recompute_p(q, k, scale, kv_len)                       # (N, N) f32
    dv_ref[0, 0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    di = jnp.sum(p * dp, axis=1, keepdims=True)
    ds = (p * (dp - di) * scale).astype(q.dtype)
    dq_ref[0, 0] = jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_fused_kernel_hb(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                         *, scale: float, kv_len: int):
    """Head-blocked one-pass backward: same identities as
    :func:`_bwd_fused_kernel`, batched over the HB leading heads."""
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]   # (HB, N, D)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32) * scale
    if kv_len < k.shape[1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(col < kv_len, s, MASK_VALUE)
    m = jnp.max(s, axis=2, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=2, keepdims=True)               # (HB, Nq, Nk)
    dv_ref[0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    di = jnp.sum(p * dp, axis=2, keepdims=True)
    ds = (p * (dp - di) * scale).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, dk_ref, dv_ref,
                    dk_acc, dv_acc, *, scale: float, kv_len: int):
    q_idx, n_q = pl.program_id(2), pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q, k, v, do = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], do_ref[0, 0]
    p = _recompute_p(q, k, scale, kv_len)                       # (bq, N) f32
    # dV += Pᵀ dO
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    di = jnp.sum(p * dp, axis=1, keepdims=True)
    ds = (p * (dp - di) * scale).astype(q.dtype)                # (bq, N)
    # dK += dSᵀ Q
    dk_acc[...] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------

def _pad_seq(x, n_pad):
    n = x.shape[2]
    if n == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))


def _fwd_impl(q, k, v, scale, block_q):
    B, H, N, D = q.shape
    if block_q >= N:
        hb = _head_block(H, N, D, bwd=False)
        if hb > 1:
            # head-blocked single-pass: grid (B, H/hb), unpadded sequence
            spec = pl.BlockSpec((1, hb, N, D), lambda b, h: (b, h, 0, 0))
            return pl.pallas_call(
                functools.partial(_fwd_kernel_hb, scale=scale, kv_len=N),
                out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
                grid=(B, H // hb),
                in_specs=[spec, spec, spec],
                out_specs=spec,
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
                interpret=_interpret(),
            )(q, k, v)
    n_pad = _round_up(N, block_q)
    qp, kp, vp = _pad_seq(q, n_pad), _pad_seq(k, n_pad), _pad_seq(v, n_pad)
    grid = (B, H, n_pad // block_q)
    kernel = functools.partial(_fwd_kernel, scale=scale, kv_len=N)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, n_pad, D), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, n_pad, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, n_pad, D), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp)
    return out[:, :, :N]


def _bwd_impl(q, k, v, do, scale, block_q):
    B, H, N, D = q.shape
    n_pad = _round_up(N, block_q)
    qp, kp, vp = _pad_seq(q, n_pad), _pad_seq(k, n_pad), _pad_seq(v, n_pad)
    dop = _pad_seq(do, n_pad)

    if block_q == n_pad:
        hb = _head_block(H, n_pad, D, bwd=True)
        if hb > 1:
            spec = pl.BlockSpec((1, hb, n_pad, D), lambda b, h: (b, h, 0, 0))
            dq, dk, dv = pl.pallas_call(
                functools.partial(_bwd_fused_kernel_hb, scale=scale,
                                  kv_len=N),
                out_shape=tuple(jax.ShapeDtypeStruct((B, H, n_pad, D), x.dtype)
                                for x in (q, k, v)),
                grid=(B, H // hb),
                in_specs=[spec, spec, spec, spec],
                out_specs=(spec, spec, spec),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel")),
                interpret=_interpret(),
            )(qp, kp, vp, dop)
            return dq[:, :, :N], dk[:, :, :N], dv[:, :, :N]
        # single q-block: fused one-pass backward
        spec = pl.BlockSpec((1, 1, n_pad, D), lambda b, h: (b, h, 0, 0))
        dq, dk, dv = pl.pallas_call(
            functools.partial(_bwd_fused_kernel, scale=scale, kv_len=N),
            out_shape=tuple(jax.ShapeDtypeStruct((B, H, n_pad, D), x.dtype)
                            for x in (q, k, v)),
            grid=(B, H),
            in_specs=[spec, spec, spec, spec],
            out_specs=(spec, spec, spec),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=_interpret(),
        )(qp, kp, vp, dop)
        return dq[:, :, :N], dk[:, :, :N], dv[:, :, :N]

    grid = (B, H, n_pad // block_q)
    q_spec = pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0))
    kv_spec = pl.BlockSpec((1, 1, n_pad, D), lambda b, h, i: (b, h, 0, 0))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=N),
        out_shape=jax.ShapeDtypeStruct((B, H, n_pad, D), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=q_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp, dop)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=N),
        out_shape=(jax.ShapeDtypeStruct((B, H, n_pad, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, n_pad, D), v.dtype)),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec],
        out_specs=(kv_spec, kv_spec),
        scratch_shapes=[pltpu.VMEM((n_pad, D), jnp.float32),
                        pltpu.VMEM((n_pad, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(qp, kp, vp, dop)
    return dq[:, :, :N], dk[:, :, :N], dv[:, :, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention(q, k, v, scale, block_q):
    return _fwd_impl(q, k, v, scale, block_q)


def _attention_fwd(q, k, v, scale, block_q):
    return _fwd_impl(q, k, v, scale, block_q), (q, k, v)


def _attention_bwd(scale, block_q, res, do):
    q, k, v = res
    return _bwd_impl(q, k, v, do, scale, block_q)


_attention.defvjp(_attention_fwd, _attention_bwd)


def flash_attention_bhnd(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         scale: Optional[float] = None,
                         block_q: Optional[int] = None) -> jax.Array:
    """Fused attention over ``(B, H, N, D)`` tensors — the kernels' native
    layout, for callers that already produce head-major q/k/v (e.g. the
    einsum-formed path in ``models/layers.py:Attention``) and want to skip
    the two (B, N, H, D) ⇄ (B, H, N, D) transposes of
    :func:`flash_attention`."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if block_q is None:
        block_q = q.shape[2] if q.shape[2] <= 1100 else 512
    return _attention(q, k, v, float(scale), int(block_q))


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                    scale: Optional[float] = None,
                    block_q: Optional[int] = None) -> jax.Array:
    """Fused attention over ``(B, N, H, D)`` tensors (flax layout).

    Differentiable (custom VJP with analytic Pallas backward kernels).

    ``block_q=None`` picks the measured-fastest tiling: one q-block per
    (batch, head) program when the whole sequence fits VMEM budget
    (≤1100 tokens: 1.6× over 128-blocks on v5e — fewer, fatter programs),
    else 512-token blocks.  The single-block path runs on the **unpadded**
    sequence (block dims equal to the array dims satisfy the TPU tiling
    rule), saving a full pad+slice round-trip through HBM (~25% of kernel
    wall time at ViT-B/8 224² shapes).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if block_q is None:
        block_q = q.shape[1] if q.shape[1] <= 1100 else 512
    # (B, N, H, D) -> (B, H, N, D) for per-(batch, head) kernels
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    out = _attention(qt, kt, vt, float(scale), int(block_q))
    return out.transpose(0, 2, 1, 3)
