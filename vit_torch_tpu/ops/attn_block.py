"""Fully-fused ViT attention-block Pallas TPU kernel: qkv projection +
full self-attention + output projection in ONE kernel.

Motivation (PERF.md): with the head-major layout path the q/k/v and
attention-output tensors still round-trip HBM between the einsum matmuls
and the flash kernel — for ViT-B @224 (N=785, C=768, bs32) that is four
~39 MB tensors written + read per block.  This kernel reads the (N, C)
token block once, keeps q/k/v, scores and the attention output in VMEM,
and writes the projected (N, C) output once.

Covers the reference hot path (DINO hub ViT attention; same structure as
reference ``models/cait.py:87-128``'s qkv→attn→proj) — re-imagined as one
fused TPU program, following the design proven by ``ops/window_block.py``
for Swin (+74% e2e).

Per grid program (one batch element):
1. k/v are computed chunk-by-chunk into VMEM scratch (fori over row
   chunks: one fat (CHUNK, C)×(C, 2C) matmul each),
2. a second fori over row chunks computes that chunk's q, runs an exact
   single-pass softmax attention per head against the full K/V scratch
   (static 64/32-lane head slices), concatenates heads, and applies the
   output projection — writing each (CHUNK, C) output tile exactly once.

Weights use constant index maps so the pipeline keeps them VMEM-resident
across programs.  Rows are padded to a CHUNK multiple host-side; padded
*keys* are masked in-kernel (same protocol as ``ops/flash_attention.py``).

Backward: custom VJP recomputing through the head-major einsum + flash
attention path (``_ref_forward``) — the fused forward is a pure-fwd
optimization; linear-eval (frozen backbone) gets the full win.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_torch_tpu.ops.flash_attention import (
    MASK_VALUE, flash_attention_bhnd, _round_up)

_LANE = 128
_CHUNK = 128
# usable VMEM budget for the per-program working set (v5e ~16 MB/core —
# the headline dino_vitb8 @224 shape needs 15.1 MB and compiles; Mosaic's
# own margin is covered because the weight/scratch buffers are not
# double-buffered, only the x/out pipeline blocks are)
_VMEM_BUDGET = int(15.3 * 1024 * 1024)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem_bytes(NP: int, C: int) -> int:
    x_io = 2 * 2 * NP * C * 2            # x + out, double-buffered, bf16
    kv = 2 * NP * C * 2                  # k/v scratch, bf16
    weights = (C * 3 * C + C * C) * 2 + 4 * C * 4
    transients = _CHUNK * 3 * C * 4 + 2 * _CHUNK * NP * 4
    return x_io + kv + weights + transients


def fits(N: int, C: int, num_heads: int) -> bool:
    """True when the fused attention-block kernel can run at these shapes."""
    if C % _LANE or C % num_heads:
        return False
    D = C // num_heads
    if D % 32:
        return False
    return _vmem_bytes(_round_up(N, _CHUNK), C) <= _VMEM_BUDGET


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
            k_buf, v_buf, *, num_heads: int, scale: float, kv_len: int):
    NP, C = x_ref.shape[1], x_ref.shape[2]
    H, D = num_heads, C // num_heads
    n_chunks = NP // _CHUNK

    def kv_body(c, _):
        xc = x_ref[0, pl.ds(c * _CHUNK, _CHUNK), :]
        kv = jax.lax.dot(xc, wqkv_ref[:, C:],
                         preferred_element_type=jnp.float32)
        kv = kv + bqkv_ref[0, C:].astype(jnp.float32)[None]
        kv = kv.astype(xc.dtype)                       # (CHUNK, 2C)
        k_buf[pl.ds(c * _CHUNK, _CHUNK), :] = kv[:, :C]
        v_buf[pl.ds(c * _CHUNK, _CHUNK), :] = kv[:, C:]
        return 0

    jax.lax.fori_loop(0, n_chunks, kv_body, 0)

    def q_body(c, _):
        xc = x_ref[0, pl.ds(c * _CHUNK, _CHUNK), :]
        q = jax.lax.dot(xc, wqkv_ref[:, :C],
                        preferred_element_type=jnp.float32)
        q = (q + bqkv_ref[0, :C].astype(jnp.float32)[None]).astype(xc.dtype)
        heads = []
        for h in range(H):
            qh = q[:, h * D:(h + 1) * D]               # (CHUNK, D)
            kh = k_buf[:, h * D:(h + 1) * D]           # (NP, D)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if kv_len < NP:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(col < kv_len, s, MASK_VALUE)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot(p.astype(xc.dtype),
                            v_buf[:, h * D:(h + 1) * D],
                            preferred_element_type=jnp.float32)
            heads.append((o / l).astype(xc.dtype))
        attn = jnp.concatenate(heads, axis=-1)         # (CHUNK, C)
        out = jax.lax.dot(attn, wproj_ref[...],
                          preferred_element_type=jnp.float32)
        out = out + bproj_ref[...].astype(jnp.float32)
        o_ref[0, pl.ds(c * _CHUNK, _CHUNK), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_chunks, q_body, 0)


def _fwd_impl(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale):
    B, N, C = x.shape
    NP = _round_up(N, _CHUNK)
    if NP != N:
        x = jnp.pad(x, ((0, 0), (0, NP - N), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, scale=scale,
                          kv_len=N),
        out_shape=jax.ShapeDtypeStruct((B, NP, C), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, NP, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NP, C), lambda b: (b, 0, 0)),
        scratch_shapes=[pltpu.VMEM((NP, C), x.dtype),
                        pltpu.VMEM((NP, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(x, w_qkv, b_qkv, w_proj, b_proj)
    return out[:, :N]


def _ref_forward(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale):
    """Head-major einsum + flash-attention path (the non-fused TPU path)."""
    B, N, C = x.shape
    D = C // num_heads
    w3 = w_qkv.reshape(C, 3, num_heads, D)
    b3 = b_qkv[0].reshape(3, num_heads, 1, D).astype(x.dtype)
    q = jnp.einsum("bnc,chd->bhnd", x, w3[:, 0]) + b3[0]
    k = jnp.einsum("bnc,chd->bhnd", x, w3[:, 1]) + b3[1]
    v = jnp.einsum("bnc,chd->bhnd", x, w3[:, 2]) + b3[2]
    out = flash_attention_bhnd(q, k, v, scale=scale)
    out = jnp.einsum("bhnd,hdc->bnc", out, w_proj.reshape(num_heads, D, C))
    return out + b_proj[0].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attn_block(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale):
    return _fwd_impl(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale)


def _ab_fwd(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale):
    out = _fwd_impl(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale)
    return out, (x, w_qkv, b_qkv, w_proj, b_proj)


def _ab_bwd(num_heads, scale, res, do):
    x, w_qkv, b_qkv, w_proj, b_proj = res
    _, vjp = jax.vjp(
        lambda *a: _ref_forward(*a, num_heads, scale),
        x, w_qkv, b_qkv, w_proj, b_proj)
    return vjp(do)


_attn_block.defvjp(_ab_fwd, _ab_bwd)


def attention_block(x: jax.Array, w_qkv: jax.Array,
                    b_qkv: Optional[jax.Array], w_proj: jax.Array,
                    b_proj: Optional[jax.Array], *, num_heads: int,
                    scale: Optional[float] = None) -> jax.Array:
    """Fused qkv→attention→proj over ``(B, N, C)`` token blocks.

    Differentiable in all array inputs.  Call :func:`fits` first.
    """
    B, N, C = x.shape
    if scale is None:
        scale = (C // num_heads) ** -0.5
    if not fits(N, C, num_heads):
        raise ValueError("attention_block working set exceeds VMEM; "
                         "check fits() before dispatching")
    if b_qkv is None:
        b_qkv = jnp.zeros((3 * C,), x.dtype)
    if b_proj is None:
        b_proj = jnp.zeros((C,), x.dtype)
    return _attn_block(x, w_qkv, b_qkv.reshape(1, 3 * C), w_proj,
                       b_proj.reshape(1, C), num_heads, float(scale))


# ---------------------------------------------------------------------------
# packed small-N variant: several IMAGES per program, block-diagonal mask
# ---------------------------------------------------------------------------
#
# The reference's actual CIFAR finetune operating point (dino_vitb8 @32px,
# N=17 tokens, bs128 — logs/stats_master_210624.json "210623_155824") is
# guarded out of both the flash and the chunked fused kernel: N=17 pads to
# the 128-row chunk (7.5× wasted rows, measured 4040 vs 8936 img/s forced
# on).  The XLA einsum path it falls back to spends 51% of the train step
# in the attention module at ~25% of the MLP's efficiency
# (examples/perf/vit32_step_decompose.json) — head-split relayouts and
# lane-padded softmax at 17 tokens, not matmul FLOPs.
#
# This variant packs G = ⌊128 / round_up(N, 8)⌋ images into ONE program row
# block (N=17 → 5 images × 24 rows = 120 rows, 71% dense vs 13% chunked):
# one fat qkv matmul, per-head attention over the packed rows with a
# block-diagonal (image-identity × kv_len) mask, one proj — everything
# VMEM-resident, no relayouts.  Padded query rows compute garbage finite
# values and are sliced off host-side.

_PACK_ROWS = 128


def _kernel_packed(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
                   qkv_ref, *, num_heads: int, scale: float, npi: int,
                   kv_len: int):
    ROWS, C = x_ref.shape[1], x_ref.shape[2]
    H, D = num_heads, C // num_heads
    x = x_ref[0]                                       # (ROWS, C)
    qkv = jax.lax.dot(x, wqkv_ref[...],
                      preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x.dtype)
    # saved for the analytic backward: avoids re-running the qkv matmul
    # in the VJP (a recompute backward measured -10% on the whole
    # finetune step -- the extra fwd matmuls cost more than the packed
    # forward saves)
    qkv_ref[0] = qkv
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 1)
    same_img = (row // npi) == (col // npi)
    col_ok = (col % npi) < kv_len
    heads = []
    for h in range(H):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, C + h * D:C + (h + 1) * D]
        v = qkv[:, 2 * C + h * D:2 * C + (h + 1) * D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = jnp.where(same_img & col_ok, s, MASK_VALUE)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
        heads.append((o / l).astype(x.dtype))
    attn = jnp.concatenate(heads, axis=-1)
    out = jax.lax.dot(attn, wproj_ref[...],
                      preferred_element_type=jnp.float32)
    out = out + bproj_ref[...].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _fwd_impl_packed(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale):
    B, N, C = x.shape
    npi = _round_up(N, 8)
    G = max(1, _PACK_ROWS // npi)
    ROWS = G * npi
    BP = -(-B // G) * G
    xp = jnp.pad(x, ((0, BP - B), (0, npi - N), (0, 0)))
    xg = xp.reshape(BP // G, ROWS, C)
    out, qkv = pl.pallas_call(
        functools.partial(_kernel_packed, num_heads=num_heads, scale=scale,
                          npi=npi, kv_len=N),
        out_shape=(jax.ShapeDtypeStruct((BP // G, ROWS, C), x.dtype),
                   jax.ShapeDtypeStruct((BP // G, ROWS, 3 * C), x.dtype)),
        grid=(BP // G,),
        in_specs=[
            pl.BlockSpec((1, ROWS, C), lambda b: (b, 0, 0)),
            pl.BlockSpec((C, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda b: (0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, ROWS, C), lambda b: (b, 0, 0)),
                   pl.BlockSpec((1, ROWS, 3 * C), lambda b: (b, 0, 0))),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(xg, w_qkv, b_qkv, w_proj, b_proj)
    out = out.reshape(BP, npi, C)[:B, :N]
    qkv = qkv.reshape(BP, npi, 3 * C)[:B, :N]
    return out, qkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _attn_block_packed(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale):
    out, _ = _fwd_impl_packed(x, w_qkv, b_qkv, w_proj, b_proj, num_heads,
                              scale)
    return out


def _abp_fwd(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale):
    out, qkv = _fwd_impl_packed(x, w_qkv, b_qkv, w_proj, b_proj,
                                num_heads, scale)
    return out, (x, qkv, w_qkv, w_proj, b_proj)


def _ref_forward_small(x, w_qkv, b_qkv, w_proj, b_proj, num_heads, scale):
    """Plain-einsum attention (NO flash kernel): the packed kernel's
    backward recompute path.  At the short sequences this kernel serves,
    routing the recompute through ``_ref_forward``'s flash call pads N to
    the 128-row chunk and measured −42% on the whole finetune step —
    exactly the pathology the packed forward avoids."""
    B, N, C = x.shape
    D = C // num_heads
    qkv = (jnp.dot(x, w_qkv) + b_qkv[0].astype(x.dtype))
    qkv = qkv.reshape(B, N, 3, num_heads, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, C)
    return jnp.dot(o, w_proj) + b_proj[0].astype(x.dtype)


def _abp_bwd(num_heads, scale, res, do):
    # analytic backward over the SAVED qkv: only the tiny attention core
    # (N x N score einsums) is recomputed; the qkv/proj matmuls run once
    # each as gradient contractions, never as recompute
    x, qkv, w_qkv, w_proj, b_proj = res
    B, N, C = x.shape
    H = num_heads
    D = C // H
    dt = x.dtype

    def core(qkv_):
        q3 = qkv_.reshape(B, N, 3, H, D)
        q, k, v = q3[:, :, 0], q3[:, :, 1], q3[:, :, 2]
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(dt)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, N, C)

    attn_out, core_vjp = jax.vjp(core, qkv)
    do_ = do.astype(dt)
    dattn = jnp.dot(do_, w_proj.T)
    dw_proj = jnp.einsum("bnc,bnd->cd", attn_out, do_)
    db_proj = jnp.sum(do_, axis=(0, 1))[None].astype(b_proj.dtype)
    dqkv = core_vjp(dattn)[0]
    dx = jnp.dot(dqkv, w_qkv.T)
    dw_qkv = jnp.einsum("bnc,bnd->cd", x, dqkv)
    db_qkv = jnp.sum(dqkv, axis=(0, 1))[None]
    return dx, dw_qkv, db_qkv, dw_proj, db_proj


_attn_block_packed.defvjp(_abp_fwd, _abp_bwd)


def fits_packed(N: int, C: int, num_heads: int) -> bool:
    """True when the packed small-N kernel serves these shapes: short
    sequences only (the pack must fit multiple images per row block to
    beat XLA), lane-aligned channels, 32-lane head slices."""
    if N > 48 or C % _LANE or C % num_heads or (C // num_heads) % 32:
        return False
    weights = (C * 3 * C + C * C) * 2 + 4 * C * 4
    rows = max(1, _PACK_ROWS // _round_up(N, 8)) * _round_up(N, 8)
    transients = rows * 3 * C * 4 + 2 * rows * rows * 4 + 4 * rows * C * 2
    return weights + transients <= _VMEM_BUDGET


def attention_block_packed(x: jax.Array, w_qkv: jax.Array,
                           b_qkv: Optional[jax.Array], w_proj: jax.Array,
                           b_proj: Optional[jax.Array], *, num_heads: int,
                           scale: Optional[float] = None) -> jax.Array:
    """Fused qkv→attention→proj for SHORT sequences, multiple images per
    program (block-diagonal mask).  Differentiable in all array inputs.
    Call :func:`fits_packed` first."""
    B, N, C = x.shape
    if scale is None:
        scale = (C // num_heads) ** -0.5
    if not fits_packed(N, C, num_heads):
        raise ValueError("attention_block_packed: shapes not servable; "
                         "check fits_packed() before dispatching")
    if b_qkv is None:
        b_qkv = jnp.zeros((3 * C,), x.dtype)
    if b_proj is None:
        b_proj = jnp.zeros((C,), x.dtype)
    return _attn_block_packed(x, w_qkv, b_qkv.reshape(1, 3 * C), w_proj,
                              b_proj.reshape(1, C), num_heads, float(scale))
