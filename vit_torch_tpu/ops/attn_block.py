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
