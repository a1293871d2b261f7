"""Fused Swin window-attention Pallas TPU kernel (fwd + custom-VJP bwd).

Replaces the XLA einsum path in ``models/swin.py`` ``WindowAttention``
(reference hot block ``models/swin.py:105-160``): per-window attention with a
relative-position bias shared across windows and an optional shifted-window
mask shared across images.

Why a kernel: window attention has tiny windows (N = w² = 49/144 tokens,
head_dim 32) but *many* of them — for swin_base_384 stage 1 the XLA path
materializes a (B·nW, H, N, N) logits tensor (~680 MB at bs32) in HBM
between the QKᵀ and PV matmuls.  This kernel keeps scores in VMEM for a
chunk of windows at a time: per grid program it computes
``softmax(QKᵀ·scale + bias + mask) V`` for ``WB`` windows, so the only HBM
traffic is Q/K/V/O — the HBM-bandwidth win, not a FLOPs win (head_dim 32
under-fills the MXU contraction either way).

Layout contracts:
- q/k/v: ``(Bn, H, N, D)`` with ``Bn = B·nW`` flattened window-major per
  image (the ``window_partition`` order), so window ``i``'s mask row is
  ``i % nW``;
- bias: ``(H, N, N)`` — the gathered relative-position bias (the gather
  stays *outside* the kernel so the bias-table gradient flows through JAX's
  scatter-add);
- mask: ``(nW, N, N)`` additive, or None for non-shifted blocks.

The backward recomputes P in-kernel (zero residuals, like
``ops/flash_attention.py``) and accumulates
``dbias[h] = Σ_windows dS`` in a VMEM scratch across the window-chunk grid
dimension.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# VMEM budget per program for the fp32 compute temporaries (bytes); the
# remaining ~half of the 16 MB scoped VMEM covers the (double-buffered)
# bf16 I/O tiles + bias/mask blocks
_VMEM_BUDGET = 7 * 1024 * 1024

_LANE = 128


def _pick_window_block(nW_img: int, Bn: int, N: int, D: int,
                       backward: bool) -> int:
    """Largest WB that divides both nW_img (mask alignment) and Bn, keeping
    the fp32 stack working set under budget.

    Accounting uses **lane-padded** shapes — a (N, 32) tile occupies
    (N, 128) lanes in VMEM, and an (N, N) score tile pads N up to 128 —
    which is what actually blows the 16 MB scoped limit, not the logical
    element counts."""
    dp = -(-D // _LANE) * _LANE
    np_ = -(-N // _LANE) * _LANE
    # fwd stack: q,k,v,o fp32 tiles + s,p scores; bwd adds do,dq,dk,dv + ds,dp
    n_tok = (8 if backward else 4) * N * dp
    n_sco = (3 if backward else 2) * N * np_
    per_window = 4 * (n_tok + n_sco)
    wb = max(1, min(nW_img, _VMEM_BUDGET // per_window))
    while nW_img % wb or Bn % wb:
        wb -= 1
    return wb


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                scale: float, has_mask: bool):
    # matmul inputs stay in the storage dtype (bf16 → full-rate MXU);
    # softmax stats are fp32 via the accumulate dtype
    q = q_ref[:, 0]                                # (WB, N, D)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale            # (WB, N, N)
    s = s + bias_ref[0].astype(jnp.float32)[None]
    if has_mask:
        s = s + mask_ref[...].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # normalize AFTER the PV matmul: (WB, N, D) divide, not (WB, N, N)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = (o / l).astype(o_ref.dtype)


def _recompute_p(q, k, bias, mask, scale, has_mask):
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = s + bias[None]
    if has_mask:
        s = s + mask
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, dbias_acc, *,
                scale: float, has_mask: bool):
    i, n_i = pl.program_id(1), pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dbias_acc[...] = jnp.zeros_like(dbias_acc)

    q, k, v, do = q_ref[:, 0], k_ref[:, 0], v_ref[:, 0], do_ref[:, 0]
    bias = bias_ref[0].astype(jnp.float32)
    mask = mask_ref[...].astype(jnp.float32) if has_mask else None
    p = _recompute_p(q, k, bias, mask, scale, has_mask)   # (WB, N, N) f32
    # dV = Pᵀ dO (per window)
    dv_ref[:, 0] = jax.lax.dot_general(
        p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # (WB, N, N)
    di = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - di)                       # d(logits), before the q-scale
    ds_lo = ds.astype(q.dtype)
    dq_ref[:, 0] = (jax.lax.dot_general(
        ds_lo, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[:, 0] = (jax.lax.dot_general(
        ds_lo, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)
    dbias_acc[...] += jnp.sum(ds, axis=0)

    @pl.when(i == n_i - 1)
    def _store():
        dbias_ref[0] = dbias_acc[...].astype(dbias_ref.dtype)


def _fwd_impl(q, k, v, bias, mask, scale):
    Bn, H, N, D = q.shape
    has_mask = mask is not None
    nW = mask.shape[0] if has_mask else 1
    wb = _pick_window_block(nW if has_mask else min(Bn, 64), Bn, N, D, False)
    grid = (Bn // wb, H)
    tok = pl.BlockSpec((wb, 1, N, D), lambda i, h: (i, h, 0, 0))
    n_mask_blocks = (nW // wb) if has_mask else 1
    in_specs = [tok, tok, tok,
                pl.BlockSpec((1, N, N), lambda i, h: (h, 0, 0))]
    if has_mask:
        in_specs.append(pl.BlockSpec((wb, N, N),
                                     lambda i, h: (i % n_mask_blocks, 0, 0)))
        args = (q, k, v, bias, mask)
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda i, h: (0, 0, 0)))
        args = (q, k, v, bias, jnp.zeros((1, 1, 1), q.dtype))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, has_mask=has_mask),
        out_shape=jax.ShapeDtypeStruct((Bn, H, N, D), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=tok,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(*args)


def _bwd_impl(q, k, v, bias, mask, scale, do):
    Bn, H, N, D = q.shape
    has_mask = mask is not None
    nW = mask.shape[0] if has_mask else 1
    wb = _pick_window_block(nW if has_mask else min(Bn, 64), Bn, N, D, True)
    # window-chunk dim innermost + "arbitrary" so the dbias scratch
    # accumulates across it sequentially (per head)
    grid = (H, Bn // wb)
    tok = pl.BlockSpec((wb, 1, N, D), lambda h, i: (i, h, 0, 0))
    bias_spec = pl.BlockSpec((1, N, N), lambda h, i: (h, 0, 0))
    n_mask_blocks = (nW // wb) if has_mask else 1
    in_specs = [tok, tok, tok, bias_spec]
    if has_mask:
        in_specs.append(pl.BlockSpec((wb, N, N),
                                     lambda h, i: (i % n_mask_blocks, 0, 0)))
        margs = (mask,)
    else:
        in_specs.append(pl.BlockSpec((1, 1, 1), lambda h, i: (0, 0, 0)))
        margs = (jnp.zeros((1, 1, 1), q.dtype),)
    in_specs.append(tok)                                        # do
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, has_mask=has_mask),
        out_shape=(jax.ShapeDtypeStruct((Bn, H, N, D), q.dtype),
                   jax.ShapeDtypeStruct((Bn, H, N, D), k.dtype),
                   jax.ShapeDtypeStruct((Bn, H, N, D), v.dtype),
                   jax.ShapeDtypeStruct((H, N, N), jnp.float32)),
        grid=grid,
        in_specs=in_specs,
        out_specs=(tok, tok, tok, bias_spec),
        scratch_shapes=[pltpu.VMEM((N, N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(q, k, v, bias, *margs, do)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _window_attention(q, k, v, bias, mask, scale):
    return _fwd_impl(q, k, v, bias, mask, scale)


def _wa_fwd(q, k, v, bias, mask, scale):
    return _fwd_impl(q, k, v, bias, mask, scale), (q, k, v, bias, mask)


def _wa_bwd(scale, res, do):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _bwd_impl(q, k, v, bias, mask, scale, do)
    return dq, dk, dv, dbias.astype(bias.dtype), None


_window_attention.defvjp(_wa_fwd, _wa_bwd)


def window_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     bias: jax.Array, mask: Optional[jax.Array] = None, *,
                     scale: Optional[float] = None) -> jax.Array:
    """Fused window attention over ``(Bn, N, H, D)`` tensors (flax layout).

    ``bias``: (H, N, N) relative-position bias (gather the table outside).
    ``mask``: (nW, N, N) additive shifted-window mask or None; ``Bn`` must be
    a multiple of ``nW`` with windows flattened image-major.
    Differentiable in q/k/v/bias.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    out = _window_attention(qt, kt, vt, bias,
                            None if mask is None else mask, float(scale))
    return out.transpose(0, 2, 1, 3)
