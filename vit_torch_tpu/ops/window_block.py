"""Fully-fused Swin window-block Pallas TPU kernel: qkv projection +
window attention (relative-position bias + shifted mask) + output
projection in ONE kernel.

Motivation (PERF.md item 1): with the attention-only kernel
(``ops/window_attention.py``) the (B·nW, N, C) window activations still
round-trip HBM four times per block — qkv matmul writes 3C, the attention
kernel reads 3C / writes C, the proj matmul reads C / writes C.  Swin's
early stages are HBM-bound (C = 128..256, 9216 tokens per image at 384²),
so that traffic — not FLOPs — caps the block at ~14% MFU.  This kernel
reads the windows once (C), keeps qkv / scores / per-head outputs in VMEM,
and writes the projected output once (C): ~8C of HBM traffic becomes 2C.

Covers the reference hot block ``models/swin.py:105-160`` (qkv Linear →
attention → proj Linear) — reimagined as one fused TPU program, not a
translation.

Layout contracts (matching ``models/swin.py`` ``WindowAttention``):
- x: ``(Bn, N, C)`` windows, ``Bn = B·nW`` flattened window-major per image
  (``window_partition`` order), so window ``i``'s mask row is ``i % nW``;
- w_qkv: ``(C, 3C)`` with output features ordered ``(3, H, D)`` — q for all
  heads, then k, then v (the flax/torch qkv layout); b_qkv: ``(1, 3C)``;
- bias: ``(H, N, N)`` gathered relative-position bias (the table gather
  stays outside so the bias-table gradient flows through JAX scatter-add);
- mask: ``(nW, N, N)`` additive shifted-window mask, or None;
- w_proj: ``(C, C)``; b_proj: ``(1, C)``.

Per grid program (one chunk of WB windows): one fat (WB·N, C)×(C, 3C)
matmul feeds an unrolled per-head attention loop (static 32-lane slices of
the qkv buffer — D = C/H = 32 for every Swin config), then one
(WB·N, C)×(C, C) projection.  Weights/bias use constant index maps, so the
pipeline keeps them resident in VMEM across programs instead of re-DMAing.

Backward: the op carries a custom VJP whose backward *recomputes* through
the partially-fused reference path (XLA qkv matmul → ``window_attention``
kernel → XLA proj matmul), reusing that kernel's analytic backward.  The
fused forward is therefore a pure-fwd optimization — exactly what the
linear-eval path (frozen backbone, forward-only) wants; finetune pays one
extra partially-fused forward inside the backward, which the HBM savings
of the fused forward offset.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_torch_tpu.ops.window_attention import window_attention


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_LANE = 128

# Calibrated on v5e against Mosaic's scoped-VMEM allocator (WB sweep over the
# swin_base_384 stage shapes, see PERF.md): the per-program activation
# working set wb·N·C must stay under ~150k bf16 elements when a mask block
# rides along (~300k without), and the VMEM-resident constants (both weight
# matrices + fp32 bias table + mask) must leave room for the pipeline's
# activation buffers.  Stage 4 of the `base`/`large` configs (C ≥ 1024,
# H = 32 bias table) exceeds the static budget at any WB — callers fall back
# to the attention-only kernel there (its runtime share is negligible).
_ACT_ELEMS_MASKED = 150_000
_ACT_ELEMS_NOMASK = 300_000
_STATIC_BUDGET = 8 * 1024 * 1024


def _pad_lane(n: int) -> int:
    return -(-n // _LANE) * _LANE


def _static_bytes(wb: int, N: int, C: int, H: int, has_mask: bool,
                  groups: int = 1) -> int:
    np_ = _pad_lane(N)
    ca = C // groups
    weights = (C * _pad_lane(3 * ca) + ca * _pad_lane(C)) * 2
    bias = (H // groups) * N * np_ * 4
    mask = (wb * N * np_ * 4) if has_mask else 0
    return weights + bias + mask


def pick_window_block(nW_img: int, Bn: int, N: int, C: int, H: int,
                      has_mask: bool, groups: int = 1) -> int:
    """Largest WB dividing nW_img (mask alignment) and Bn that fits VMEM.
    Returns 0 when even WB=1 does not fit (caller must fall back)."""
    act_budget = _ACT_ELEMS_MASKED if has_mask else _ACT_ELEMS_NOMASK
    if N * C > act_budget:
        return 0
    wb = min(nW_img, Bn, act_budget // (N * C))
    while wb >= 1:
        if nW_img % wb == 0 and Bn % wb == 0 and \
                _static_bytes(wb, N, C, H, has_mask,
                              groups) <= _STATIC_BUDGET:
            return wb
        wb -= 1
    return 0


def pick_config(nW_img: int, Bn: int, N: int, C: int, H: int,
                has_mask: bool):
    """(wb, groups) for these shapes: groups > 1 = head-split mode (each
    pallas call covers H/groups heads with sliced weights — stage-4
    C >= 1024 exceeds VMEM with the full weight set).  (0, 0) = no fit.

    swin_large stage 4 (C=1536, H=48, mask-less) lands on groups=4.  In a
    scan-amortized *isolated* harness that config measures slower than the
    attention-only fallback (0.97 vs 0.67 ms/block), but end-to-end
    swin_large_224 lineareval it is consistently ~1.4% *faster* (845.5 vs
    833.9 img/s, 3 reps each) — e2e governs kernel dispatch decisions here
    (see PERF.md; isolated per-op timings mislead on this chip)."""
    for groups in (1, 2, 4, 8):
        if H % groups:
            continue
        ca = C // groups
        if ca % (H // groups) or ca % 32:
            continue
        wb = pick_window_block(nW_img, Bn, N, C, H, has_mask, groups)
        if wb:
            return wb, groups
    return 0, 0


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _head_split(single_group_fn, w_qkv, b_qkv, bias, w_proj, b_proj,
                num_heads: int, C: int, groups: int):
    """Head-split mode (stage-4 shapes: C >= 1024 puts the full weight set
    past VMEM): ``single_group_fn(wq, bq, bias, wp, bp, Hg)`` runs one
    pallas call over H/G heads with sliced qkv columns / bias rows / proj
    rows; the partial projections sum in XLA.  ``b_proj`` rides on group 0
    only.  Shared by the flat (``_fwd_impl``) and spatial
    (``_fwd_impl_spatial``) variants so the slicing convention cannot
    diverge."""
    Hg = num_heads // groups
    Ca = C // groups
    out = None
    for g in range(groups):
        wq_g = jnp.concatenate(
            [w_qkv[:, t * C + g * Ca:t * C + (g + 1) * Ca]
             for t in range(3)], axis=1)                 # (C, 3Ca)
        bq_g = jnp.concatenate(
            [b_qkv[:, t * C + g * Ca:t * C + (g + 1) * Ca]
             for t in range(3)], axis=1)                 # (1, 3Ca)
        bias_g = bias[g * Hg:(g + 1) * Hg]
        wp_g = w_proj[g * Ca:(g + 1) * Ca, :]            # (Ca, C)
        bp_g = b_proj if g == 0 else jnp.zeros_like(b_proj)
        part = single_group_fn(wq_g, bq_g, bias_g, wp_g, bp_g, Hg)
        out = part if out is None else out + part
    return out


def _block_compute(x, wqkv_ref, bqkv_ref, bias_ref, mask, wproj_ref,
                   bproj_ref, *, WB: int, N: int, num_heads: int,
                   scale: float, kv_len: int):
    """Shared kernel core: qkv matmul → per-head attention → proj over a
    flattened (WB·N, C) window chunk; returns (WB·N, C) fp32."""
    # Ca = attention width of THIS program's head group (== C except in
    # head-split mode, where each program covers H/G heads of a C-wide x)
    Ca = wqkv_ref.shape[1] // 3
    D = Ca // num_heads
    qkv = jax.lax.dot(x, wqkv_ref[...], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[...].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)                               # (WB·N, 3Ca)
    heads = []
    for h in range(num_heads):
        q = qkv[:, h * D:(h + 1) * D].reshape(WB, N, D)
        k = qkv[:, Ca + h * D:Ca + (h + 1) * D].reshape(WB, N, D)
        v = qkv[:, 2 * Ca + h * D:2 * Ca + (h + 1) * D].reshape(WB, N, D)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale     # (WB, N, N)
        s = s + bias_ref[h].astype(jnp.float32)[None]
        if mask is not None:
            s = s + mask
        if kv_len < N:                     # padded window tokens (static)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(col < kv_len, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        heads.append((o / l).astype(x.dtype).reshape(WB * N, D))
    attn = jnp.concatenate(heads, axis=-1)                  # (WB·N, Ca)
    out = jax.lax.dot(attn, wproj_ref[...],
                      preferred_element_type=jnp.float32)
    return out + bproj_ref[...].astype(jnp.float32)


def _fwd_kernel(*refs, num_heads: int, scale: float, has_mask: bool,
                kv_len: int):
    if has_mask:
        (x_ref, wqkv_ref, bqkv_ref, bias_ref, mask_ref, wproj_ref,
         bproj_ref, o_ref) = refs
    else:
        (x_ref, wqkv_ref, bqkv_ref, bias_ref, wproj_ref, bproj_ref,
         o_ref) = refs
    WB, N, C = x_ref.shape
    x = x_ref[...].reshape(WB * N, C)
    mask = mask_ref[...].astype(jnp.float32) if has_mask else None
    out = _block_compute(x, wqkv_ref, bqkv_ref, bias_ref, mask, wproj_ref,
                         bproj_ref, WB=WB, N=N, num_heads=num_heads,
                         scale=scale, kv_len=kv_len)
    o_ref[...] = out.reshape(WB, N, C).astype(o_ref.dtype)


def _fwd_impl(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj, num_heads, scale,
              wb, kv_len, groups=1):
    Bn, N, C = x.shape
    has_mask = mask is not None
    if groups > 1:
        return _head_split(
            lambda wq, bq, bg, wp, bp, Hg: _fwd_impl(
                x, wq, bq, bg, mask, wp, bp, Hg, scale, wb, kv_len),
            w_qkv, b_qkv, bias, w_proj, b_proj, num_heads, C, groups)
    Ca = w_qkv.shape[1] // 3
    grid = (Bn // wb,)
    xspec = pl.BlockSpec((wb, N, C), lambda i: (i, 0, 0))
    H = num_heads
    in_specs = [
        xspec,
        pl.BlockSpec((C, 3 * Ca), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * Ca), lambda i: (0, 0)),
        pl.BlockSpec((H, N, N), lambda i: (0, 0, 0)),
    ]
    args = [x, w_qkv, b_qkv, bias]
    if has_mask:
        n_mask_blocks = mask.shape[0] // wb
        in_specs.append(pl.BlockSpec((wb, N, N),
                                     lambda i: (i % n_mask_blocks, 0, 0)))
        args.append(mask)
    in_specs.extend([
        pl.BlockSpec((Ca, C), lambda i: (0, 0)),
        pl.BlockSpec((1, C), lambda i: (0, 0)),
    ])
    args.extend([w_proj, b_proj])
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale,
                          has_mask=has_mask, kv_len=kv_len),
        out_shape=jax.ShapeDtypeStruct((Bn, N, C), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=xspec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(*args)


# --------------------------------------------------------------------------
# custom VJP — backward recomputes through the partially-fused path
# --------------------------------------------------------------------------

def _ref_forward(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj, num_heads,
                 scale, kv_len=None):
    """qkv matmul (XLA) → fused window-attention kernel → proj matmul.
    ``kv_len`` (< N for lane-padded windows) reproduces the fused kernel's
    padded-key masking so the recomputed backward matches the forward."""
    Bn, N, C = x.shape
    D = C // num_heads
    if kv_len is not None and kv_len < N:
        km = jnp.where(jnp.arange(N)[None, None, :] >= kv_len, -1e30, 0.0)
        if mask is None:
            # tile to a window count that divides Bn so window_attention's
            # chunk picker keeps fat multi-window programs (a (1, N, N)
            # mask would force wb=1 — one window per program)
            g = min(Bn, 64)
            while Bn % g:
                g -= 1
            mask = jnp.broadcast_to(km, (g, N, N))
        else:
            mask = mask + km
    qkv = jnp.dot(x, w_qkv) + b_qkv[0].astype(x.dtype)
    qkv = qkv.reshape(Bn, N, 3, num_heads, D)
    out = window_attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias,
                           mask, scale=scale)
    out = out.reshape(Bn, N, C)
    return jnp.dot(out, w_proj) + b_proj[0].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _window_block(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj, num_heads,
                  scale, wb, kv_len, groups):
    return _fwd_impl(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj, num_heads,
                     scale, wb, kv_len, groups)


def _wb_fwd(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj, num_heads, scale,
            wb, kv_len, groups):
    out = _fwd_impl(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj, num_heads,
                    scale, wb, kv_len, groups)
    return out, (x, w_qkv, b_qkv, bias, mask, w_proj, b_proj)


def _wb_bwd(num_heads, scale, wb, kv_len, groups, res, do):
    # padded window rows (kv_len < N) carry zero cotangents: the public
    # wrapper slices them off, so `do` arrives zero there and the recompute
    # path's key contributions cancel in the bias/mask padding (zeros)
    x, w_qkv, b_qkv, bias, mask, w_proj, b_proj = res

    def fwd(x, w_qkv, b_qkv, bias, w_proj, b_proj):
        return _ref_forward(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                            num_heads, scale, kv_len)

    _, vjp = jax.vjp(fwd, x, w_qkv, b_qkv, bias, w_proj, b_proj)
    dx, dw_qkv, db_qkv, dbias, dw_proj, db_proj = vjp(do)
    return dx, dw_qkv, db_qkv, dbias, None, dw_proj, db_proj


_window_block.defvjp(_wb_fwd, _wb_bwd)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def window_block(x: jax.Array, w_qkv: jax.Array,
                 b_qkv: Optional[jax.Array], bias: jax.Array,
                 mask: Optional[jax.Array], w_proj: jax.Array,
                 b_proj: Optional[jax.Array], *, num_heads: int,
                 scale: Optional[float] = None) -> jax.Array:
    """Fused qkv→window-attention→proj over ``(Bn, N, C)`` windows.

    Differentiable in x / weights / biases / bias-table gather output.
    Call :func:`fits` first — raises if the working set exceeds VMEM.

    Windows whose token count is not sublane-aligned (window-7's N=49 —
    the in-kernel (WB·N, D) → (WB, N, D) head reshape is a Mosaic
    "unsupported shape cast" there) are padded to the next multiple of 16;
    padded keys are masked in-kernel and padded query rows sliced off.
    """
    Bn, N, C = x.shape
    if scale is None:
        scale = (C // num_heads) ** -0.5
    NP = _pad_sublane(N)
    kv_len = N
    if NP != N:
        pad = NP - N
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (0, pad), (0, pad)))
    nW = mask.shape[0] if mask is not None else min(Bn, 64)
    wb, groups = pick_config(nW, Bn, NP, C, num_heads, mask is not None)
    if wb == 0:
        raise ValueError("window_block working set exceeds VMEM; "
                         "check fits() before dispatching")
    if b_qkv is None:
        b_qkv = jnp.zeros((3 * C,), x.dtype)
    if b_proj is None:
        b_proj = jnp.zeros((C,), x.dtype)
    out = _window_block(x, w_qkv, b_qkv.reshape(1, 3 * C), bias, mask,
                        w_proj, b_proj.reshape(1, C), num_heads,
                        float(scale), wb, kv_len, groups)
    return out[:, :N] if NP != N else out


def _pad_sublane(n: int) -> int:
    return -(-n // 16) * 16


# --------------------------------------------------------------------------
# spatial (band-gather) variant: partition/reverse folded into the DMA
# --------------------------------------------------------------------------
#
# `examples/perf/swin_overhead_ablation.json` priced the XLA window
# partition/reverse transposes at 12.6% of swin_base_384 e2e — two full
# feature-map HBM round-trips per block, run as standalone transpose
# kernels.  This variant consumes the padded (B, Hp, Wp, C) map in its
# NATURAL tiled layout: each program's BlockSpec slices a (1, w, WBw·w, C)
# row-band of windows (slicing non-minor dims only — no retiling, no copy;
# a 6-D `reshape(B, nH, w, nWc, w, C)` view was tried first and XLA
# inserted a physical relayout copy before the kernel because the minor
# (12, 128) dims tile sublane-padded — see PERF.md) and re-packs the
# band's windows into (WBw·w², C) token order with in-VMEM strided slices.
# The partition/reverse transposes become VMEM-local shuffles overlapped
# with compute instead of HBM round-trips.
#
# Windows whose token count w² is not sublane-aligned (window-7's N=49)
# are padded to NP = 16-multiple rows *inside* the kernel (zero rows after
# each window's merge; padded keys masked via kv_len, padded query rows
# never stored) — bias/mask are zero-padded to (·, NP, NP) before the call.
#
# Non-lane-tile channels (C not a 128 multiple — swin_tiny/small stage 1-2
# C=96/192, swin_large stage 1 C=192): Mosaic rejects the (w, w, C) ->
# (w², C) shape cast on *sliced* (sublane-offset) vectors unless the lane
# dim is an exact 128 multiple ("unsupported shape cast"), so the band is
# lane-padded to the next 128 multiple ONCE at offset 0 (padding a sliced
# vector instead trips "result/input offset mismatch on non-concat
# dimension"), the casts run at CL lanes, and the channel slice-back
# happens after the row concat — all VMEM-local.


def _fwd_kernel_spatial(*refs, num_heads: int, scale: float, has_mask: bool,
                        window: int, wbw: int, wbh: int = 1):
    if has_mask:
        (x_ref, wqkv_ref, bqkv_ref, bias_ref, mask_ref, wproj_ref,
         bproj_ref, o_ref) = refs
    else:
        (x_ref, wqkv_ref, bqkv_ref, bias_ref, wproj_ref, bproj_ref,
         o_ref) = refs
    w = window
    N = w * w
    NP = _pad_sublane(N)
    C = x_ref.shape[-1]
    CL = _pad_lane(C)
    xb = x_ref[0]                                   # (WBh·w, WBw·w, C)
    if CL != C:
        xb = jnp.pad(xb, ((0, 0), (0, 0), (0, CL - C)))
    pieces = []
    for i in range(wbh):
        for j in range(wbw):
            xw = xb[i * w:(i + 1) * w,
                    j * w:(j + 1) * w, :].reshape(N, CL)
            if NP != N:
                xw = jnp.pad(xw, ((0, NP - N), (0, 0)))
            pieces.append(xw)
    x = jnp.concatenate(pieces, axis=0)        # (WBh·WBw·NP, CL) token-major
    if CL != C:
        x = x[:, :C]
    mask = mask_ref[...].astype(jnp.float32) if has_mask else None
    out = _block_compute(x, wqkv_ref, bqkv_ref, bias_ref, mask, wproj_ref,
                         bproj_ref, WB=wbh * wbw, N=NP, num_heads=num_heads,
                         scale=scale, kv_len=N)
    out = out.astype(o_ref.dtype)
    if CL != C:
        out = jnp.pad(out, ((0, 0), (0, CL - C)))
    for i in range(wbh):
        for j in range(wbw):
            win = out[(i * wbw + j) * NP:(i * wbw + j) * NP + N] \
                .reshape(w, w, CL)
            o_ref[0, i * w:(i + 1) * w, j * w:(j + 1) * w, :] = \
                win[:, :, :C]


def _fwd_impl_spatial(y, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                      num_heads, scale, wbw, window, groups=1, wbh=1):
    B, Hp, Wp, C = y.shape
    w = window
    nH, nWc = Hp // w, Wp // w
    has_mask = mask is not None
    if groups > 1:
        return _head_split(
            lambda wq, bq, bg, wp, bp, Hg: _fwd_impl_spatial(
                y, wq, bq, bg, mask, wp, bp, Hg, scale, wbw, window,
                wbh=wbh),
            w_qkv, b_qkv, bias, w_proj, b_proj, num_heads, C, groups)
    Ca = w_qkv.shape[1] // 3
    N = w * w
    NP = _pad_sublane(N)
    if NP != N:
        # padded window rows: keys masked in-kernel via kv_len; zero bias /
        # mask padding is never read on real rows
        bias = jnp.pad(bias, ((0, 0), (0, NP - N), (0, NP - N)))
        if has_mask:
            mask = jnp.pad(mask, ((0, 0), (0, NP - N), (0, NP - N)))
    H = num_heads
    nWb = nWc // wbw
    # multi-row bands (wbh > 1, requires full-row wbw so the window-major
    # mask rows stay contiguous): one program covers wbh consecutive
    # window rows — fatter matmuls, fewer programs, per-program fixed
    # costs amortized (the small-C stages' lever, PERF.md round-5)
    assert wbh == 1 or (wbw == nWc and nH % wbh == 0)
    grid = (B, nH // wbh, nWb)
    xspec = pl.BlockSpec((1, wbh * w, wbw * w, C),
                         lambda b, h, j: (b, h, j, 0))
    in_specs = [
        xspec,
        pl.BlockSpec((C, 3 * Ca), lambda b, h, j: (0, 0)),
        pl.BlockSpec((1, 3 * Ca), lambda b, h, j: (0, 0)),
        pl.BlockSpec((H, NP, NP), lambda b, h, j: (0, 0, 0)),
    ]
    args = [y, w_qkv, b_qkv, bias]
    if has_mask:
        # mask rows are window-major (hi·nWc + wi); this program's block of
        # wbh·wbw consecutive windows starts at block index h·nWb + j
        in_specs.append(pl.BlockSpec(
            (wbh * wbw, NP, NP),
            lambda b, h, j, nWb=nWb: (h * nWb + j, 0, 0)))
        args.append(mask)
    in_specs.extend([
        pl.BlockSpec((Ca, C), lambda b, h, j: (0, 0)),
        pl.BlockSpec((1, C), lambda b, h, j: (0, 0)),
    ])
    args.extend([w_proj, b_proj])
    return pl.pallas_call(
        functools.partial(_fwd_kernel_spatial, num_heads=num_heads,
                          scale=scale, has_mask=has_mask, window=window,
                          wbw=wbw, wbh=wbh),
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=xspec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _window_block_spatial(y, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                          num_heads, scale, wbw, window, groups, wbh):
    return _fwd_impl_spatial(y, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                             num_heads, scale, wbw, window, groups, wbh)


def _wbs_fwd(y, w_qkv, b_qkv, bias, mask, w_proj, b_proj, num_heads,
             scale, wbw, window, groups, wbh):
    out = _fwd_impl_spatial(y, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                            num_heads, scale, wbw, window, groups, wbh)
    return out, (y, w_qkv, b_qkv, bias, mask, w_proj, b_proj)


def _wbs_bwd(num_heads, scale, wbw, window, groups, wbh, res, do):
    # recompute through the partially-fused reference path (XLA partition
    # transpose → window_attention kernel → reverse transpose): finetune
    # pays the transposes in the backward only; the forward never does
    y, w_qkv, b_qkv, bias, mask, w_proj, b_proj = res
    _, Hp, Wp, _ = y.shape
    # lazy import: the window layout contract (mask/window-major order the
    # kernels depend on) is defined once in models/swin.py; ops→models at
    # module level would cycle
    from vit_torch_tpu.models.swin import window_partition, window_reverse

    def fwd(y, w_qkv, b_qkv, bias, w_proj, b_proj):
        wins = window_partition(y, window)
        out = _ref_forward(wins, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                           num_heads, scale)
        return window_reverse(out, window, Hp, Wp)

    _, vjp = jax.vjp(fwd, y, w_qkv, b_qkv, bias, w_proj, b_proj)
    dy, dw_qkv, db_qkv, dbias, dw_proj, db_proj = vjp(do)
    return dy, dw_qkv, db_qkv, dbias, None, dw_proj, db_proj


_window_block_spatial.defvjp(_wbs_fwd, _wbs_bwd)


def window_block_spatial(y: jax.Array, w_qkv: jax.Array,
                         b_qkv: Optional[jax.Array], bias: jax.Array,
                         mask: Optional[jax.Array], w_proj: jax.Array,
                         b_proj: Optional[jax.Array], *, num_heads: int,
                         window: int,
                         scale: Optional[float] = None) -> jax.Array:
    """Fused window block over the padded **spatial** map (B, Hp, Wp, C).

    Numerically ``window_reverse(window_block(window_partition(y, w), …))``
    with the partition/reverse transposes folded into the kernel (VMEM-local
    band repack; the map is read/written in its natural layout).
    Call :func:`fits_spatial` first.
    """
    B, Hp, Wp, C = y.shape
    w = window
    if scale is None:
        scale = (C // num_heads) ** -0.5
    nWc = Wp // w
    wbw, groups = pick_config_spatial(nWc, _pad_sublane(w * w), C,
                                      num_heads, mask is not None, w)
    if wbw == 0:
        raise ValueError("window_block_spatial working set exceeds VMEM; "
                         "check fits_spatial() before dispatching")
    wbh = pick_row_band(Hp // w, nWc, wbw, _pad_sublane(w * w), C,
                        num_heads, mask is not None, groups)
    if b_qkv is None:
        b_qkv = jnp.zeros((3 * C,), y.dtype)
    if b_proj is None:
        b_proj = jnp.zeros((C,), y.dtype)
    return _window_block_spatial(y, w_qkv, b_qkv.reshape(1, 3 * C), bias,
                                 mask, w_proj, b_proj.reshape(1, C),
                                 num_heads, float(scale), wbw, w, groups,
                                 wbh)


def pick_row_band(nH: int, nWc: int, wbw: int, N: int, C: int, H: int,
                  has_mask: bool, groups: int) -> int:
    """WBh (window ROWS per program) for the band kernel: multi-row bands
    amortize per-program fixed costs and fatten the per-program matmuls at
    the small-C stages (PERF.md round-5 swin_tiny decomposition: stages
    0/1 run 9-16% MFU with 4.8 µs programs).  Requires full-row wbw (mask
    rows stay contiguous) and wbh | nH.  The activation budget is the
    same table the wbw picker uses, applied to the whole wbh·wbw band.
    ``VITX_WBH`` overrides (int; 1 disables)."""
    import os
    env = os.environ.get("VITX_WBH", "")
    if env:
        v = max(1, int(env))
        while v > 1 and (nH % v or wbw != nWc):
            v -= 1
        return v
    if wbw != nWc or groups != 1:
        return 1
    act_budget = _ACT_ELEMS_MASKED if has_mask else _ACT_ELEMS_NOMASK
    wbh = min(nH, max(1, act_budget // max(1, wbw * N * C)))
    while wbh > 1 and (nH % wbh or not _band_qkv_ok(wbh, wbw, N, C)):
        wbh -= 1
    return wbh


def _band_qkv_ok(wbh: int, wbw: int, NP: int, C: int) -> bool:
    """Mosaic scoped-VMEM guard for multi-row bands: the per-program fp32
    qkv transient (WB·NP, 3C) is the allocation that tipped the b1 cell
    (C=256, wbh=4 → 3.1 MB estimate) over the 16 MB scoped limit on-chip
    while the s0 cell (C=96, wbh=4 → 2.36 MB) compiled — cap at 2.5 MB."""
    return wbh * wbw * NP * 3 * C * 4 <= int(2.5 * 1024 * 1024)


def pick_config_spatial(nWc: int, N: int, C: int, H: int, has_mask: bool,
                        window: Optional[int] = None):
    """(wbw, groups) for the spatial variant: WBw consecutive same-row
    windows per program, so wbw must divide the per-row window count.
    With ``window`` given, also enforce Mosaic's block-shape rule on the
    x-block's second-minor dim: wbw·window must be a multiple of 8 or the
    full row (wbw == nWc) — historical picks all landed on full rows, so
    this was latent until the full-block variant's tighter budgets."""
    for groups in (1, 2, 4, 8):
        if H % groups:
            continue
        ca = C // groups
        if ca % (H // groups) or ca % 32:
            continue
        wbw = pick_window_block(nWc, nWc, N, C, H, has_mask, groups)
        if window is not None:
            while wbw >= 1 and not _wbw_aligned(wbw, window, nWc):
                wbw -= 1
        if wbw:
            return wbw, groups
    return 0, 0


def fits_spatial(Hp: int, Wp: int, window: int, C: int,
                 num_heads: int, has_mask: bool) -> bool:
    """True when the band-gather spatial kernel can run at these shapes
    (unaligned w² is padded to a 16-multiple inside the kernel; the batch
    dim never matters — the grid parallelizes over it)."""
    w = window
    if C % num_heads or C % 32:
        return False
    if Hp % w or Wp % w or Hp // w < 1 or Wp // w < 1:
        return False
    wbw, _ = pick_config_spatial(Wp // w, _pad_sublane(w * w), C,
                                 num_heads, has_mask, w)
    return wbw > 0


# --------------------------------------------------------------------------
# full-block spatial variant: LN1 + attention + residual + LN2 + MLP +
# residual in ONE program
# --------------------------------------------------------------------------
#
# The band-gather kernel above removed the partition/reverse transposes, but
# the rest of the Swin block still round-trips the full (B, Hp, Wp, C) map
# through HBM six more times per block: LN1 read/write, residual add, LN2
# read/write, fc1 read + (4C-wide!) hidden write, fc2 read/write, second
# residual.  At swin_tiny's stage-1 shapes (56×56×96) each pass is ~HBM
# bound and the MFU ledger (PERF.md "why swin_tiny sits at ~12%") attributes
# the remaining e2e-vs-shape-bound gap exactly to these inter-op trips.
# This variant reads the RAW map band once, computes LN1 → windowed
# attention → residual → LN2 → MLP → residual entirely in VMEM, and writes
# the block output once.  LayerNorm numerics replicate flax
# (fp32 fast-variance stats, fp32 scale/bias, one cast back); matmul
# rounding mirrors the XLA path (fp32 accumulation, cast to the compute
# dtype between ops).
#
# Shift commutes: every non-attention op here is pixel-wise, so callers
# roll the RAW map before the kernel and unroll after — identical to
# rolling the normed map (the mask is built for the rolled layout either
# way).  Spatial padding does NOT commute (LN of a zero-padded row differs
# from zero-padding the LN output), so callers must fall back when the map
# needs padding — every published config at its native resolution is
# unpadded.  DropPath must be inactive (rate 0 or deterministic): the
# residuals are fused inside.
#
# Weights for qkv+proj+fc1+fc2 total 12C² — VMEM-resident through C=512;
# stage-4 shapes (C ≥ 1024) fall back to the attention-only band kernel
# (where the MLP matmuls are fat enough for XLA anyway).


def _ln_rows_f32(x32, scale_ref, bias_ref, eps: float = 1e-5):
    """flax LayerNorm over the last axis of fp32 (T, C) rows: fast-variance
    fp32 stats, fp32 scale/bias, caller casts the result."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = x32 - mu
    mul = jax.lax.rsqrt(var + eps) * scale_ref[...].astype(jnp.float32)
    return y * mul + bias_ref[...].astype(jnp.float32)


def _gelu_f32(x32):
    """Exact-GELU on fp32 rows (matches ``models.layers.gelu_exact``,
    which upcasts to fp32, applies 0.5·x·(1+erf(x/√2)) and casts back).
    Mosaic has no erf lowering (``jax.lax.erf`` in-kernel raises
    "Unimplemented primitive ... erf" — caught by the round-4 on-chip
    bench), so this uses ``fused_mlp._erf``'s A&S 7.1.26 polynomial
    (|err| ≤ 1.5e-7, below bf16 resolution)."""
    from vit_torch_tpu.ops.fused_mlp import _erf
    return 0.5 * x32 * (1.0 + _erf(x32 * 0.7071067811865476))


def _fwd_kernel_spatial_full(*refs, num_heads: int, scale: float,
                             has_mask: bool, window: int, wbw: int):
    if has_mask:
        (x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref, mask_ref,
         wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
         b2_ref, o_ref) = refs
    else:
        (x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, bias_ref,
         wproj_ref, bproj_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
         b2_ref, o_ref) = refs
    w = window
    N = w * w
    NP = _pad_sublane(N)
    C = x_ref.shape[-1]
    CL = _pad_lane(C)
    dt = x_ref.dtype
    xb = x_ref[0]                                   # (w, WBw·w, C) RAW
    if CL != C:
        xb = jnp.pad(xb, ((0, 0), (0, 0), (0, CL - C)))
    pieces = []
    for j in range(wbw):
        xw = xb[:, j * w:(j + 1) * w, :].reshape(N, CL)
        if NP != N:
            xw = jnp.pad(xw, ((0, NP - N), (0, 0)))
        pieces.append(xw)
    x = jnp.concatenate(pieces, axis=0)             # (WBw·NP, CL)
    if CL != C:
        x = x[:, :C]
    # LN1 → attention core → residual (residual adds in the compute dtype,
    # matching the model's x + attn_out bf16 add)
    t = _ln_rows_f32(x.astype(jnp.float32), ln1s_ref, ln1b_ref).astype(dt)
    mask = mask_ref[...].astype(jnp.float32) if has_mask else None
    attn = _block_compute(t, wqkv_ref, bqkv_ref, bias_ref, mask, wproj_ref,
                          bproj_ref, WB=wbw, N=NP, num_heads=num_heads,
                          scale=scale, kv_len=N)
    h = x + attn.astype(dt)                         # (WBw·NP, C)
    # LN2 → fc1 → GELU → fc2 → residual, XLA-path rounding (cast to the
    # compute dtype after each fp32-accumulated matmul)
    u = _ln_rows_f32(h.astype(jnp.float32), ln2s_ref, ln2b_ref).astype(dt)
    hid = jax.lax.dot(u, w1_ref[...], preferred_element_type=jnp.float32)
    hid = hid.astype(dt) + b1_ref[...].astype(dt)
    g = _gelu_f32(hid.astype(jnp.float32)).astype(dt)
    m = jax.lax.dot(g, w2_ref[...], preferred_element_type=jnp.float32)
    m = m.astype(dt) + b2_ref[...].astype(dt)
    out = (h + m).astype(o_ref.dtype)
    if CL != C:
        out = jnp.pad(out, ((0, 0), (0, CL - C)))
    for j in range(wbw):
        win = out[j * NP:j * NP + N].reshape(w, w, CL)
        o_ref[0, :, j * w:(j + 1) * w, :] = win[:, :, :C]


def _fwd_impl_spatial_full(x, ln1s, ln1b, w_qkv, b_qkv, bias, mask, w_proj,
                           b_proj, ln2s, ln2b, w1, b1, w2, b2, num_heads,
                           scale, wbw, window):
    B, Hp, Wp, C = x.shape
    w = window
    nH, nWc = Hp // w, Wp // w
    has_mask = mask is not None
    N = w * w
    NP = _pad_sublane(N)
    if NP != N:
        bias = jnp.pad(bias, ((0, 0), (0, NP - N), (0, NP - N)))
        if has_mask:
            mask = jnp.pad(mask, ((0, 0), (0, NP - N), (0, NP - N)))
    H = num_heads
    hidden = w1.shape[1]
    nWb = nWc // wbw
    grid = (B, nH, nWb)
    xspec = pl.BlockSpec((1, w, wbw * w, C), lambda b, h, j: (b, h, j, 0))
    const2 = lambda b, h, j: (0, 0)                          # noqa: E731
    in_specs = [
        xspec,
        pl.BlockSpec((1, C), const2),                        # ln1 scale
        pl.BlockSpec((1, C), const2),                        # ln1 bias
        pl.BlockSpec((C, 3 * C), const2),
        pl.BlockSpec((1, 3 * C), const2),
        pl.BlockSpec((H, NP, NP), lambda b, h, j: (0, 0, 0)),
    ]
    args = [x, ln1s.reshape(1, C), ln1b.reshape(1, C), w_qkv, b_qkv, bias]
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (wbw, NP, NP), lambda b, h, j, nWb=nWb: (h * nWb + j, 0, 0)))
        args.append(mask)
    in_specs.extend([
        pl.BlockSpec((C, C), const2),
        pl.BlockSpec((1, C), const2),
        pl.BlockSpec((1, C), const2),                        # ln2 scale
        pl.BlockSpec((1, C), const2),                        # ln2 bias
        pl.BlockSpec((C, hidden), const2),
        pl.BlockSpec((1, hidden), const2),
        pl.BlockSpec((hidden, C), const2),
        pl.BlockSpec((1, C), const2),
    ])
    args.extend([w_proj, b_proj, ln2s.reshape(1, C), ln2b.reshape(1, C),
                 w1, b1.reshape(1, hidden), w2, b2.reshape(1, C)])
    return pl.pallas_call(
        functools.partial(_fwd_kernel_spatial_full, num_heads=num_heads,
                          scale=scale, has_mask=has_mask, window=window,
                          wbw=wbw),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=xspec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18))
def _window_block_spatial_full(x, ln1s, ln1b, w_qkv, b_qkv, bias, mask,
                               w_proj, b_proj, ln2s, ln2b, w1, b1, w2, b2,
                               num_heads, scale, wbw, window):
    return _fwd_impl_spatial_full(x, ln1s, ln1b, w_qkv, b_qkv, bias, mask,
                                  w_proj, b_proj, ln2s, ln2b, w1, b1, w2,
                                  b2, num_heads, scale, wbw, window)


def _wbsf_fwd(x, ln1s, ln1b, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
              ln2s, ln2b, w1, b1, w2, b2, num_heads, scale, wbw, window):
    out = _fwd_impl_spatial_full(x, ln1s, ln1b, w_qkv, b_qkv, bias, mask,
                                 w_proj, b_proj, ln2s, ln2b, w1, b1, w2,
                                 b2, num_heads, scale, wbw, window)
    return out, (x, ln1s, ln1b, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                 ln2s, ln2b, w1, b1, w2, b2)


def _ln_map_f32(x, scale, bias):
    """flax-ordered LayerNorm over the last axis of a (B, H, W, C) map."""
    x32 = x.astype(jnp.float32)
    y = _ln_rows_f32(x32, scale.reshape(1, -1), bias.reshape(1, -1))
    return y.astype(x.dtype)


def _wbsf_bwd(num_heads, scale, wbw, window, res, do):
    # recompute through the unfused XLA composition (LN1 → partition →
    # window_attention kernel → reverse → residual → LN2 → MLP → residual);
    # the fused forward is a pure-fwd optimization, exactly like the other
    # window kernels in this file
    (x, ln1s, ln1b, w_qkv, b_qkv, bias, mask, w_proj, b_proj, ln2s, ln2b,
     w1, b1, w2, b2) = res
    _, Hp, Wp, _ = x.shape
    from vit_torch_tpu.models.swin import window_partition, window_reverse

    def fwd(x, ln1s, ln1b, w_qkv, b_qkv, bias, w_proj, b_proj, ln2s, ln2b,
            w1, b1, w2, b2):
        dt = x.dtype
        t = _ln_map_f32(x, ln1s, ln1b)
        wins = window_partition(t, window)
        a = _ref_forward(wins, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                         num_heads, scale)
        h = x + window_reverse(a, window, Hp, Wp).astype(dt)
        u = _ln_map_f32(h, ln2s, ln2b)
        hid = jnp.dot(u, w1).astype(dt) + b1.astype(dt)
        g32 = _gelu_f32(hid.astype(jnp.float32)).astype(dt)
        m = jnp.dot(g32, w2).astype(dt) + b2.astype(dt)
        return h + m

    _, vjp = jax.vjp(fwd, x, ln1s, ln1b, w_qkv, b_qkv, bias, w_proj,
                     b_proj, ln2s, ln2b, w1, b1, w2, b2)
    (dx, dln1s, dln1b, dw_qkv, db_qkv, dbias, dw_proj, db_proj, dln2s,
     dln2b, dw1, db1, dw2, db2) = vjp(do)
    return (dx, dln1s, dln1b, dw_qkv, db_qkv, dbias, None, dw_proj,
            db_proj, dln2s, dln2b, dw1, db1, dw2, db2)


_window_block_spatial_full.defvjp(_wbsf_fwd, _wbsf_bwd)


def window_block_full_spatial(x: jax.Array, ln1_scale, ln1_bias,
                              w_qkv, b_qkv, bias, mask, w_proj, b_proj,
                              ln2_scale, ln2_bias, w_fc1, b_fc1, w_fc2,
                              b_fc2, *, num_heads: int, window: int,
                              scale: Optional[float] = None) -> jax.Array:
    """Entire Swin block (LN1 → W-MSA → +residual → LN2 → MLP → +residual)
    over the **unpadded** spatial map (B, H, W, C), one pallas program per
    window band.  Shifted blocks: roll the raw map before, unroll after
    (pixel-wise ops commute with roll).  Call :func:`fits_spatial_full`
    first; requires DropPath/Dropout inactive (residuals are fused)."""
    B, Hp, Wp, C = x.shape
    w = window
    if scale is None:
        scale = (C // num_heads) ** -0.5
    wbw = pick_config_full(Wp // w, _pad_sublane(w * w), C, num_heads,
                           mask is not None, w_fc1.shape[1], w)
    if wbw == 0:
        raise ValueError("window_block_full_spatial working set exceeds "
                         "VMEM; check fits_spatial_full() first")
    dt = x.dtype
    if b_qkv is None:
        b_qkv = jnp.zeros((3 * C,), dt)
    if b_proj is None:
        b_proj = jnp.zeros((C,), dt)
    return _window_block_spatial_full(
        x, ln1_scale, ln1_bias, w_qkv, b_qkv.reshape(1, 3 * C), bias, mask,
        w_proj, b_proj.reshape(1, C), ln2_scale, ln2_bias, w_fc1, b_fc1,
        w_fc2, b_fc2, num_heads, float(scale), wbw, w)


def pick_config_full(nWc: int, N: int, C: int, H: int, has_mask: bool,
                     hidden: int, window: int) -> int:
    """WBw for the full-block variant (no head-split mode — stage-4 C
    exceeds the weight budget and falls back to the band kernel).

    Constraints beyond the attention-only picker:
    - Mosaic requires the x-block's second-minor dim (wbw·window) to be a
      multiple of 8 OR the full row (wbw == nWc) — caught live on-chip
      (window 12, wbw 1 → "block shape ... divisible by 8");
    - the activation budget shrinks to ONE THIRD of the attention-only
      budget for the in-VMEM residuals + the 4C-wide MLP hidden
      (``VITX_FULL_ACT`` overrides the element budget; the on-chip
      calibration A/B validated exactly this /3 value — larger budgets
      measured slower or VMEM-overflowed, see the PERF.md ledger)."""
    import os
    env = os.environ.get("VITX_FULL_ACT", "")
    if env:
        act_budget = int(env)
    else:
        act_budget = (_ACT_ELEMS_MASKED if has_mask
                      else _ACT_ELEMS_NOMASK) // 3
    if N * C > act_budget:
        return 0
    wbw = min(nWc, act_budget // (N * C))
    while wbw >= 1:
        if _wbw_aligned(wbw, window, nWc) and \
                _static_bytes_full(wbw, N, C, H, has_mask,
                                   hidden) <= _full_static_budget():
            return wbw
        wbw -= 1
    return 0


def _wbw_aligned(wbw: int, window: int, nWc: int) -> bool:
    """Mosaic block-shape rule for the spatial variants' x-block: the
    second-minor dim (wbw·window) must be a multiple of 8 or span the
    full row (wbw == nWc); wbw must also divide the per-row window
    count.  ONE copy — both spatial pickers dispatch through it."""
    return nWc % wbw == 0 and ((wbw * window) % 8 == 0 or wbw == nWc)


def _static_bytes_full(wb: int, N: int, C: int, H: int, has_mask: bool,
                       hidden: int) -> int:
    base = _static_bytes(wb, N, C, H, has_mask)
    mlp = (C * _pad_lane(hidden) + hidden * _pad_lane(C)) * 2
    vecs = (6 * C + hidden) * 4
    return base + mlp + vecs


def _full_static_budget() -> int:
    """VMEM-resident-constant budget for the full-block variant.
    ``VITX_FULL_STATIC`` (bytes) overrides for on-chip calibration —
    swin_base_384 stage 2 (C=512) misses the default 8 MB by ~1 MB."""
    import os
    env = os.environ.get("VITX_FULL_STATIC", "")
    return int(env) if env else _STATIC_BUDGET


def fits_spatial_full(Hp: int, Wp: int, window: int, C: int,
                      num_heads: int, has_mask: bool, hidden: int) -> bool:
    """True when the full-block spatial kernel can run at these shapes."""
    w = window
    if C % num_heads or C % 32:
        return False
    if Hp % w or Wp % w or Hp // w < 1 or Wp // w < 1:
        return False
    return pick_config_full(Wp // w, _pad_sublane(w * w), C, num_heads,
                            has_mask, hidden, w) > 0


def fits(Bn: int, N: int, C: int, num_heads: int, nW: Optional[int]) -> bool:
    """True when the fused window-block kernel can run at these shapes
    (unaligned N is lane-padded by :func:`window_block`)."""
    if C % num_heads or C % 32:
        # head slices are 32-lane granules; C=96/192 (swin_tiny stages 1-2)
        # compile and measure fine on v5e — full lane alignment not required
        return False
    if nW is not None and Bn % nW:
        return False
    wb, _ = pick_config(nW if nW is not None else min(Bn, 64),
                        Bn, _pad_sublane(N), C, num_heads, nW is not None)
    return wb > 0
