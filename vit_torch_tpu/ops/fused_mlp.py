"""Fused transformer-MLP Pallas TPU kernel: fc1 → GELU → fc2 in ONE kernel.

Motivation (PERF.md): Swin's early stages are HBM-bound — the MLP at
C = 128 (stage 1, 9216 tokens/image at 384²) moves ~10C of activation
bytes through HBM per block (read C, write 4C, read 4C, write C, plus the
GELU round-trip XLA usually fuses) for matmuls whose arithmetic intensity
(~51 FLOP/B) sits 4.7× under the v5e compute/bandwidth ratio.  Fusing both
matmuls and the GELU keeps the (T, 4C) hidden activations in VMEM: HBM
traffic drops to read C + write C and the op flips to compute-bound.

Covers the reference MLP (``models/swin.py`` ``Mlp``: Linear → GELU →
Linear, also the ViT/CaiT block MLP) as one fused TPU program.

Layouts: x ``(T, C)`` tokens (callers flatten leading dims), w1 ``(C, Hd)``,
b1 ``(1, Hd)``, w2 ``(Hd, C)``, b2 ``(1, C)``.  Grid tiles T; weights use
constant index maps so the pipeline keeps them VMEM-resident across
programs.  GELU is the exact (erf) variant — torch parity.

Backward recomputes through the plain XLA path (two matmuls + GELU VJP)
via custom VJP, so the fused forward is a pure-fwd optimization: the
linear-eval path (frozen backbone) gets the full win; finetune pays one
recomputed forward, offset by the fused forward's HBM savings.
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


_LANE = 128
_VMEM_BUDGET = 11 * 1024 * 1024
_MAX_TB = 1024


def _pad_lane(n: int) -> int:
    return -(-n // _LANE) * _LANE


def _erf(x):
    """fp32 erf via Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7 — below bf16
    resolution).  Mosaic has no erf lowering, so the kernel carries its own;
    outside kernels use ``jax.lax.erf``."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    # matches torch nn.GELU() / models.layers.gelu_exact to <2e-6 abs
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _vmem_bytes(tb: int, C: int, Hd: int, Co: int) -> int:
    cp, hp, cop = _pad_lane(C), _pad_lane(Hd), _pad_lane(Co)
    x_io = 2 * tb * (cp + cop) * 2              # x + o, double-buffered bf16
    hidden = tb * hp * (4 + 2)                  # fp32 accum + cast
    out = tb * cop * 4
    weights = (cp * hp + hp * cop) * 2 + (hp + cop) * 4
    return x_io + hidden + out + weights


def _pick_token_block(T: int, C: int, Hd: int, Co: int) -> int:
    tb = min(T, _MAX_TB)
    while tb >= 8:
        if T % tb == 0 and _vmem_bytes(tb, C, Hd, Co) <= _VMEM_BUDGET:
            return tb
        tb -= 8
    return 0


def fits(T: int, C: int, hidden: int, out_dim: Optional[int] = None) -> bool:
    """True when the fused MLP kernel can run at these shapes."""
    Co = out_dim if out_dim is not None else C
    if C % _LANE or hidden % _LANE or Co % _LANE:
        return False
    return _pick_token_block(T, C, hidden, Co) > 0


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jax.lax.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)[None]
    h = _gelu_exact(h).astype(x.dtype)
    out = jax.lax.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32)[None]
    o_ref[...] = out.astype(o_ref.dtype)


def _fwd_impl(x, w1, b1, w2, b2, tb):
    T, C = x.shape
    Hd = w1.shape[1]
    Co = w2.shape[1]
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((T, Co), x.dtype),
        grid=(T // tb,),
        in_specs=[
            pl.BlockSpec((tb, C), lambda i: (i, 0)),
            pl.BlockSpec((C, Hd), lambda i: (0, 0)),
            pl.BlockSpec((1, Hd), lambda i: (0, 0)),
            pl.BlockSpec((Hd, Co), lambda i: (0, 0)),
            pl.BlockSpec((1, Co), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb, Co), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=_interpret(),
    )(x, w1, b1, w2, b2)


def _ref_forward(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1) + b1[0].astype(x.dtype)
    h = (0.5 * h.astype(jnp.float32)
         * (1.0 + jax.lax.erf(h.astype(jnp.float32) * (2.0 ** -0.5))))
    h = h.astype(x.dtype)
    return jnp.dot(h, w2) + b2[0].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp(x, w1, b1, w2, b2, tb):
    return _fwd_impl(x, w1, b1, w2, b2, tb)


def _mlp_fwd(x, w1, b1, w2, b2, tb):
    return _fwd_impl(x, w1, b1, w2, b2, tb), (x, w1, b1, w2, b2)


def _mlp_bwd(tb, res, do):
    _, vjp = jax.vjp(_ref_forward, *res)
    return vjp(do)


_fused_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def fused_mlp(x: jax.Array, w1: jax.Array, b1: Optional[jax.Array],
              w2: jax.Array, b2: Optional[jax.Array]) -> jax.Array:
    """Fused fc1→GELU(exact)→fc2 over ``(..., C)`` tokens.

    Differentiable in all array inputs.  Call :func:`fits` with
    ``T = prod(leading dims)`` first.
    """
    lead = x.shape[:-1]
    C = x.shape[-1]
    Hd = w1.shape[1]
    Co = w2.shape[1]
    T = 1
    for d in lead:
        T *= d
    tb = _pick_token_block(T, C, Hd, Co)
    if tb == 0:
        raise ValueError("fused_mlp working set exceeds VMEM; "
                         "check fits() before dispatching")
    if b1 is None:
        b1 = jnp.zeros((Hd,), x.dtype)
    if b2 is None:
        b2 = jnp.zeros((Co,), x.dtype)
    out = _fused_mlp(x.reshape(T, C), w1, b1.reshape(1, Hd), w2,
                     b2.reshape(1, Co), tb)
    return out.reshape(*lead, Co)
