"""Dynamic W8A8 int8 matmul for the serving (inference) path.

v5e's MXU runs ``s8 x s8 -> s32`` at 394 TOP/s — 2x the 197 TFLOP/s bf16
peak — so the projection matmuls (qkv / proj / fc1 / fc2), which run at
~53% MXU utilization on bf16 (PERF.md roofline table), have int8 headroom.
This module implements standard dynamic post-training quantization:

- **weights**: symmetric per-output-channel int8 (``scale = absmax/127``),
  quantized *inside* the jitted forward.  The quantize pass is one sweep
  over the (C, F) weight — negligible next to the (T, C) x (C, F) token
  matmul — and it keeps a single fp32 checkpoint tree (no separate
  quantized parameter format, importers untouched).
- **activations**: symmetric per-token (per-row absmax) int8, computed on
  the fly ("dynamic" quantization — no calibration set needed).
- **accumulate** in s32 on the MXU, rescale in fp32, emit the caller's
  activation dtype.

Enabled via ``VITX_W8A8=1`` and dispatched from ``models/layers.py`` only
when ``deterministic=True`` — the rounding step has a zero gradient, so
the training path never routes through it.

Reference counterpart: none (khuongnd6/ViT_torch serves fp32/fp16); this
is a TPU-native extension targeting PERF.md lever #2.
"""

from __future__ import annotations

import contextlib
import os

import jax
import jax.numpy as jnp

_EPS = 1e-8

_PREQUANT_CAPTURE = 0


def w8a8_enabled() -> bool:
    """Opt-in flag for the int8 serving path (``VITX_W8A8=1``)."""
    return os.environ.get("VITX_W8A8", "") == "1"


@contextlib.contextmanager
def prequant_capture():
    """Export-time capture mode for prequantized weights.

    Inside this context, the w8a8 consumption sites (``models/layers.py:
    _prequant_kernel``) *create* an ``int8`` flax variable collection
    holding each matmul weight's ``(w_q, w_scale)``.  Run it around an
    EAGER ``model.apply(..., mutable=["int8"])`` — never inside a trace:
    the captured values must be concrete so a subsequent ``jax.export``
    trace bakes the int8 constants (not the fp32 kernels + quantize ops)
    into the serving artifact (``serving/export.py``).
    """
    global _PREQUANT_CAPTURE
    _PREQUANT_CAPTURE += 1
    try:
        yield
    finally:
        _PREQUANT_CAPTURE -= 1


def prequant_capturing() -> bool:
    return _PREQUANT_CAPTURE > 0


def quantize_rowwise(x: jax.Array):
    """Symmetric per-row int8 quantization over the last axis.

    Returns ``(x_q int8, scale fp32)`` with ``scale`` shaped
    ``x.shape[:-1] + (1,)`` such that ``x ~= x_q * scale``.
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = absmax / 127.0 + _EPS
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                   -127, 127).astype(jnp.int8)
    return x_q, scale


def quantize_weight(w: jax.Array):
    """Symmetric per-output-channel int8 quantization of a ``(K, N)`` weight.

    Returns ``(w_q int8, scale fp32 (N,))`` such that ``w ~= w_q * scale``.
    """
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = absmax / 127.0 + _EPS
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale),
                   -127, 127).astype(jnp.int8)
    return w_q, scale


def w8a8_dot(x: jax.Array, w: jax.Array, bias=None,
             out_dtype=None, pre=None) -> jax.Array:
    """``x @ w (+ bias)`` through the int8 MXU path.

    ``x``: ``(..., K)`` activations (any float dtype); ``w``: ``(K, N)``
    fp32/bf16 weight.  Both are quantized on the fly; the product
    accumulates in s32 and is rescaled by the per-token and per-channel
    scales in fp32.  Output dtype defaults to ``x.dtype``.

    ``pre``: optional prequantized ``(w_q, w_scale)`` — serving bundles
    bake these as int8 constants (captured via :func:`prequant_capture`),
    skipping the in-graph weight quantize; ``w`` then goes unused (and,
    being an unused closure constant, stays out of the exported artifact).
    """
    out_dtype = out_dtype or x.dtype
    x_q, x_scale = quantize_rowwise(x)
    w_q, w_scale = pre if pre is not None else quantize_weight(w)
    nd = x.ndim
    acc = jax.lax.dot_general(
        x_q, w_q, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * w_scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)
