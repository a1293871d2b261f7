"""Shared transformer building blocks for the model zoo.

TPU-first design notes:
- NHWC / channels-last layouts everywhere.
- Patch embedding is a reshape + matmul (not a conv): a stride==kernel conv
  is exactly a blocked matmul, and expressing it as ``reshape → dot`` maps
  straight onto the MXU with no conv lowering.
- Attention goes through :func:`vit_torch_tpu.ops.dot_product_attention`
  (Pallas flash kernel on TPU, fused XLA fallback elsewhere).
- Params are float32; activations run in the module's ``dtype`` (bfloat16 by
  default) with fp32 softmax/LayerNorm accumulation.

Capability parity: the reference's per-model copies of Mlp/Attention/
PatchEmbed/DropPath (timm-derived, e.g. reference ``models/cait.py:87-150``,
``models/swin.py:410-455``) collapse into this single module.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.ops.attention import dot_product_attention

Dtype = jnp.dtype

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU — torch's ``nn.GELU()`` default. flax's ``nn.gelu``
    defaults to the tanh approximation, which breaks logits parity.

    Evaluated as ``0.5·x·(1+erf(x/√2))`` in fp32, NOT through
    ``jax.nn.gelu(approximate=False)``: that lowers via ``lax.erfc``,
    whose bf16 codegen measures 1.9× slower than fp32 erf on v5e
    (343 vs 179 µs at the xcit-stem shape — ``examples/perf/
    gelu_probe.json``).  The fp32 upcast also matches torch's bf16
    behavior exactly (torch computes GELU in fp32 and rounds once) and
    avoids the ``1+erf`` cancellation a bf16 erf would hit in the
    negative tail."""
    x32 = x.astype(jnp.float32)
    y = 0.5 * x32 * (1.0 + jax.lax.erf(x32 * 0.7071067811865476))
    return y.astype(x.dtype)


import functools as _functools

# torch nn.LayerNorm's default eps is 1e-5 (flax defaults to 1e-6); Swin
# and the detection transformers construct LN with that default, so 1e-5 is
# the right base here.  The timm-derived families override per call site:
# ViT/DeiT (reference vision_all.py:330, deit.py:98), CaiT (cait.py:259)
# and XCiT (xcit.py:416) all pass eps=1e-6 explicitly.
LayerNorm = _functools.partial(nn.LayerNorm, epsilon=1e-5)


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *args, **kwargs):
        return x


class DenseParams(nn.Module):
    """Parameter holder with ``nn.Dense``'s exact tree layout
    (``<name>/kernel`` + ``<name>/bias``), returning the raw fp32 arrays.

    Used where a fused Pallas kernel consumes the weights directly (e.g.
    ``ops/window_block.py``) but the checkpoint importers / parity tests
    must keep seeing the standard Dense paths.  ``__call__(in_features)``
    replaces Dense's shape inference."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = trunc_normal_init

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        return kernel, bias


class LayerNormParams(nn.Module):
    """Parameter holder with ``nn.LayerNorm``'s exact tree layout
    (``<name>/scale`` + ``<name>/bias``, fp32, ones/zeros init), returning
    the raw arrays.  Used by the fully-fused Swin block path
    (``ops/window_block.py:window_block_full_spatial``), which computes
    flax-ordered LayerNorm inside the kernel; the unfused branch keeps
    calling ``nn.LayerNorm`` — both create the identical param tree, so
    checkpoints interchange across dispatch modes."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones,
                           (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (features,), jnp.float32)
        return scale, bias


class BatchNorm(nn.Module):
    """Batch normalization with torch-faithful running statistics.

    flax ``nn.BatchNorm`` updates the running variance with the BIASED
    batch estimator; torch ``BatchNorm2d`` — the reference's BN everywhere
    (ResNeXt bottlenecks via torchvision ``models/vision_all.py:334-341``,
    the XCiT conv stem/LPI ``models/xcit.py:58-141``) — uses the UNBIASED
    one (×n/(n−1)).  Train-mode *normalization* uses the biased variance in
    both frameworks, so the train-time forward/backward is unchanged; what
    the correction fixes is the running-statistics trajectory — the
    statistics a finetuned checkpoint later *evaluates* with.  Momentum
    follows the flax convention (new = m·old + (1−m)·batch): torch's
    default momentum 0.1 ≡ 0.9 here.  Param/stat leaf names match flax
    (``scale``/``bias``, ``mean``/``var``) so importers, checkpoints and
    the conv-BN eval folding are unaffected.  Normalization arithmetic runs
    in fp32 regardless of ``dtype`` (torch AMP autocasts BN to fp32 the
    same way); the result is cast back to ``dtype``.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (feat,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (feat,))
        # fp32 stats floor; fp64 runs (trajectory-parity tests) stay fp64
        ct = jnp.promote_types(jnp.float32, self.dtype)
        x32 = x.astype(ct)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=red)
            var = jnp.maximum(
                jnp.mean(x32 * x32, axis=red) - mean * mean, 0.0)
            if not self.is_initializing():
                n = 1
                for ax in red:
                    n *= x.shape[ax]
                corr = n / (n - 1) if n > 1 else 1.0
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * (var * corr)
        # one fused multiplier (flax's association): keeps the scan and
        # per-step train paths numerically aligned under XLA fusion (the
        # FRCNN scan-parity test diverged at 1e-4 with a two-multiply form)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x32 - mean) * mul + bias
        return y.astype(self.dtype)


class QDense(nn.Module):
    """``nn.Dense`` drop-in (identical ``kernel``/``bias`` param tree and
    init defaults) that routes through the dynamic-int8 matmul
    (``ops/quant.py``) when ``quant=True`` AND ``VITX_W8A8=1``.

    ``quant`` is the caller's deterministic-aware enable — pass
    ``_use_w8a8(deterministic)`` so the training path never quantizes.
    Used by the DETR transformer, whose layers take Dense kernels by name
    (checkpoint importers see the same tree either way)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        dt = self.dtype
        if self.quant:
            from vit_torch_tpu.ops.quant import w8a8_enabled
            if w8a8_enabled():
                from vit_torch_tpu.ops.quant import w8a8_dot
                return w8a8_dot(x.astype(dt), kernel, bias,
                                pre=_prequant_kernel(self, "kernel", kernel))
        y = jnp.dot(x.astype(dt), kernel.astype(dt))
        if bias is not None:
            y = y + bias.astype(dt)
        return y


def drop_path(x: jax.Array, rate: float, deterministic: bool,
              rng: Optional[jax.Array]) -> jax.Array:
    """Stochastic depth: drop the whole residual branch per sample."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        return drop_path(x, self.rate, deterministic, rng)


def _prequant_kernel(mod: nn.Module, name: str, kernel):
    """Prequantized ``(w_q, w_scale)`` for a w8a8-consumed kernel, or None.

    Serving bundles bake matmul weights as int8 constants
    (``serving/export.py``): an eager ``ops.quant.prequant_capture`` pass
    creates an ``int8`` variable collection by quantizing each consumed
    kernel once outside any trace; the export trace then reads the
    concrete values here, so jax.export bakes ``w_q``/``w_scale`` — not
    the fp32 kernel plus quantize ops — into the artifact.  On the normal
    dynamic path (no ``int8`` collection) this returns None and the
    weight quantizes in-graph.
    """
    from vit_torch_tpu.ops import quant
    name = name + "_q8"   # flax scopes require names unique across
    # collections AND submodules ("qkv"/"kernel" are taken)
    if quant.prequant_capturing():
        return mod.variable(
            "int8", name, lambda: quant.quantize_weight(kernel)).value
    if mod.has_variable("int8", name):
        return mod.variable("int8", name).value
    return None


def use_folded_bn(mdl: nn.Module, deterministic: bool) -> bool:
    """Dispatch eval-mode conv+BN folding (``fold_conv_bn_eval``).

    Inference only (running-stats BN is an affine map; train-mode BN
    depends on the batch) and only once variables exist (init must run the
    module path so the standard ``conv*/kernel`` + ``bn*/{scale,bias}`` +
    ``batch_stats`` tree is created — importers and checkpoints see no
    difference).  ``VITX_FOLD_BN=0`` disables.  Measured on-chip: the BN
    epilogue is a full extra pass over the activation map that XLA does
    not fuse into the conv — folding it into the kernel saved 18% of the
    XCiT conv-stem wall time (PERF.md stem ledger)."""
    import os
    return (deterministic and not mdl.is_initializing()
            and os.environ.get("VITX_FOLD_BN", "1") != "0")


def fold_conv_bn_eval(mdl: nn.Module, x: jax.Array, conv_name: str,
                      bn_name: str, *, strides=(1, 1), padding=((0, 0), (0, 0)),
                      groups: int = 1, dtype: Dtype = jnp.bfloat16,
                      eps: float = 1e-5) -> jax.Array:
    """Eval-mode ``BN(conv(x))`` as ONE conv: the BN affine is folded into
    the kernel (``w' = w * scale/sqrt(var+eps)``, bias
    ``b' = bias - mean * scale/sqrt(var+eps)``) — exact modulo fp
    association.  Reads the sibling ``nn.Conv``/``nn.BatchNorm`` variables
    created by the module path, so the param tree is byte-identical either
    way.  The fold runs in fp32 and casts once, and the per-channel
    vectors are loop constants under jit/scan, so XLA hoists them."""
    kern = mdl.get_variable("params", conv_name)["kernel"]
    bnp = mdl.get_variable("params", bn_name)
    stats = mdl.get_variable("batch_stats", bn_name)
    # sqrt+div (IEEE correctly-rounded), NOT rsqrt: under jax.export the
    # weights are baked constants, so XLA's evaluator constant-folds this
    # fold at compile time — rsqrt is approximate and rounds differently
    # between the evaluator and runtime codegen, which made exported
    # bundles drift from the live model (amplified through NMS/argmax
    # ties in detection heads)
    a = (bnp["scale"].astype(jnp.float32)
         / jnp.sqrt(stats["var"].astype(jnp.float32) + eps))
    b = bnp["bias"].astype(jnp.float32) - stats["mean"].astype(jnp.float32) * a
    folded = (kern.astype(jnp.float32) * a).astype(dtype)
    m = dense_regroup_factor(groups, kern.shape[2])
    if m > 1:
        folded, groups = dense_group_kernel(folded, groups, m), groups // m
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), folded,
        window_strides=tuple(strides), padding=tuple(padding),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(dtype)


def dense_regroup_factor(groups: int, cg: int) -> int:
    """Regroup factor ``m`` for the block-diagonal dense lowering of a
    grouped conv: ``m`` adjacent groups are merged into one dense block
    (``m××`` the FLOPs at that site, ``m·cg``-wide contractions,
    ``G/m`` XLA feature groups).  ``m == 1`` keeps XLA's native grouped
    conv; ``m == G`` is one fully dense conv.

    Measured on-chip (224px/bs32 finetune, `examples/perf/
    resnext_ablation.json` + `dense_groups_ab.json`): XLA:TPU lowers a
    32-group conv as 32 serial thin contractions — for resnext50_32x4d
    (cg=4, a 4-lane sliver of the 128-wide MXU) the grouped 3×3s were
    ~62% of the train step at 5.5% of the FLOPs, and full dense (m=32)
    ran the whole step 1.54× faster despite 32× those FLOPs.  For
    resnext101_32x8d (cg=8, 2× the arithmetic intensity and ~2× the
    grouped FLOP share) full dense measured −13%: the blowup outweighs
    the lane win, and the sweet spot is partial regrouping (see the m
    sweep in ``dense_groups_ab.json``).

    ``VITX_DENSE_GROUPS``: ``0`` disables, ``1``/unset picks the
    measured auto table, an integer forces that factor."""
    import os
    if groups <= 1:
        return 1
    env = os.environ.get("VITX_DENSE_GROUPS", "1")
    if env == "0":
        return 1
    if env != "1":
        m = max(1, int(env))
        while groups % m:
            m -= 1
        return m
    # auto: measured table — narrow groups win big from full dense
    # (resnext50, cg=4 at every stage: m=32 → 1500.8 img/s vs 961
    # native).  For everything wider, regroup by m=8: resnext101's
    # stages span cg=8/16/32/64 and the UNIFORM-m sweep
    # (dense_groups_ab.json) orders m=8 (543.1) > m=4 (481.0) > m=16
    # (449.8) > m=2 (403.8) > m=1 (358.8) > m=32 (311.9) — while the
    # prior per-cg rule ("cg ≥ 16 stays native") measured only 376.2
    # at its [m=auto] point, leaving stages 2-4 on XLA's serial thin
    # contractions.  m=8 at every site IS the measured argmax.
    if cg <= 4:
        return groups
    for m in (8, 4, 2):
        if groups % m == 0:
            return m
    return 1


def dense_group_kernel(kernel: jax.Array, groups: int,
                       m: Optional[int] = None) -> jax.Array:
    """Expand a grouped-conv HWIO kernel (kh, kw, cin/G, O) into the exact
    block-diagonal kernel for ``G/m`` merged groups (kh, kw, m·cin/G, O):
    within each supergroup of ``m`` original groups, output block j reads
    input block k iff ``k == j`` and zeros elsewhere.  The expansion is a
    linear scatter (einsum with I_m), so AD projects the dense-kernel
    gradient back onto the diagonal blocks — training through it is
    exactly grouped-conv training."""
    kh, kw, cg, out = kernel.shape
    if m is None:
        m = groups
    og = out // groups
    w = kernel.reshape(kh, kw, cg, groups // m, m, og)
    eye = jnp.eye(m, dtype=kernel.dtype)
    wd = jnp.einsum("kj,hwcsjo->hwkcsjo", eye, w)
    return wd.reshape(kh, kw, m * cg, out)


class GroupedConv(nn.Module):
    """Grouped 2-D conv with the same param tree as ``nn.Conv`` (one
    ``kernel`` of shape (kh, kw, cin/G, O)) but dispatched through the
    block-diagonal regrouped lowering — see ``dense_regroup_factor`` for
    the measured rationale."""

    features: int
    kernel_size: Tuple[int, int]
    strides: int = 1
    padding: int = 0
    groups: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cg = x.shape[-1] // self.groups
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.kernel_size, cg, self.features))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        groups = self.groups
        m = dense_regroup_factor(groups, cg)
        if m > 1:
            kernel = dense_group_kernel(kernel, groups, m)
            groups = groups // m
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.strides,) * 2,
            padding=((self.padding,) * 2,) * 2, feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _use_w8a8(deterministic: bool) -> bool:
    """Dispatch the dynamic-int8 serving path (``ops/quant.py``,
    ``VITX_W8A8=1``).  Inference only: ``jnp.round`` in the quantizer has a
    zero gradient, so the training path must never route through it."""
    if not deterministic:
        return False
    from vit_torch_tpu.ops.quant import w8a8_enabled
    return w8a8_enabled()


def _use_fused_mlp(T: int, C: int, hidden: int, out_dim: int) -> bool:
    """Dispatch to the fused fc1→GELU→fc2 Pallas kernel
    (``ops/fused_mlp.py``).  OPT-IN only (VITX_FUSED_MLP=1): measured on
    v5e the kernel loses 2-3× to the XLA path — XLA already chains
    fc1→GELU→fc2 without a full HBM round-trip, and the kernel's in-program
    erf polynomial serializes VPU work against the MXU (PERF.md)."""
    import os
    if os.environ.get("VITX_FUSED_MLP", "") != "1":
        return False
    from vit_torch_tpu.ops.fused_mlp import fits
    return fits(T, C, hidden, out_dim)


class Mlp(nn.Module):
    """Transformer MLP: Dense → GELU → Dense (+dropout).

    A fused Pallas kernel for the whole block exists (``ops/fused_mlp.py``
    — the (T, 4C) hidden activations never touch HBM) but measured 2-3×
    *slower* than XLA's own fc1→GELU→fc2 chain on v5e (PERF.md), so it is
    opt-in via ``VITX_FUSED_MLP=1``; the default is the XLA path below."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    act: Callable = gelu_exact

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 params_only: bool = False):
        C = x.shape[-1]
        out_dim = self.out_dim or C
        w1, b1 = DenseParams(self.hidden_dim, name="fc1")(C)
        w2, b2 = DenseParams(out_dim, name="fc2")(self.hidden_dim)
        if params_only:
            # fused full-block path consumes the weights directly
            return w1, b1, w2, b2
        dt = self.dtype
        T = 1
        for d in x.shape[:-1]:
            T *= d
        dropout_active = self.dropout > 0.0 and not deterministic
        if _use_w8a8(deterministic):
            # int8 serving path — takes precedence over the opt-in fused
            # kernel, matching Attention's dispatch order
            from vit_torch_tpu.ops.quant import w8a8_dot
            x = self.act(w8a8_dot(x.astype(dt), w1, b1,
                                  pre=_prequant_kernel(self, "fc1", w1)))
            return w8a8_dot(x, w2, b2,
                            pre=_prequant_kernel(self, "fc2", w2))
        if (self.act is gelu_exact and not dropout_active
                and _use_fused_mlp(T, C, self.hidden_dim, out_dim)):
            from vit_torch_tpu.ops.fused_mlp import fused_mlp
            return fused_mlp(x, w1.astype(dt), b1.astype(dt),
                             w2.astype(dt), b2.astype(dt))
        x = jnp.dot(x, w1.astype(dt)) + b1.astype(dt)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = jnp.dot(x, w2.astype(dt)) + b2.astype(dt)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def _attn_fused_block(x, num_heads: int) -> bool:
    """Dispatch to the fully-fused qkv+attention+proj kernel
    (``ops/attn_block.py``).

    Measured crossover (round-4 on-chip A/B, PERF.md fused-attn ledger):
    at flash-served lengths the per-batch-element serialized program
    forfeits XLA's cross-program matmul pipelining and LOSES (vitb8 bs32
    neutral, bs64 −10%), but in the short-sequence regime the flash
    kernel skips (N=197 < VITX_FLASH_MIN_SEQ) the XLA chain degrades
    badly at large batch (VMEM residency lost) while this kernel scales:
    dino_vits16 bs64 +28% (6649→8491 img/s), bs128 **+80%** (4663→8393).
    Default: TPU, B ≥ 64, and only where the flash path would NOT take
    the shape.  VITX_FUSED_ATTN=1 forces on, =0 off."""
    import os
    flag = os.environ.get("VITX_FUSED_ATTN", "")
    if flag == "0":
        return False
    from vit_torch_tpu.ops.attention import (
        _active_data_extent, _active_seq_mesh, flash_profitable)
    if _active_seq_mesh() is not None:
        return False                    # seq-sharded: ring attention path
    from vit_torch_tpu.ops.attn_block import fits
    B, N, C = x.shape
    if not fits(N, C, num_heads):
        return False
    if flag == "1":
        return True
    # the crossover is PER-CHIP batch; under a data-parallel mesh the
    # traced B is the global batch.  N must fill the kernel's 128-row
    # chunk reasonably: at tiny N the q/k/v buffers round up to _CHUNK
    # and the padding is wasted compute — vitb8@32px (N=17) measured
    # 4040 vs 8936 img/s with the kernel forced on (caught by the final
    # round-4 bench.py run)
    from vit_torch_tpu.ops.attn_block import _CHUNK
    return (jax.default_backend() == "tpu"
            and B // _active_data_extent() >= 64
            and N >= (3 * _CHUNK) // 4
            and not flash_profitable(N, num_heads, C // num_heads))


def _attn_packed_small(x, num_heads: int) -> bool:
    """Dispatch to the packed small-N fused attention kernel
    (``ops/attn_block.py:attention_block_packed``): several images share
    one program row-block with a block-diagonal mask.

    Targets the regime BOTH other kernels refuse — the reference's
    actual CIFAR finetune shape (32px → N=17, bs128) runs its attention
    module at ~25% of the MLP's efficiency through the XLA path (51% of
    the step, ``examples/perf/vit32_step_decompose.json``).

    DEFAULT OFF (opt-in via VITX_PACKED_ATTN=1): three on-chip A/Bs of
    the full finetune step (``examples/perf/packed_attn_ab.json`` +
    PERF.md small-N ledger) measured the kernel LOSING the train step —
    recompute backward 7979, analytic-backward-over-saved-qkv 8220 vs
    XLA 8835-8944 img/s.  The fused forward's relayout savings are
    cancelled by the backward's structural extras (the qkv residual
    write + the einsum attention core the VJP must still run at N=17).
    The kernel remains a correct, tested opt-in for forward-only
    short-sequence serving."""
    import os
    flag = os.environ.get("VITX_PACKED_ATTN", "")
    if flag != "1":
        return False
    from vit_torch_tpu.ops.attention import _active_seq_mesh
    if _active_seq_mesh() is not None:
        return False
    from vit_torch_tpu.ops.attn_block import fits_packed
    B, N, C = x.shape
    return N <= 32 and fits_packed(N, C, num_heads)


def _attn_bhnd_layout(x, num_heads: int) -> bool:
    """Dispatch the (B, H, N, D)-layout attention path (einsum-formed q/k/v
    feeding the flash kernel without host-visible transposes).
    VITX_ATTN_BHND=1 forces it on (CPU interpret, tests), =0 off; default is
    TPU-only, per the shared ``ops.attention.flash_profitable`` crossover."""
    import os
    from vit_torch_tpu.ops.attention import (
        _active_seq_mesh, flash_profitable)
    if _active_seq_mesh() is not None:
        # sequence-parallel training: the token axis is sharded — attention
        # must route through ring attention (ops/attention.py dispatch),
        # not the single-device flash kernel
        return False
    flag = os.environ.get("VITX_ATTN_BHND", "")
    if flag == "0":
        return False
    if flag == "1":
        return True
    if jax.default_backend() != "tpu":
        return False
    N, C = x.shape[1], x.shape[2]
    return flash_profitable(N, num_heads, C // num_heads)


class Attention(nn.Module):
    """Standard multi-head self-attention with a single fused QKV projection."""

    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        scale = self.qk_scale or head_dim ** -0.5
        w_qkv, b_qkv = DenseParams(3 * C, self.qkv_bias, name="qkv")(C)
        w_proj, b_proj = DenseParams(C, name="proj")(C)
        dt = self.dtype
        if _use_w8a8(deterministic):
            # int8 serving path (takes precedence over the opt-in fused
            # kernels): qkv + proj run s8xs8->s32 on the MXU; the attention
            # core itself stays bf16 (flash kernel).  The head-major layout
            # is kept — XLA folds the post-dot head transpose into the
            # rescale epilogue the same way it folds it into the einsum's.
            from vit_torch_tpu.ops.quant import w8a8_dot
            # prequant lookup happens before the layout branch so export
            # capture and the serve trace agree on the kernel set even if
            # they pick different attention layouts (CPU capture vs TPU
            # serve); per-output-channel (w_q, scale) slice per-head the
            # same way the fp32 kernel does
            pre_qkv = _prequant_kernel(self, "qkv", w_qkv)
            pre_proj = _prequant_kernel(self, "proj", w_proj)
            if _attn_bhnd_layout(x, H):
                from vit_torch_tpu.ops.flash_attention import (
                    flash_attention_bhnd)
                w3 = w_qkv.reshape(C, 3, C)
                b3 = (None, None, None) if b_qkv is None \
                    else b_qkv.reshape(3, C)
                pre3 = (None,) * 3 if pre_qkv is None else tuple(
                    (pre_qkv[0].reshape(C, 3, C)[:, i],
                     pre_qkv[1].reshape(3, C)[i]) for i in range(3))

                def heads(y):
                    return y.reshape(B, N, H, head_dim).transpose(0, 2, 1, 3)

                qh = heads(w8a8_dot(x, w3[:, 0], b3[0], pre=pre3[0]))
                kh = heads(w8a8_dot(x, w3[:, 1], b3[1], pre=pre3[1]))
                vh = heads(w8a8_dot(x, w3[:, 2], b3[2], pre=pre3[2]))
                out = flash_attention_bhnd(qh, kh, vh, scale=scale)
                out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
            else:
                qkv = w8a8_dot(x, w_qkv, b_qkv, pre=pre_qkv)
                qkv = qkv.reshape(B, N, 3, H, head_dim)
                out = dot_product_attention(
                    qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], scale=scale)
                out = out.reshape(B, N, C)
            out = w8a8_dot(out, w_proj, b_proj, pre=pre_proj)
        elif _attn_packed_small(x, H):
            # packed small-N fused kernel: several images per program with
            # a block-diagonal mask — the short-sequence regime both other
            # kernels refuse (N=17 pads to the 128-row chunk)
            from vit_torch_tpu.ops.attn_block import attention_block_packed
            out = attention_block_packed(
                x, w_qkv.astype(dt),
                None if b_qkv is None else b_qkv.astype(dt),
                w_proj.astype(dt), b_proj.astype(dt),
                num_heads=H, scale=scale)
        elif _attn_fused_block(x, H):
            # fully-fused Pallas kernel: qkv matmul + attention + proj in
            # one program — q/k/v/attn-out never touch HBM
            from vit_torch_tpu.ops.attn_block import attention_block
            out = attention_block(
                x, w_qkv.astype(dt),
                None if b_qkv is None else b_qkv.astype(dt),
                w_proj.astype(dt), b_proj.astype(dt),
                num_heads=H, scale=scale)
        elif _attn_bhnd_layout(x, H):
            # Form q/k/v directly in the flash kernel's (B, H, N, D) layout
            # via einsum so XLA folds the head transpose into the qkv-matmul
            # epilogue instead of materializing (B, N, 3, H, D) + 3
            # transposed copies in HBM; project back the same way.
            from vit_torch_tpu.ops.flash_attention import flash_attention_bhnd
            w3 = w_qkv.astype(dt).reshape(C, 3, H, head_dim)
            qh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 0])
            kh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 1])
            vh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 2])
            if b_qkv is not None:
                b3 = b_qkv.astype(dt).reshape(3, H, 1, head_dim)
                qh, kh, vh = qh + b3[0], kh + b3[1], vh + b3[2]
            out = flash_attention_bhnd(qh, kh, vh, scale=scale)
            out = jnp.einsum("bhnd,hdc->bnc", out,
                             w_proj.astype(dt).reshape(H, head_dim, C))
            out = out + b_proj.astype(dt)
        else:
            qkv = jnp.dot(x, w_qkv.astype(dt))
            if b_qkv is not None:
                qkv = qkv + b_qkv.astype(dt)
            qkv = qkv.reshape(B, N, 3, H, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            out = dot_product_attention(q, k, v, scale=scale)
            out = out.reshape(B, N, C)
            out = jnp.dot(out, w_proj.astype(dt)) + b_proj.astype(dt)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    """Pre-norm transformer block: x + attn(LN(x)); x + mlp(LN(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        dim = x.shape[-1]
        # reference ViT/DeiT norm_layer eps is 1e-6 (vision_all.py:330,
        # deit.py:98) — NOT torch's 1e-5 default (Swin keeps 1e-5)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = Attention(self.num_heads, qkv_bias=self.qkv_bias,
                      qk_scale=self.qk_scale, attn_drop=self.attn_drop,
                      proj_drop=self.drop, dtype=self.dtype, name="attn")(
                          y, deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = Mlp(int(dim * self.mlp_ratio), dropout=self.drop,
                dtype=self.dtype, name="mlp")(y, deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)
        return x


class PatchEmbed(nn.Module):
    """Image-to-patch embedding as reshape + matmul (MXU-native).

    Equivalent to the reference's stride==kernel ``nn.Conv2d`` patch embed
    (reference ``models/swin.py:410-455``; DINO ViT ``patch_embed.proj``
    proven Conv2d at ``models/vision_all.py:161-167``) — the conv kernel maps
    to our ``(p*p*C, D)`` matrix with layout ``(p, p, C) → flattened``.
    Input: NHWC. Output: ``(B, H/p * W/p, D)``.
    """

    patch_size: int
    embed_dim: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, f"image {H}x{W} not divisible by patch {p}"
        gh, gw = H // p, W // p
        x = x.reshape(B, gh, p, gw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5)          # (B, gh, gw, p, p, C)
        x = x.reshape(B, gh * gw, p * p * C)
        kernel = self.param("kernel", trunc_normal_init,
                            (p * p * C, self.embed_dim), jnp.float32)
        x = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                    preferred_element_type=jnp.float32).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.embed_dim,), jnp.float32)
            x = x + bias.astype(self.dtype)
        return x

    @staticmethod
    def grid_size(image_size: int, patch_size: int) -> Tuple[int, int]:
        return image_size // patch_size, image_size // patch_size


class ClassifierHead(nn.Module):
    """MLP classifier head with the reference's exact construction semantics:
    GELU between Linears, bias disabled on the last layer
    (reference ``models/vision_all.py:300-320``).

    ``units`` is the full stack including the final class count, i.e. the
    reference's ``classifier=[*fc, num_labels]``.
    """

    units: Sequence[int]
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n = len(self.units)
        for i, u in enumerate(self.units):
            is_last = i == n - 1
            x = nn.Dense(u, use_bias=not is_last, dtype=self.dtype,
                         kernel_init=trunc_normal_init, name=f"fc{i}")(x)
            if not is_last:
                x = gelu_exact(x)
        return x
