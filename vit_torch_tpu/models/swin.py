"""Swin Transformer backbone (hierarchical shifted-window attention).

Capability parity with the reference's canonical Swin (``models/swin.py``:
``WindowAttention`` w/ relative-position-bias table ``:65-160``,
``SwinTransformerBlock`` cyclic shift + SW-MSA mask ``:163-288``,
``PatchMerging`` ``:291-337``, ``BasicLayer`` ``:340-407``, conv
``PatchEmbed`` ``:410-455``, ``SwinTransformer`` avgpool head ``:458-600``,
headless ``SwinTransformerOD`` feature-map mode ``:603-745``, the 12+ config
dicts ``:748-820``, and per-config FLOPs accounting ``:149-160,593-600``).

TPU-first redesign:
- window partition/reverse are pure static reshapes+transposes (jit-friendly,
  no data-dependent shapes);
- the shifted-window attention mask and the relative-position index are
  *numpy constants computed at trace time* (static for a fixed image size),
  folded into the attention bias — no gather scatter at runtime beyond one
  static-index table lookup;
- cyclic shift is ``jnp.roll`` (lowered to XLA collective-permute-free slice
  concat);
- patch embed and patch merging are reshape+matmul (MXU-native, no convs);
- window attention batches all windows of all images into one
  ``(B·nW, w², H, d)`` attention call → one big MXU matmul per block.
- param names mirror the torch layout (layers_i/blocks_j/...) so the
  checkpoint importer is a mechanical key remap.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_torch_tpu.models.layers import (
    DenseParams, Dtype, DropPath, LayerNorm, LayerNormParams, Mlp,
    trunc_normal_init,
)
from vit_torch_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    patch_size: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    patch_norm: bool = True

    @property
    def feature_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)


def _cfg(**kw) -> SwinConfig:
    return SwinConfig(**kw)


# reference config dicts (models/swin.py:748-820); *_22k variants share the
# architecture (they differ only in pretrain data)
SWIN_CONFIGS = {
    "swin_tiny_patch4_window7_224": _cfg(),
    "swin_small_patch4_window7_224": _cfg(depths=(2, 2, 18, 2)),
    "swin_base_patch4_window7_224": _cfg(embed_dim=128, depths=(2, 2, 18, 2),
                                         num_heads=(4, 8, 16, 32)),
    "swin_base_patch4_window12_384": _cfg(embed_dim=128, depths=(2, 2, 18, 2),
                                          num_heads=(4, 8, 16, 32),
                                          window_size=12),
    "swin_large_patch4_window7_224": _cfg(embed_dim=192, depths=(2, 2, 18, 2),
                                          num_heads=(6, 12, 24, 48)),
    "swin_large_patch4_window12_384": _cfg(embed_dim=192, depths=(2, 2, 18, 2),
                                           num_heads=(6, 12, 24, 48),
                                           window_size=12),
    # tiny smoke configs (not reference archs)
    "swin_test": _cfg(embed_dim=16, depths=(1, 1), num_heads=(2, 4),
                      window_size=4, drop_path_rate=0.0),
    "swin_test3": _cfg(embed_dim=16, depths=(1, 1, 1), num_heads=(2, 2, 4),
                       window_size=4, drop_path_rate=0.0),
}
for _name in list(SWIN_CONFIGS):
    if _name.endswith(("_224", "_384")):
        SWIN_CONFIGS[_name + "_22k"] = SWIN_CONFIGS[_name]


# --------------------------------------------------------------------------
# static helpers
# --------------------------------------------------------------------------

def window_partition(x: jax.Array, w: int) -> jax.Array:
    """(B, H, W, C) → (B·nW, w·w, C) — static reshape/transpose only."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def window_reverse(windows: jax.Array, w: int, H: int, W: int) -> jax.Array:
    """(B·nW, w·w, C) → (B, H, W, C)."""
    C = windows.shape[-1]
    B = windows.shape[0] // (H * W // w // w)
    x = windows.reshape(B, H // w, W // w, w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def relative_position_index(w: int) -> np.ndarray:
    """Static (w², w²) index into the (2w-1)² bias table (reference
    ``models/swin.py:85-98`` semantics, computed once in numpy)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)                          # (2, w²)
    rel = coords[:, :, None] - coords[:, None, :]           # (2, w², w²)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)                                      # (w², w²)


def shifted_window_mask(Hp: int, Wp: int, w: int, shift: int) -> np.ndarray:
    """Static SW-MSA attention mask: (nW, w², w²) additive bias with -100 at
    cross-region pairs (reference ``models/swin.py:242-263`` semantics)."""
    img = np.zeros((1, Hp, Wp, 1), np.float32)
    cnt = 0
    for h_sl in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for w_sl in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, h_sl, w_sl, :] = cnt
            cnt += 1
    B, H, W, C = img.shape
    windows = img.reshape(B, H // w, w, W // w, w, C)
    windows = windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


# --------------------------------------------------------------------------
# modules
# --------------------------------------------------------------------------

def _use_fused_window(Bn: int, N: int, mask) -> bool:
    """Dispatch to the fused Pallas window-attention kernel.

    Default: on TPU only (interpret mode off-TPU is for tests).  Override
    with VITX_FUSED_WINDOW=1 (force on, e.g. CPU golden tests) or =0 (off).
    Requires the window count per image (mask rows) to tile the flattened
    window-batch."""
    import os
    flag = os.environ.get("VITX_FUSED_WINDOW", "")
    if flag == "0":
        return False
    if flag != "1" and jax.default_backend() != "tpu":
        return False
    if mask is not None and Bn % mask.shape[0]:
        return False
    return True


def _use_fused_block_spatial(B: int, Hp: int, Wp: int, w: int, C: int,
                             H: int, mask) -> bool:
    """Dispatch to the band-gather spatial window-block kernel
    (``ops/window_block.py:window_block_spatial``): the window
    partition/reverse transposes (12.6% of swin_base_384 e2e, see
    ``examples/perf/swin_overhead_ablation.json``) fold into the kernel's
    DMA.  VITX_FUSED_SPATIAL=1 forces it on (CPU interpret, tests), =0
    turns it off; default TPU-only.  VITX_FUSED_WINDOW=0 / VITX_FUSED_BLOCK=0
    also disable it (it is a variant of the fused block kernel)."""
    import os
    if os.environ.get("VITX_FUSED_WINDOW", "") == "0":
        return False
    if os.environ.get("VITX_FUSED_BLOCK", "") == "0":
        return False
    flag = os.environ.get("VITX_FUSED_SPATIAL", "")
    if flag == "0":
        return False
    if flag != "1" and jax.default_backend() != "tpu":
        return False
    if mask is not None and mask.shape[0] != (Hp // w) * (Wp // w):
        return False
    from vit_torch_tpu.ops.window_block import fits_spatial
    return fits_spatial(Hp, Wp, w, C, H, mask is not None)


def _use_fused_block_full(H: int, W: int, w: int, C: int, heads: int,
                          shift: int, pad_needed: bool,
                          drop_path_rate: float, deterministic: bool,
                          hidden: int) -> bool:
    """Dispatch to the full-block fused kernel (LN1 + W-MSA + residual +
    LN2 + MLP + residual in one program —
    ``ops/window_block.py:window_block_full_spatial``).

    Falls back when: spatial padding is needed (LN does not commute with
    zero-padding), DropPath is active (the residuals are fused inside),
    the W8A8 serving path is on (the MLP must route through QDense-style
    int8 matmuls), or the working set exceeds VMEM (stage-4 C ≥ 1024).
    VITX_FUSED_FULL=1 forces on (CPU interpret, tests), =0 off; default
    TPU-only.  VITX_FUSED_WINDOW=0 / VITX_FUSED_BLOCK=0 also disable."""
    import os
    if os.environ.get("VITX_FUSED_WINDOW", "") == "0":
        return False
    if os.environ.get("VITX_FUSED_BLOCK", "") == "0":
        return False
    flag = os.environ.get("VITX_FUSED_FULL", "")
    if flag == "0":
        return False
    if flag != "1" and jax.default_backend() != "tpu":
        return False
    if pad_needed:
        return False
    if drop_path_rate > 0.0 and not deterministic:
        return False
    from vit_torch_tpu.models.layers import _use_w8a8
    if _use_w8a8(deterministic):
        return False
    if flag != "1" and w == 7:
        # Measured dispatch policy (round-5 on-chip probes): at window-7
        # shapes (N=49 padded to 64 in-kernel) the band kernel beats the
        # full-block kernel EVERYWHERE e2e — swin_tiny fwd bs32 8.68 vs
        # 9.35 ms/batch, swin_base_224 16.11 vs 17.81
        # (examples/perf/swin_dispatch_ab.json).  Per-cell probes
        # (swin_small_stage_probe.json, swin_base224_cells.json) locate
        # the losses: small C (96-256) is VPU/pad-bound so the fused
        # LN/MLP adds serial in-program work; C=512 pays the 6.5 MB
        # VMEM-resident weight set starving the activation pipeline;
        # shifted cells pay the in-kernel mask + the /3 masked act
        # budget.  The one isolated full-block win (C=384 unshifted,
        # 0.200 vs 0.260 ms) did NOT survive e2e (9.09 vs 8.68 — e2e
        # governs, PERF.md).  w=12 (N=144, no row padding) keeps
        # full-block everywhere it fits — the round-4 base_384 +33% was
        # measured with exactly that dispatch.
        return False
    from vit_torch_tpu.ops.window_block import fits_spatial_full
    return fits_spatial_full(H, W, w, C, heads, shift > 0, hidden)


def _use_fused_block(Bn: int, N: int, C: int, H: int, mask) -> bool:
    """Dispatch to the fully-fused qkv+attention+proj window-block kernel
    (``ops/window_block.py``).  VITX_FUSED_BLOCK=1 forces it on (CPU
    interpret, golden tests), =0 turns it off; default is TPU-only.
    VITX_FUSED_WINDOW=0 also disables it (one switch kills all Pallas
    window paths)."""
    import os
    if os.environ.get("VITX_FUSED_WINDOW", "") == "0":
        return False
    flag = os.environ.get("VITX_FUSED_BLOCK", "")
    if flag == "0":
        return False
    if flag != "1" and jax.default_backend() != "tpu":
        return False
    if mask is not None and Bn % mask.shape[0]:
        return False
    from vit_torch_tpu.ops.window_block import fits
    return fits(Bn, N, C, H, mask.shape[0] if mask is not None else None)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias over (B·nW, w², C) windows."""

    num_heads: int
    window_size: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 deterministic: bool = True, spatial: bool = False,
                 params_only: bool = False):
        w, H = self.window_size, self.num_heads
        C = x.shape[-1]
        N = w * w
        head_dim = C // H
        scale = head_dim ** -0.5
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           ((2 * w - 1) ** 2, H), jnp.float32)
        idx = relative_position_index(w).reshape(-1)
        bias = table[idx].reshape(N, N, H).transpose(2, 0, 1)   # (H, N, N)
        # raw Dense-layout params so the fused kernels can consume the
        # weights directly; tree paths stay qkv/kernel … proj/bias
        w_qkv, b_qkv = DenseParams(3 * C, self.qkv_bias, name="qkv")(C)
        w_proj, b_proj = DenseParams(C, name="proj")(C)
        dt = self.dtype
        if params_only:
            # fused full-block path consumes the attention weights (and the
            # gathered bias — keeping the table gradient a JAX scatter-add)
            return (bias, w_qkv.astype(dt),
                    None if b_qkv is None else b_qkv.astype(dt),
                    w_proj.astype(dt), b_proj.astype(dt), scale)
        if spatial:
            # x is the padded (B, Hp, Wp, C) map: the band-gather kernel
            # folds partition/reverse into its DMA (caller checked
            # _use_fused_block_spatial)
            from vit_torch_tpu.ops.window_block import window_block_spatial
            return window_block_spatial(
                x, w_qkv.astype(dt),
                None if b_qkv is None else b_qkv.astype(dt), bias, mask,
                w_proj.astype(dt), b_proj.astype(dt),
                num_heads=H, window=w, scale=scale)
        Bn, N, C = x.shape
        if _use_fused_block(Bn, N, C, H, mask):
            # fully-fused Pallas kernel: qkv matmul + attention + proj in
            # one program — the qkv/scores/attn activations never touch HBM
            from vit_torch_tpu.ops.window_block import window_block
            return window_block(
                x, w_qkv.astype(dt),
                None if b_qkv is None else b_qkv.astype(dt), bias, mask,
                w_proj.astype(dt), b_proj.astype(dt),
                num_heads=H, scale=scale)
        qkv = jnp.dot(x, w_qkv.astype(dt))
        if b_qkv is not None:
            qkv = qkv + b_qkv.astype(dt)
        qkv = qkv.reshape(Bn, N, 3, H, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if _use_fused_window(Bn, N, mask):
            # fused Pallas kernel: scores never touch HBM (the XLA path
            # materializes a (B·nW, H, N, N) logits tensor between matmuls)
            from vit_torch_tpu.ops.window_attention import window_attention
            out = window_attention(q, k, v, bias, mask,
                                   scale=scale).reshape(Bn, N, C)
            return jnp.dot(out, w_proj.astype(dt)) + b_proj.astype(dt)
        # logits in fp32; bias/mask stay rank-deficient so XLA fuses the
        # broadcasts into the softmax instead of materializing a
        # (B·nW, H, N, N) bias tensor
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            logits = logits.reshape(Bn // nW, nW, H, N, N) \
                + mask[None, :, None].astype(jnp.float32)
            logits = logits.reshape(Bn, H, N, N)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(Bn, N, C)
        return jnp.dot(out, w_proj.astype(dt)) + b_proj.astype(dt)


class SwinBlock(nn.Module):
    num_heads: int
    window_size: int
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, H, W, C = x.shape
        w = min(self.window_size, H, W)
        shift = self.shift_size if w < min(H, W) else 0
        if min(H, W) <= self.window_size:
            shift = 0  # window covers the whole map (reference :205-207)
        pad_needed = bool((-H) % w or (-W) % w)
        hidden = int(C * self.mlp_ratio)
        attn = WindowAttention(self.num_heads, w, self.qkv_bias,
                               dtype=self.dtype, name="attn")
        mlp = Mlp(hidden, dtype=self.dtype, name="mlp")
        if _use_fused_block_full(H, W, w, C, self.num_heads, shift,
                                 pad_needed, self.drop_path_rate,
                                 deterministic, hidden):
            # whole block in ONE pallas program per window band: LN1 +
            # W-MSA + residual + LN2 + MLP + residual never leave VMEM
            # (PERF.md swin_tiny ledger: the inter-op map round-trips are
            # the remaining e2e-vs-shape-bound gap).  Param tree unchanged:
            # LayerNormParams/params_only create the same leaves the
            # unfused modules do.
            from vit_torch_tpu.ops.window_block import (
                window_block_full_spatial)
            ln1s, ln1b = LayerNormParams(name="norm1")(C)
            ln2s, ln2b = LayerNormParams(name="norm2")(C)
            bias, w_qkv, b_qkv, w_proj, b_proj, scale = attn(
                x, params_only=True)
            w1, b1, w2, b2 = mlp(x, params_only=True)
            dt = self.dtype
            y = x
            if shift:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
                fmask = jnp.asarray(shifted_window_mask(H, W, w, shift))
            else:
                fmask = None
            y = window_block_full_spatial(
                y, ln1s, ln1b, w_qkv, b_qkv, bias, fmask, w_proj, b_proj,
                ln2s, ln2b, w1.astype(dt), b1, w2.astype(dt), b2,
                num_heads=self.num_heads, window=w, scale=scale)
            if shift:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            return y

        y = LayerNorm(dtype=self.dtype, name="norm1")(x)
        pad_b, pad_r = (-H) % w, (-W) % w
        Hp, Wp = H + pad_b, W + pad_r
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(Hp, Wp, w, shift))
        else:
            mask = None
        if _use_fused_block_spatial(B, Hp, Wp, w, C, self.num_heads, mask):
            # band-gather kernel consumes the spatial map directly — no
            # partition/reverse HBM transposes (12.6% of e2e, see PERF.md)
            y = attn(y, mask, deterministic, spatial=True)
        else:
            windows = window_partition(y, w)
            windows = attn(windows, mask, deterministic)
            y = window_reverse(windows, w, Hp, Wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :H, :W]
        x = x + DropPath(self.drop_path_rate)(y, deterministic)

        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = mlp(y, deterministic)
        x = x + DropPath(self.drop_path_rate)(y, deterministic)
        return x


class PatchMerging(nn.Module):
    """2×2 neighborhood concat (4C) → LayerNorm → Linear to 2C
    (reference ``models/swin.py:291-337``), as reshape+matmul."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pad_b, pad_r = H % 2, W % 2
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            H, W = H + pad_b, W + pad_r
        # torch concat order: x0=(0::2,0::2), x1=(1::2,0::2), x2=(0::2,1::2), x3=(1::2,1::2)
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)       # (B, H/2, W/2, 4C)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                     kernel_init=trunc_normal_init, name="reduction")(x)
        return x


class SwinTransformer(nn.Module):
    """Swin backbone.  ``features_only=True`` returns the final (B, H', W', C)
    feature map (the reference's ``SwinTransformerOD`` mode,
    ``models/swin.py:603-745``); otherwise token-mean features (B, C)."""

    config: SwinConfig
    dtype: Dtype = jnp.bfloat16
    features_only: bool = False
    multi_features: bool = False   # return per-stage maps (FPN/segm input)
    remat: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        B, H, W, C = x.shape
        p = cfg.patch_size
        # patch embed: reshape+matmul (+ optional LayerNorm, patch_norm=True)
        pad_b, pad_r = (-H) % p, (-W) % p
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            H, W = H + pad_b, W + pad_r
        gh, gw = H // p, W // p
        x = x.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, gh, gw, p * p * C)
        kernel = self.param("patch_embed_kernel", trunc_normal_init,
                            (p * p * C, cfg.embed_dim), jnp.float32)
        pe_bias = self.param("patch_embed_bias", nn.initializers.zeros,
                             (cfg.embed_dim,), jnp.float32)
        x = (jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                     preferred_element_type=jnp.float32)
             + pe_bias).astype(self.dtype)
        if cfg.patch_norm:
            x = LayerNorm(dtype=self.dtype, name="patch_embed_norm")(x)
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)

        total_depth = sum(cfg.depths)
        block_idx = 0
        block_cls = SwinBlock
        if self.remat:
            block_cls = nn.remat(SwinBlock, static_argnums=(2,))
        stages = []
        for li, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for bi in range(depth):
                dpr = cfg.drop_path_rate * block_idx / max(total_depth - 1, 1)
                block_idx += 1
                x = block_cls(
                    num_heads=heads, window_size=cfg.window_size,
                    shift_size=0 if bi % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    drop_path_rate=dpr, dtype=self.dtype,
                    name=f"layers_{li}_blocks_{bi}")(x, deterministic)
            stages.append(x)
            if li < len(cfg.depths) - 1:
                x = PatchMerging(dtype=self.dtype,
                                 name=f"layers_{li}_downsample")(x)
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        if self.multi_features:
            return stages[:-1] + [x]   # per-stage maps, last one normed
        if self.features_only:
            return x                                  # (B, H', W', C_final)
        return jnp.mean(x, axis=(1, 2))               # avgpool over tokens

    @property
    def feature_dim(self) -> int:
        return self.config.feature_dim


def swin_flops(config: SwinConfig, image_size: int) -> int:
    """Analytic FLOPs (multiply-adds ×2) — parity with the reference's
    per-module ``flops()`` accounting (``models/swin.py:149-160,276-288,
    333-337,401-407,593-600``)."""
    p, w = config.patch_size, config.window_size
    gh = gw = image_size // p
    flops = 2 * gh * gw * config.embed_dim * 3 * p * p  # patch embed
    dim = config.embed_dim
    H_, W_ = gh, gw
    for li, (depth, heads) in enumerate(zip(config.depths, config.num_heads)):
        for _ in range(depth):
            n = H_ * W_
            ws = min(w, H_, W_) ** 2
            flops += 2 * n * dim * dim * 3              # qkv
            flops += 2 * n * ws * dim * 2               # attn matmuls
            flops += 2 * n * dim * dim                  # proj
            flops += 2 * n * dim * int(dim * config.mlp_ratio) * 2  # mlp
        if li < len(config.depths) - 1:
            flops += 2 * (H_ // 2) * (W_ // 2) * 4 * dim * 2 * dim
            H_, W_, dim = H_ // 2, W_ // 2, dim * 2
    return flops


# --------------------------------------------------------------------------
# zoo registration
# --------------------------------------------------------------------------

def _build_swin(arch: str, image_channels: int, classifier, image_size: int,
                dtype, remat: bool):
    from vit_torch_tpu.models.layers import ClassifierHead
    from vit_torch_tpu.models.zoo import Classifier, ZooModel, register_family
    if arch not in SWIN_CONFIGS:
        raise ValueError(f"unknown swin arch {arch!r}; have "
                         f"{sorted(SWIN_CONFIGS)}")
    cfg = SWIN_CONFIGS[arch]
    backbone = SwinTransformer(cfg, dtype=dtype, remat=remat, name="backbone")
    head = (ClassifierHead(tuple(classifier), dtype=dtype, name="head")
            if classifier else None)
    return ZooModel(arch=arch, family="swin",
                    model=Classifier(backbone, head),
                    feature_dim=cfg.feature_dim, patch_size=cfg.patch_size,
                    default_image_size=384 if "384" in arch else 224)


from vit_torch_tpu.models.zoo import register_family  # noqa: E402

register_family("swin")(_build_swin)
