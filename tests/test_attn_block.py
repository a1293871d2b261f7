"""Golden tests for the fully-fused ViT attention-block kernel
(``ops/attn_block.py``) against the head-major einsum + flash-attention
reference — CPU interpret mode, fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _inputs(B=2, N=145, C=128, H=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.float32)
    w_qkv = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.float32)
    b_qkv = jnp.asarray(rng.normal(0, 0.05, (3 * C,)), jnp.float32)
    w_proj = jnp.asarray(rng.normal(0, 0.05, (C, C)), jnp.float32)
    b_proj = jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32)
    return x, w_qkv, b_qkv, w_proj, b_proj


def _ref(x, w_qkv, b_qkv, w_proj, b_proj, H):
    from vit_torch_tpu.ops.attn_block import _ref_forward
    C = x.shape[-1]
    return _ref_forward(x, w_qkv, b_qkv.reshape(1, -1), w_proj,
                        b_proj.reshape(1, -1), H, (C // H) ** -0.5)


@pytest.mark.parametrize("N", [128, 145, 257])
def test_attention_block_forward(N):
    from vit_torch_tpu.ops.attn_block import attention_block, fits
    x, w_qkv, b_qkv, w_proj, b_proj = _inputs(N=N)
    assert fits(N, x.shape[-1], 4)
    ours = attention_block(x, w_qkv, b_qkv, w_proj, b_proj, num_heads=4)
    ref = _ref(x, w_qkv, b_qkv, w_proj, b_proj, 4)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_attention_block_no_bias():
    from vit_torch_tpu.ops.attn_block import attention_block
    x, w_qkv, _, w_proj, _ = _inputs(seed=1)
    C = x.shape[-1]
    ours = attention_block(x, w_qkv, None, w_proj, None, num_heads=4)
    ref = _ref(x, w_qkv, jnp.zeros(3 * C), w_proj, jnp.zeros(C), 4)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_attention_block_backward():
    from vit_torch_tpu.ops.attn_block import attention_block
    x, w_qkv, b_qkv, w_proj, b_proj = _inputs(N=130, seed=2)

    def loss_ours(*a):
        return jnp.sum(attention_block(*a, num_heads=4) ** 2)

    def loss_ref(*a):
        return jnp.sum(_ref(*a, 4) ** 2)

    args = (x, w_qkv, b_qkv, w_proj, b_proj)
    go = jax.grad(loss_ours, argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for name, a, b in zip(("dx", "dw_qkv", "db_qkv", "dw_proj", "db_proj"),
                          go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_attention_block_fits_gates():
    from vit_torch_tpu.ops.attn_block import fits
    assert not fits(145, 96, 3)          # C not lane-aligned
    assert not fits(145, 128, 8)         # head_dim 16 below slice granule
    assert fits(785, 768, 12)            # dino_vitb8 @224 — the headline
    assert not fits(2305, 768, 12)       # vitb8 @384 exceeds VMEM budget


def test_attention_block_in_attention_module(monkeypatch):
    """Attention module: fused-block path (interpret) matches the standard
    path; params keep the Dense tree layout."""
    from vit_torch_tpu.models.layers import Attention, _attn_fused_block
    x = jnp.asarray(np.random.default_rng(5).normal(0, 1, (2, 37, 128)),
                    jnp.float32)
    m = Attention(num_heads=4, dtype=jnp.float32)
    monkeypatch.setenv("VITX_FUSED_ATTN", "1")
    assert _attn_fused_block(x, 4)      # the fused path is actually taken
    monkeypatch.setenv("VITX_FUSED_ATTN", "0")
    monkeypatch.setenv("VITX_ATTN_BHND", "0")
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    ref = m.apply({"params": params}, x)
    monkeypatch.setenv("VITX_FUSED_ATTN", "1")
    ours = m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


# --------------------------------------------------------------- packed
@pytest.mark.parametrize("B,N", [(11, 17), (8, 16), (3, 33)])
def test_attention_block_packed_forward(B, N):
    """Packed small-N kernel (several images per program, block-diagonal
    mask) == the reference on every token of every image, incl. batches
    that do not fill the last program."""
    from vit_torch_tpu.ops.attn_block import (
        attention_block_packed, fits_packed)
    x, w_qkv, b_qkv, w_proj, b_proj = _inputs(B=B, N=N, seed=5)
    assert fits_packed(N, x.shape[-1], 4)
    ours = attention_block_packed(x, w_qkv, b_qkv, w_proj, b_proj,
                                  num_heads=4)
    ref = _ref(x, w_qkv, b_qkv, w_proj, b_proj, 4)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_attention_block_packed_backward():
    from vit_torch_tpu.ops.attn_block import attention_block_packed
    x, w_qkv, b_qkv, w_proj, b_proj = _inputs(B=6, N=17, seed=6)

    def loss_ours(*a):
        return jnp.sum(attention_block_packed(*a, num_heads=4) ** 2)

    def loss_ref(*a):
        return jnp.sum(_ref(*a, 4) ** 2)

    args = (x, w_qkv, b_qkv, w_proj, b_proj)
    go = jax.grad(loss_ours, argnums=tuple(range(5)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(5)))(*args)
    for a, b in zip(go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=3e-3)


def test_fits_packed_gates():
    from vit_torch_tpu.ops.attn_block import fits_packed
    assert fits_packed(17, 768, 12)          # the CIFAR@32px ViT-B shape
    assert not fits_packed(197, 768, 12)     # long sequences: flash path
    assert not fits_packed(17, 96, 3)        # non-lane-aligned channels
