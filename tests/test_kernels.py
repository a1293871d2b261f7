"""Golden tests: Pallas attention kernels vs the jnp/XLA reference
implementation (SURVEY.md §4: "unit tests per module, kernels vs jnp
reference").  Runs in Pallas interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.ops.attention import _xla_attention, dot_product_attention
from vit_torch_tpu.ops.flash_attention import flash_attention


def _qkv(B=2, N=145, H=3, D=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(0, 1, (B, N, H, D)), dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("N", [128, 145, 257])
def test_flash_forward_matches_xla(N):
    q, k, v = _qkv(N=N)
    ours = flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_backward_matches_xla():
    q, k, v = _qkv(N=130)
    scale = q.shape[-1] ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=scale) ** 2)

    g_ours = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("forced", [None, "2"])
def test_flash_head_blocked_matches_xla(monkeypatch, forced):
    """Head-blocked single-q-block path (2 heads batched per program —
    PERF.md slope-timed lever) matches XLA in forward and grads; with the
    env knob unset the gate picks hb=2 itself for even head counts."""
    if forced is not None:
        monkeypatch.setenv("VITX_FLASH_HEAD_BLOCK", forced)
    from vit_torch_tpu.ops.flash_attention import _head_block
    assert _head_block(4, 145, 32, bwd=False) == 2
    assert _head_block(3, 145, 32, bwd=False) == 1      # odd H falls back
    assert _head_block(4, 5000, 64, bwd=True) in (1, 2)  # gate is bounded
    q, k, v = _qkv(B=2, N=145, H=4, D=32)
    scale = q.shape[-1] ** -0.5
    out = flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    g_ours = jax.grad(lambda q, k, v: jnp.sum(flash_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda q, k, v: jnp.sum(
        _xla_attention(q, k, v, scale=scale) ** 2), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3,
                                   err_msg=f"d{name} mismatch")


def test_flash_head_block_vmem_gate():
    """The VMEM estimate refuses hb=2 at sequence lengths whose fp32 score
    tiles exceed the calibrated budget."""
    from vit_torch_tpu.ops.flash_attention import _head_block
    assert _head_block(12, 800, 64, bwd=False) == 2    # headline shape
    assert _head_block(12, 800, 64, bwd=True) == 2
    assert _head_block(12, 2400, 64, bwd=True) == 1    # 3·2·2400²·4 ≫ 24MB


def test_flash_bf16_runs():
    q, k, v = _qkv(N=128, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = _xla_attention(q, k, v, scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_attention_bhnd_layout_matches(monkeypatch):
    """The (B, H, N, D)-layout Attention path (einsum q/k/v + head-major
    flash kernel, ``models/layers.py:_attn_bhnd_layout``) matches the
    standard path in forward and all parameter gradients."""
    from vit_torch_tpu.models.layers import Attention
    x = jnp.asarray(np.random.default_rng(7).normal(0, 1, (2, 37, 64)),
                    jnp.float32)
    m = Attention(num_heads=4, dtype=jnp.float32)
    monkeypatch.setenv("VITX_ATTN_BHND", "0")
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"qkv", "proj"}
    ref = m.apply({"params": params}, x)
    g_ref = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(
        params)
    monkeypatch.setenv("VITX_ATTN_BHND", "1")
    ours = m.apply({"params": params}, x)
    g_ours = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(
        params)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
    for mod in ("qkv", "proj"):
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                np.asarray(g_ours[mod][leaf]), np.asarray(g_ref[mod][leaf]),
                atol=5e-4, rtol=1e-3, err_msg=f"{mod}/{leaf}")


def test_talking_heads_kernel_matches_xla(monkeypatch):
    """Fused talking-heads kernel (ops/talking_heads.py) matches the XLA
    einsum path through the CaiT module — forward and all param grads,
    incl. a padded-N case (37 → 48)."""
    from vit_torch_tpu.models.cait import TalkingHeadAttention
    x = jnp.asarray(np.random.default_rng(9).normal(0, 1, (2, 37, 64)),
                    jnp.float32)
    m = TalkingHeadAttention(num_heads=4, dtype=jnp.float32)
    monkeypatch.setenv("VITX_FUSED_TH", "0")
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert {"qkv", "proj", "proj_l_kernel", "proj_l_bias",
            "proj_w_kernel", "proj_w_bias"} <= set(params)
    ref = m.apply({"params": params}, x)
    g_ref = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(
        params)
    monkeypatch.setenv("VITX_FUSED_TH", "1")
    ours = m.apply({"params": params}, x)
    g_ours = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(
        params)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
    flat_o, _ = jax.tree_util.tree_flatten_with_path(g_ours)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    for (path, a), (_, b) in zip(flat_o, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3,
                                   err_msg=str(path))


@pytest.mark.parametrize("shape", [(2, 4, 37, 32), (1, 8, 197, 48),
                                   (1, 2, 530, 64)])
def test_talking_heads_v2_matches_ref(shape):
    """Mix-as-matmul v2 kernel (talking_heads_attention_bnc) matches the
    XLA reference on the head-concatenated layout — forward and grads,
    incl. padded-N and q-row-blocked (N>512) cases.  bl's gradient is ~0
    by softmax shift-invariance (v2 drops the term exactly)."""
    from vit_torch_tpu.ops import talking_heads as TH
    B, H, N, D = shape
    C = H * D
    rng = np.random.default_rng(11)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.float32)
               for _ in range(3))
    wl = jnp.asarray(rng.normal(0, 0.2, (H, H)), jnp.float32)
    bl = jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32)
    ww = jnp.asarray(rng.normal(0, 0.2, (H, H)), jnp.float32)
    bw = jnp.asarray(rng.normal(0, 0.1, (H,)), jnp.float32)
    scale = D ** -0.5
    assert TH.fits_v2(N, H, D)

    def k_loss(args):
        out = TH.talking_heads_attention_bnc(*args[:3], *args[3:],
                                             num_heads=H)
        return jnp.sum(out ** 2)

    def r_loss(args):
        return jnp.sum(TH._ref_forward_bnc(*args, H, scale) ** 2)

    args = (q, k, v, wl, bl, ww, bw)
    ours = TH.talking_heads_attention_bnc(q, k, v, wl, bl, ww, bw,
                                          num_heads=H)
    ref = TH._ref_forward_bnc(q, k, v, wl, bl, ww, bw, H, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
    g_ours = jax.grad(k_loss)(args)
    g_ref = jax.grad(r_loss)(args)
    for a, b, name in zip(g_ours, g_ref, "q k v wl bl ww bw".split()):
        if name == "bl":
            assert float(jnp.max(jnp.abs(a))) < 1e-3
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


def test_attn_layout_paths_yield_to_seq_parallel(monkeypatch):
    """With a seq-sharded mesh active, the Attention layout/fusion fast
    paths must stand down so ring attention handles the sharded token axis
    (ops/attention.py dispatch)."""
    from vit_torch_tpu.models.layers import (
        _attn_bhnd_layout, _attn_fused_block)
    from vit_torch_tpu.ops.attention import sequence_parallel
    from vit_torch_tpu.parallel import make_mesh
    x = jnp.zeros((2, 512, 128))
    monkeypatch.setenv("VITX_ATTN_BHND", "1")
    monkeypatch.setenv("VITX_FUSED_ATTN", "1")
    assert _attn_bhnd_layout(x, 4) and _attn_fused_block(x, 4)
    mesh = make_mesh("data=4,seq=2")
    with sequence_parallel(mesh):
        assert not _attn_bhnd_layout(x, 4)
        assert not _attn_fused_block(x, 4)
    assert _attn_bhnd_layout(x, 4)


def test_dispatcher_uses_xla_on_cpu():
    q, k, v = _qkv(N=64)
    out = dot_product_attention(q, k, v)
    ref = _xla_attention(q, k, v, scale=q.shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_xla_attention_bias_and_mask():
    q, k, v = _qkv(N=16)
    B, N, H, D = q.shape
    bias = jnp.zeros((1, H, N, N)).at[..., 0].set(-1e9)
    out = _xla_attention(q, k, v, scale=1.0, bias=bias)
    # key 0 fully suppressed -> output independent of v[:, 0]
    v2 = v.at[:, 0].set(99.0)
    out2 = _xla_attention(q, k, v2, scale=1.0, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)

    mask = jnp.ones((1, 1, N, N), bool).at[..., 1].set(False)
    m1 = _xla_attention(q, k, v, scale=1.0, mask=mask)
    m2 = _xla_attention(q, k, v.at[:, 1].set(-50.0), scale=1.0, mask=mask)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


# --------------------------------------------------------------------------
# fused window attention (Swin)
# --------------------------------------------------------------------------

def _window_ref(q, k, v, bias, mask, scale):
    """XLA reference — the pre-kernel WindowAttention math."""
    Bn, N, H, D = q.shape
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + bias[None].astype(jnp.float32)
    if mask is not None:
        nW = mask.shape[0]
        logits = logits.reshape(Bn // nW, nW, H, N, N) \
            + mask[None, :, None].astype(jnp.float32)
        logits = logits.reshape(Bn, H, N, N)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def _window_qkv(Bn=8, N=49, H=3, D=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(0, 1, (Bn, N, H, D)), dtype)
    q, k, v = mk(), mk(), mk()
    bias = jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32)
    return q, k, v, bias


@pytest.mark.parametrize("N,Bn", [(49, 8), (16, 6)])
def test_window_attention_forward(N, Bn):
    from vit_torch_tpu.ops.window_attention import window_attention
    q, k, v, bias = _window_qkv(Bn=Bn, N=N)
    scale = q.shape[-1] ** -0.5
    ours = window_attention(q, k, v, bias)
    ref = _window_ref(q, k, v, bias, None, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_window_attention_forward_masked():
    from vit_torch_tpu.ops.window_attention import window_attention
    nW, B = 4, 3
    q, k, v, bias = _window_qkv(Bn=nW * B, N=25)
    rng = np.random.default_rng(7)
    mask = jnp.asarray(
        np.where(rng.random((nW, 25, 25)) > 0.7, -100.0, 0.0), jnp.float32)
    scale = q.shape[-1] ** -0.5
    ours = window_attention(q, k, v, bias, mask)
    ref = _window_ref(q, k, v, bias, mask, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_window_attention_backward():
    from vit_torch_tpu.ops.window_attention import window_attention
    nW = 4
    q, k, v, bias = _window_qkv(Bn=nW * 2, N=16)
    rng = np.random.default_rng(3)
    mask = jnp.asarray(
        np.where(rng.random((nW, 16, 16)) > 0.8, -100.0, 0.0), jnp.float32)
    scale = q.shape[-1] ** -0.5

    def loss_ours(q, k, v, bias):
        return jnp.sum(window_attention(q, k, v, bias, mask) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_window_ref(q, k, v, bias, mask, scale) ** 2)

    g_ours = jax.grad(loss_ours, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip(("dq", "dk", "dv", "dbias"), g_ours, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=name)


def test_window_attention_in_swin_model(monkeypatch):
    """Full Swin forward with the fused kernel (interpret mode) matches the
    XLA path."""
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 32, 32, 3)),
                    jnp.float32)
    model = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, True)["params"]

    monkeypatch.setenv("VITX_FUSED_WINDOW", "0")
    ref = model.apply({"params": params}, x, True)
    monkeypatch.setenv("VITX_FUSED_WINDOW", "1")
    ours = model.apply({"params": params}, x, True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
