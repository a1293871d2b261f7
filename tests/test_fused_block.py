"""Golden tests for the fully-fused window-block kernel
(``ops/window_block.py``) and the fused MLP kernel (``ops/fused_mlp.py``)
against their XLA references — CPU interpret mode, fp32, tight tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


# --------------------------------------------------------------------------
# window_block
# --------------------------------------------------------------------------

def _wb_inputs(Bn=8, N=64, C=128, H=4, nW=4, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (Bn, N, C)), jnp.float32)
    w_qkv = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.float32)
    b_qkv = jnp.asarray(rng.normal(0, 0.05, (3 * C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) > 0.7, -100.0, 0.0), jnp.float32)
    w_proj = jnp.asarray(rng.normal(0, 0.05, (C, C)), jnp.float32)
    b_proj = jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32)
    return x, w_qkv, b_qkv, bias, mask, w_proj, b_proj


def _wb_ref(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj, H):
    Bn, N, C = x.shape
    D = C // H
    qkv = (x @ w_qkv + b_qkv).reshape(Bn, N, 3, H, D)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * D ** -0.5
    logits = logits + bias[None]
    if mask is not None:
        nW = mask.shape[0]
        logits = (logits.reshape(Bn // nW, nW, H, N, N)
                  + mask[None, :, None]).reshape(Bn, H, N, N)
    w = jax.nn.softmax(logits, -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(Bn, N, C)
    return out @ w_proj + b_proj


@pytest.mark.parametrize("masked", [True, False])
def test_window_block_forward(masked):
    from vit_torch_tpu.ops.window_block import window_block, fits
    x, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wb_inputs()
    H = 4
    m = mask if masked else None
    assert fits(x.shape[0], x.shape[1], x.shape[2], H,
                mask.shape[0] if masked else None)
    ours = window_block(x, w_qkv, b_qkv, bias, m, w_proj, b_proj,
                        num_heads=H)
    ref = _wb_ref(x, w_qkv, b_qkv, bias, m, w_proj, b_proj, H)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_window_block_no_bias():
    from vit_torch_tpu.ops.window_block import window_block
    x, w_qkv, _, bias, mask, w_proj, _ = _wb_inputs(seed=1)
    ours = window_block(x, w_qkv, None, bias, mask, w_proj, None,
                        num_heads=4)
    zq = jnp.zeros((3 * x.shape[2],), x.dtype)
    zp = jnp.zeros((x.shape[2],), x.dtype)
    ref = _wb_ref(x, w_qkv, zq, bias, mask, w_proj, zp, 4)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_window_block_backward():
    from vit_torch_tpu.ops.window_block import window_block
    x, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wb_inputs(Bn=4, N=16,
                                                             nW=2, seed=2)
    H = 4

    def loss_ours(x, w_qkv, b_qkv, bias, w_proj, b_proj):
        return jnp.sum(window_block(x, w_qkv, b_qkv, bias, mask, w_proj,
                                    b_proj, num_heads=H) ** 2)

    def loss_ref(x, w_qkv, b_qkv, bias, w_proj, b_proj):
        return jnp.sum(_wb_ref(x, w_qkv, b_qkv, bias, mask, w_proj,
                               b_proj, H) ** 2)

    args = (x, w_qkv, b_qkv, bias, w_proj, b_proj)
    go = jax.grad(loss_ours, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ("dx", "dw_qkv", "db_qkv", "dbias", "dw_proj", "db_proj")
    for name, a, b in zip(names, go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_window_block_fits_gates():
    """Shape gates: lane alignment, mask tiling, the VMEM static budget;
    window-7's N=49 fits via sublane padding; stage-4 (C=1024, 32 heads)
    fits via head-split groups."""
    from vit_torch_tpu.ops.window_block import fits, pick_config
    assert not fits(8, 64, 120, 3, None)         # C not a 32-lane granule
    assert fits(8, 64, 96, 3, None)              # swin_tiny stage 1 (C=96)
    assert not fits(7, 64, 128, 4, 4)            # Bn not tiled by nW
    assert fits(2048, 49, 128, 4, 64)            # swin_base_224: padded
    assert fits(2048, 144, 128, 4, 64)           # swin_base_384 stage 1
    assert fits(32, 144, 1024, 32, 1)            # stage 4: head-split
    assert pick_config(1, 32, 144, 1024, 32, True)[1] == 2
    # swin_large stage 4 (C=1536): masked, the x block exceeds the
    # activation budget; mask-less it fits via head-split groups=4
    # (e2e-faster than the attention-only fallback — see pick_config)
    assert not fits(32, 144, 1536, 48, 1)
    assert fits(32, 144, 1536, 48, None)
    assert pick_config(1, 32, 64, 1536, 48, False)[1] == 4


@pytest.mark.parametrize("masked,C", [(True, 128), (False, 128),
                                      (True, 96)])
def test_window_block_padded_window(masked, C):
    """Window-7 shapes (N=49, sublane-padded in the wrapper) match the
    unpadded XLA reference in forward and gradients — incl. the
    non-lane-aligned C=96 (swin_tiny stage 1)."""
    from vit_torch_tpu.ops.window_block import window_block
    x, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wb_inputs(N=49, C=C)
    H = 4
    m = mask if masked else None
    ours = window_block(x, w_qkv, b_qkv, bias, m, w_proj, b_proj,
                        num_heads=H)
    ref = _wb_ref(x, w_qkv, b_qkv, bias, m, w_proj, b_proj, H)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)

    def loss_ours(x, w_qkv, bias):
        return jnp.sum(window_block(x, w_qkv, b_qkv, bias, m, w_proj,
                                    b_proj, num_heads=H) ** 2)

    def loss_ref(x, w_qkv, bias):
        return jnp.sum(_wb_ref(x, w_qkv, b_qkv, bias, m, w_proj,
                               b_proj, H) ** 2)

    go = jax.grad(loss_ours, argnums=(0, 1, 2))(x, w_qkv, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w_qkv, bias)
    for name, a, b in zip(("dx", "dw_qkv", "dbias"), go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_window_block_in_swin_model(monkeypatch):
    """Full Swin forward: fused window-block path (interpret) matches the
    pure-XLA path on a wide config (C=128, shifted masks active)."""
    from vit_torch_tpu.models.swin import SwinConfig, SwinTransformer
    cfg = SwinConfig(embed_dim=128, depths=(2,), num_heads=(4,),
                     window_size=4, drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    model = SwinTransformer(cfg, dtype=jnp.float32)
    monkeypatch.setenv("VITX_FUSED_WINDOW", "0")
    monkeypatch.setenv("VITX_FUSED_BLOCK", "0")
    monkeypatch.setenv("VITX_FUSED_MLP", "0")
    params = model.init(jax.random.PRNGKey(0), x, True)["params"]
    ref = model.apply({"params": params}, x, True)
    monkeypatch.setenv("VITX_FUSED_WINDOW", "")
    monkeypatch.setenv("VITX_FUSED_BLOCK", "1")
    ours = model.apply({"params": params}, x, True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5, rtol=2e-4)


# --------------------------------------------------------------------------
# window_block_spatial (band-gather variant: partition/reverse in the DMA)
# --------------------------------------------------------------------------

def _wbs_inputs(B=2, Hp=16, Wp=16, w=4, C=128, H=4, seed=0):
    rng = np.random.default_rng(seed)
    nW = (Hp // w) * (Wp // w)
    N = w * w
    y = jnp.asarray(rng.normal(0, 1, (B, Hp, Wp, C)), jnp.float32)
    w_qkv = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), jnp.float32)
    b_qkv = jnp.asarray(rng.normal(0, 0.05, (3 * C,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.5, (H, N, N)), jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) > 0.7, -100.0, 0.0), jnp.float32)
    w_proj = jnp.asarray(rng.normal(0, 0.05, (C, C)), jnp.float32)
    b_proj = jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32)
    return y, w_qkv, b_qkv, bias, mask, w_proj, b_proj


def _wbs_ref(y, w_qkv, b_qkv, bias, mask, w_proj, b_proj, w, H):
    from vit_torch_tpu.models.swin import window_partition, window_reverse
    B, Hp, Wp, C = y.shape
    wins = window_partition(y, w)
    out = _wb_ref(wins, w_qkv, b_qkv, bias, mask, w_proj, b_proj, H)
    return window_reverse(out, w, Hp, Wp)


@pytest.mark.parametrize("masked", [True, False])
def test_window_block_spatial_forward(masked):
    from vit_torch_tpu.ops.window_block import (
        window_block_spatial, fits_spatial)
    y, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wbs_inputs()
    H, w = 4, 4
    m = mask if masked else None
    assert fits_spatial(y.shape[1], y.shape[2], w, y.shape[3], H, masked)
    ours = window_block_spatial(y, w_qkv, b_qkv, bias, m, w_proj, b_proj,
                                num_heads=H, window=w)
    ref = _wbs_ref(y, w_qkv, b_qkv, bias, m, w_proj, b_proj, w, H)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_window_block_spatial_backward():
    from vit_torch_tpu.ops.window_block import window_block_spatial
    y, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wbs_inputs(
        B=1, Hp=8, Wp=8, seed=2)
    H, w = 4, 4

    def loss_ours(y, w_qkv, b_qkv, bias, w_proj, b_proj):
        return jnp.sum(window_block_spatial(
            y, w_qkv, b_qkv, bias, mask, w_proj, b_proj,
            num_heads=H, window=w) ** 2)

    def loss_ref(y, w_qkv, b_qkv, bias, w_proj, b_proj):
        return jnp.sum(_wbs_ref(y, w_qkv, b_qkv, bias, mask, w_proj,
                                b_proj, w, H) ** 2)

    args = (y, w_qkv, b_qkv, bias, w_proj, b_proj)
    go = jax.grad(loss_ours, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    names = ("dy", "dw_qkv", "db_qkv", "dbias", "dw_proj", "db_proj")
    for name, a, b in zip(names, go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("masked", [False, True])
def test_window_block_spatial_head_split(masked):
    """groups > 1 (stage-4 C wide enough to trip head-split) matches the
    single-group kernel — incl. the masked combination (mask re-padded and
    BlockSpec-indexed per group call)."""
    from vit_torch_tpu.ops.window_block import _window_block_spatial
    y, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wbs_inputs(
        B=1, Hp=8, Wp=8, C=256, H=8, seed=3)
    m = mask if masked else None
    out_g1 = _window_block_spatial(
        y, w_qkv, b_qkv.reshape(1, -1), bias,
        m, w_proj, b_proj.reshape(1, -1), 8, (256 // 8) ** -0.5, 2, 4, 1, 1)
    out_g2 = _window_block_spatial(
        y, w_qkv, b_qkv.reshape(1, -1), bias,
        m, w_proj, b_proj.reshape(1, -1), 8, (256 // 8) ** -0.5, 2, 4, 2, 1)
    np.testing.assert_allclose(np.asarray(out_g1), np.asarray(out_g2),
                               atol=3e-5, rtol=1e-4)


def test_window_block_spatial_head_split_window7_masked():
    """Masked + head-split at a padded window (w=7, N=49→64) — the
    sublane-padding and per-group mask paths compose."""
    from vit_torch_tpu.ops.window_block import _window_block_spatial
    y, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wbs_inputs(
        B=1, Hp=14, Wp=14, w=7, C=128, H=4, seed=5)
    scale = (128 // 4) ** -0.5
    outs = [
        _window_block_spatial(
            y, w_qkv, b_qkv.reshape(1, -1), bias, mask, w_proj,
            b_proj.reshape(1, -1), 4, scale, 2, 7, g, 1)
        for g in (1, 2)
    ]
    np.testing.assert_allclose(np.asarray(outs[0]), np.asarray(outs[1]),
                               atol=3e-5, rtol=1e-4)


def test_window_block_spatial_fits_gates():
    from vit_torch_tpu.ops.window_block import fits_spatial
    # window-7 (N=49): padded to 64 rows inside the kernel — fits
    assert fits_spatial(56, 56, 7, 128, 4, True)
    # swin_base_384 stages 1-3 (masked and not)
    assert fits_spatial(96, 96, 12, 128, 4, True)
    assert fits_spatial(48, 48, 12, 256, 8, False)
    assert fits_spatial(24, 24, 12, 512, 16, True)
    # map not window-tiled
    assert not fits_spatial(90, 96, 12, 128, 4, False)
    # C not a 32-lane granule
    assert not fits_spatial(96, 96, 12, 120, 4, False)


@pytest.mark.parametrize("masked,C", [(True, 128), (False, 128),
                                      (True, 96)])
def test_window_block_spatial_padded_window(masked, C):
    """Window-7 (N=49, padded to 64 rows inside the kernel) matches the
    unpadded XLA reference in forward and gradients — incl. the
    sub-lane-tile C=96 (swin_tiny stage 1, lane-padded merge)."""
    from vit_torch_tpu.ops.window_block import window_block_spatial
    y, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wbs_inputs(
        B=1, Hp=14, Wp=14, w=7, C=C, seed=4)
    H, w = 4, 7
    m = mask if masked else None
    ours = window_block_spatial(y, w_qkv, b_qkv, bias, m, w_proj, b_proj,
                                num_heads=H, window=w)
    ref = _wbs_ref(y, w_qkv, b_qkv, bias, m, w_proj, b_proj, w, H)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)

    def loss_ours(y, w_qkv, bias):
        return jnp.sum(window_block_spatial(
            y, w_qkv, b_qkv, bias, m, w_proj, b_proj,
            num_heads=H, window=w) ** 2)

    def loss_ref(y, w_qkv, bias):
        return jnp.sum(_wbs_ref(y, w_qkv, b_qkv, bias, m, w_proj,
                                b_proj, w, H) ** 2)

    go = jax.grad(loss_ours, argnums=(0, 1, 2))(y, w_qkv, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(y, w_qkv, bias)
    for name, a, b in zip(("dy", "dw_qkv", "dbias"), go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_window_block_spatial_in_swin_model(monkeypatch):
    """Full Swin forward + grads: spatial band-gather path (interpret)
    matches the pure-XLA path with shifted masks active."""
    from vit_torch_tpu.models.swin import SwinConfig, SwinTransformer
    cfg = SwinConfig(embed_dim=128, depths=(2,), num_heads=(4,),
                     window_size=4, drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    model = SwinTransformer(cfg, dtype=jnp.float32)
    monkeypatch.setenv("VITX_FUSED_WINDOW", "0")
    monkeypatch.setenv("VITX_FUSED_BLOCK", "0")
    monkeypatch.setenv("VITX_FUSED_SPATIAL", "0")
    params = model.init(jax.random.PRNGKey(0), x, True)["params"]
    ref = model.apply({"params": params}, x, True)
    gref = jax.grad(lambda p: jnp.sum(
        model.apply({"params": p}, x, True) ** 2))(params)
    monkeypatch.setenv("VITX_FUSED_WINDOW", "")
    monkeypatch.setenv("VITX_FUSED_BLOCK", "")
    monkeypatch.setenv("VITX_FUSED_SPATIAL", "1")
    ours = model.apply({"params": params}, x, True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=5e-5, rtol=2e-4)
    gours = jax.grad(lambda p: jnp.sum(
        model.apply({"params": p}, x, True) ** 2))(params)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         gours, gref)
    assert max(jax.tree.leaves(diffs)) < 5e-4, diffs


# --------------------------------------------------------------------------
# fused_mlp
# --------------------------------------------------------------------------

def _mlp_inputs(T=392, C=128, Hd=512, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (T, C)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (C, Hd)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.05, (Hd,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (Hd, C)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.05, (C,)), jnp.float32)
    return x, w1, b1, w2, b2


def _mlp_ref(x, w1, b1, w2, b2):
    h = x @ w1 + b1
    h = jax.nn.gelu(h, approximate=False)
    return h @ w2 + b2


def test_fused_mlp_forward():
    from vit_torch_tpu.ops.fused_mlp import fused_mlp, fits
    x, w1, b1, w2, b2 = _mlp_inputs()
    assert fits(x.shape[0], 128, 512)
    ours = fused_mlp(x, w1, b1, w2, b2)
    ref = _mlp_ref(x, w1, b1, w2, b2)
    # the kernel's polynomial erf is accurate to ~2e-6 abs on gelu
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_mlp_leading_dims_and_out_dim():
    from vit_torch_tpu.ops.fused_mlp import fused_mlp
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 14, 14, 128)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (128, 256)), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (256, 384)), jnp.float32)
    ours = fused_mlp(x, w1, None, w2, None)
    assert ours.shape == (2, 14, 14, 384)
    ref = _mlp_ref(x, w1, jnp.zeros(256), w2, jnp.zeros(384))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_mlp_backward():
    from vit_torch_tpu.ops.fused_mlp import fused_mlp
    x, w1, b1, w2, b2 = _mlp_inputs(T=56, seed=4)
    go = jax.grad(lambda *a: jnp.sum(fused_mlp(*a) ** 2),
                  argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    gr = jax.grad(lambda *a: jnp.sum(_mlp_ref(*a) ** 2),
                  argnums=tuple(range(5)))(x, w1, b1, w2, b2)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_fused_mlp_in_mlp_module(monkeypatch):
    """Mlp module: fused path (interpret) matches the XLA path, params keep
    the Dense tree layout (fc1/kernel …)."""
    from vit_torch_tpu.models.layers import Mlp
    x = jnp.asarray(np.random.default_rng(5).normal(0, 1, (4, 49, 128)),
                    jnp.float32)
    m = Mlp(hidden_dim=256, dtype=jnp.float32)
    monkeypatch.setenv("VITX_FUSED_MLP", "0")
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    assert set(params) == {"fc1", "fc2"}
    assert set(params["fc1"]) == {"kernel", "bias"}
    ref = m.apply({"params": params}, x)
    monkeypatch.setenv("VITX_FUSED_MLP", "1")
    ours = m.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_window_block_head_split_groups():
    """Head-split mode (stage-4 shapes: weights past the VMEM budget) —
    G pallas calls over sliced qkv columns / bias rows / proj rows summed
    in XLA must equal the single-call kernel and the XLA reference."""
    from vit_torch_tpu.ops.window_block import _fwd_impl
    x, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wb_inputs(
        Bn=8, N=64, C=128, H=4, nW=4, seed=3)
    scale = (128 // 4) ** -0.5
    ref = _wb_ref(x, w_qkv, b_qkv, bias, mask, w_proj, b_proj, 4)
    for groups in (2, 4):
        out = _fwd_impl(x, w_qkv, b_qkv.reshape(1, -1), bias, mask, w_proj,
                        b_proj.reshape(1, -1), 4, scale, wb=4, kv_len=64,
                        groups=groups)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_window_block_head_split_grads():
    """Gradients flow through the head-split public path (recompute VJP)."""
    from vit_torch_tpu.ops.window_block import _window_block
    x, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wb_inputs(
        Bn=4, N=16, C=64, H=4, nW=2, seed=4)

    def loss(w_qkv, w_proj):
        out = _window_block(
            x, w_qkv, b_qkv.reshape(1, -1), bias, mask, w_proj,
            b_proj.reshape(1, -1), 4, (64 // 4) ** -0.5, 2, 16, 2)
        return jnp.sum(out ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(w_qkv, w_proj)

    def loss_ref(w_qkv, w_proj):
        return jnp.sum(_wb_ref(x, w_qkv, b_qkv, bias, mask, w_proj,
                               b_proj, 4) ** 2)

    r1, r2 = jax.grad(loss_ref, argnums=(0, 1))(w_qkv, w_proj)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), rtol=1e-3,
                               atol=1e-3)


# --------------------------------------------------------------------------
# window_block_full_spatial (full-block fusion: LN1+attn+res+LN2+MLP+res)
# --------------------------------------------------------------------------

def _swin_block_ab(C, HW, window, shift, heads, seed=0, grad=False):
    """Run SwinBlock unfused vs full-block-fused from identical params;
    returns (ref, fused) outputs (or gradient trees with grad=True)."""
    import os
    from vit_torch_tpu.models.swin import SwinBlock
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(0, 1, (2, HW, HW, C)), jnp.float32)
    outs = []
    envs = [
        {"VITX_FUSED_FULL": "0", "VITX_FUSED_SPATIAL": "0",
         "VITX_FUSED_BLOCK": "0", "VITX_FUSED_WINDOW": "0"},
        {"VITX_FUSED_FULL": "1"},
    ]
    keys = ("VITX_FUSED_FULL", "VITX_FUSED_SPATIAL", "VITX_FUSED_BLOCK",
            "VITX_FUSED_WINDOW")
    saved = {k: os.environ.get(k) for k in keys}
    try:
        for env in envs:
            for k in keys:
                os.environ.pop(k, None)
            os.environ.update(env)
            blk = SwinBlock(num_heads=heads, window_size=window,
                            shift_size=shift, dtype=jnp.float32)
            v = blk.init(jax.random.PRNGKey(0), x)
            if grad:
                g = jax.grad(lambda p: (blk.apply({"params": p}, x, True)
                                        ** 2).sum())(v["params"])
                outs.append(g)
            else:
                outs.append(np.asarray(blk.apply(v, x, True)))
    finally:
        for k, val in saved.items():
            if val is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = val
    return outs


@pytest.mark.parametrize("C,HW,window,shift,heads", [
    (64, 8, 4, 0, 2),      # plain
    (64, 8, 4, 2, 2),      # shifted (mask + roll inside-commute)
    (96, 12, 4, 2, 2),     # non-lane-tile channels (lane-pad path)
    (128, 14, 7, 3, 4),    # window-7 (N=49 sublane-pad) shifted
])
def test_full_block_matches_unfused(C, HW, window, shift, heads):
    """The full-block kernel (LN1 + W-MSA + residual + LN2 + MLP +
    residual in one program) must reproduce the unfused SwinBlock
    composition bit-for-bit at fp32 tolerance, param tree unchanged."""
    ref, out = _swin_block_ab(C, HW, window, shift, heads)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_full_block_grads_match_unfused():
    """Custom-VJP backward (recompute through the XLA composition) must
    match the unfused block's gradients for every param."""
    gref, gout = _swin_block_ab(96, 12, 4, 2, 2, grad=True)
    flat_r = jax.tree_util.tree_flatten_with_path(gref)[0]
    flat_o = dict(jax.tree_util.tree_flatten_with_path(gout)[0])
    assert set(flat_o) == {k for k, _ in flat_r}
    for k, a in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_o[k]), np.asarray(a), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(k))


def test_layer_norm_params_matches_flax_layernorm():
    """The in-kernel LayerNorm replication (fp32 fast-variance stats,
    flax op ordering) must match nn.LayerNorm(epsilon=1e-5) on bf16 and
    fp32 inputs."""
    import flax.linen as nn
    from vit_torch_tpu.ops.window_block import _ln_rows_f32
    rng = np.random.default_rng(0)
    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.normal(0, 3, (64, 96)), dt)
        scale = jnp.asarray(rng.normal(1, 0.2, (96,)), jnp.float32)
        bias = jnp.asarray(rng.normal(0, 0.2, (96,)), jnp.float32)
        ln = nn.LayerNorm(epsilon=1e-5, dtype=dt)
        ref = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
        out = _ln_rows_f32(x.astype(jnp.float32), scale.reshape(1, -1),
                           bias.reshape(1, -1)).astype(dt)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=1e-5, atol=1e-5)


def test_window_block_spatial_multi_row_bands():
    """wbh > 1 (multi-row window bands — the round-5 small-C lever) must
    match the single-row kernel exactly at every wbh, masked and not."""
    import os

    from vit_torch_tpu.ops.window_block import window_block_spatial
    y, w_qkv, b_qkv, bias, mask, w_proj, b_proj = _wbs_inputs(
        B=2, Hp=28, Wp=28, w=7, C=64, H=2, seed=9)
    for m in (None, mask):
        outs = {}
        for wbh in ("1", "2", "4"):
            os.environ["VITX_WBH"] = wbh
            try:
                outs[wbh] = np.asarray(window_block_spatial(
                    y, w_qkv, b_qkv, bias, m, w_proj, b_proj,
                    num_heads=2, window=7))
            finally:
                os.environ.pop("VITX_WBH", None)
        for wbh in ("2", "4"):
            np.testing.assert_allclose(outs[wbh], outs["1"],
                                       atol=3e-6, rtol=1e-5)


def test_band_kernel_accepts_all_shipped_zoo_shapes():
    """Advisor r4: `_wbw_aligned` can decrement wbw to 0 and silently
    revert shapes to the unfused XLA path.  Pin that `fits_spatial`
    accepts every stage shape of the shipped Swin zoo configs (both
    shifted and unshifted) so a future picker change that drops one
    fails here instead of silently regressing throughput."""
    from vit_torch_tpu.models.swin import SWIN_CONFIGS
    from vit_torch_tpu.ops.window_block import fits_spatial

    for arch, size in [("swin_tiny_patch4_window7_224", 224),
                       ("swin_small_patch4_window7_224", 224),
                       ("swin_base_patch4_window7_224", 224),
                       ("swin_large_patch4_window7_224", 224),
                       ("swin_base_patch4_window12_384", 384),
                       ("swin_large_patch4_window12_384", 384)]:
        cfg = SWIN_CONFIGS[arch]
        g = size // cfg.patch_size
        dim = cfg.embed_dim
        for li, heads in enumerate(cfg.num_heads):
            hp = g // (2 ** li)
            w = min(cfg.window_size, hp)
            for masked in (False, True):
                if w >= hp and masked:
                    continue       # whole-map window: shift disabled
                if (arch, li, masked) == (
                        "swin_large_patch4_window12_384", 2, True):
                    # KNOWN-UNSERVED since round 4 (pre-existing): C=768
                    # w=12 masked has no aligned wbw under the masked act
                    # budget (nWc=2, wbw=1 fails the 8-alignment; full-row
                    # wbw=2 is 221k elems vs the 150k budget), so these
                    # shifted blocks run the XLA fallback.  Tracked in
                    # CLAUDE.md known gaps; flip this to an assert if a
                    # relaxed-budget pick ever serves it.
                    assert not fits_spatial(hp, hp, w, dim, heads, masked)
                    continue
                assert fits_spatial(hp, hp, w, dim, heads, masked), \
                    (arch, li, dim, heads, masked)
            dim *= 2
