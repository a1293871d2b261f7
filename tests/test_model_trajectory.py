"""Full-model training-step trajectory parity vs torch.

``test_torch_trajectory.py`` pins every optimizer/schedule on a tiny MLP;
the forward-parity suites pin every backbone's logits.  What neither
covers is the COMPOSITE: AD through a real transformer block — attention
chain, LayerNorm, GELU, patch-embed conv, shifted-window roll/mask — fed
through the actual optimizer for N train steps.  That composite is where
a sub-0.3%-top-1 drift (the reference's accuracy gate) would hide.

These tests build the independent torch minis from the parity suites
(`test_checkpoint._TorchViT`, `test_swin_parity._TSwinBlock` et al.),
import their weights through the product importers, then train BOTH sides
from identical weights on identical batches with AdamW:

- fp64: the loss/param trajectories must agree to near machine precision
  (the jax and torch graphs are the same real-valued function, so any
  disagreement is a semantic bug, not noise).
- bf16 compute policy (params fp32, matmuls bf16 — the production dtype
  policy): the loss curve must track the exact fp64 trajectory within a
  stated tolerance, pinning that mixed precision does not drift the
  optimization path.

Reference hot loop being mirrored: ``utils_network.py:359-516`` (train
epoch: forward, CE loss, backward, optimizer step per batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from test_checkpoint import _TorchViT
from test_swin_parity import _TSwinBlock, EMBED, WINDOW
from vit_torch_tpu.checkpoint.torch_import import import_backbone, import_swin
from vit_torch_tpu.models import VisionModelZoo
from vit_torch_tpu.models.layers import drop_path
from vit_torch_tpu.models.swin import SwinConfig, SwinTransformer
from vit_torch_tpu.train.optimizers import get_optimizer

DIM, IMG, NCLS = 64, 16, 4          # matches test_checkpoint's _TorchViT
BS, N_STEPS, LR = 2, 4, 1e-3


@pytest.fixture()
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _batches(n_steps, bs, img, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.normal(0, 1, (n_steps, bs, img, img, 3))
    ys = rng.integers(0, NCLS, (n_steps, bs))
    return xs, ys


def _train_torch(net, head, xs, ys):
    """N AdamW steps on CE loss; returns per-step losses."""
    opt = torch.optim.AdamW([*net.parameters(), *head.parameters()], lr=LR)
    loss_fn = nn.CrossEntropyLoss()
    losses = []
    for x, y in zip(xs, ys):
        opt.zero_grad()
        feats = net(torch.tensor(x.transpose(0, 3, 1, 2)))
        loss = loss_fn(head(feats), torch.tensor(y))
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _train_jax(apply_feats, params, xs, ys, dtype):
    """Same N steps through our optimizer registry; params stay at their
    native (imported) precision, compute runs at ``dtype``."""
    tx = get_optimizer("adamw", lr=LR)
    opt_state = tx.init(params)

    def loss_fn(params, x, y):
        feats = apply_feats(params, x.astype(dtype))
        logits = (feats.astype(jnp.float32) @ params["head"]["w"]
                  + params["head"]["b"])
        logp = jax.nn.log_softmax(logits.astype(jnp.float64
                                                if x.dtype == jnp.float64
                                                else jnp.float32), axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for x, y in zip(xs, ys):
        loss, grads = grad_fn(params, jnp.asarray(x), jnp.asarray(y))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        losses.append(float(loss))
    return params, losses


# ------------------------------------------------------------------- ViT
def _vit_setup(jdtype, tdtype):
    torch.manual_seed(0)
    tm = _TorchViT().to(tdtype)
    head = nn.Linear(DIM, NCLS).to(tdtype)
    sd = {k: v.detach().double().numpy().copy()
          for k, v in tm.state_dict().items()}

    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=None,
                                  image_size=IMG, dtype=jdtype)
    variables = zm.init(jax.random.PRNGKey(0), image_size=IMG)
    backbone = import_backbone("dino", sd,
                               variables["params"]["backbone"])["params"]
    # NB: ``tensor.double().numpy()`` is a no-copy ALIAS when the tensor is
    # already fp64, and jnp.asarray zero-copies fp64 numpy on CPU — without
    # an explicit copy, torch's in-place optimizer updates would mutate the
    # jax side's starting weights.
    params = {
        "backbone": jax.tree.map(lambda a: jnp.array(np.array(a)), backbone),
        "head": {"w": jnp.array(head.weight.detach().double().numpy().T
                                .copy()),
                 "b": jnp.array(head.bias.detach().double().numpy().copy())},
    }

    def apply_feats(params, x):
        return zm.model.apply({"params": {"backbone": params["backbone"]}},
                              x, True)
    return tm, head, params, apply_feats


def test_vit_train_trajectory_fp64_exact(x64):
    """N AdamW train steps of the full ViT (patch-embed conv + pre-LN
    attention + GELU MLP + CLS head) track torch step-for-step.

    Precision bound: the product keeps GELU / patch-embed accumulation in
    fp32 by design (``layers.gelu_exact`` — matches torch's own bf16-mode
    rounding) and the importer stores fp32 leaves, so the trajectories
    agree to fp32 machine precision (~1e-7 observed), not fp64.  Any
    SEMANTIC divergence (wrong LN eps, tanh-GELU, decoupled-vs-coupled
    weight decay) measures 1e-3+ here."""
    xs, ys = _batches(N_STEPS, BS, IMG)
    tm, head, params, apply_feats = _vit_setup(jnp.float64, torch.float64)
    tl = _train_torch(tm, head, xs, ys)
    params, jl = _train_jax(apply_feats, params, xs, ys, jnp.float64)
    np.testing.assert_allclose(jl, tl, rtol=2e-6, atol=2e-6)
    # spot-check trained parameters (embedding, attention, head)
    sd = tm.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["cls_token"]).squeeze(),
        sd["cls_token"].numpy().squeeze(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"]),
        sd["blocks.0.attn.qkv.weight"].numpy().T, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["head"]["w"]), head.weight.detach().numpy().T,
        atol=1e-6)


def test_vit_train_trajectory_bf16_tracks_exact(x64):
    """The production dtype policy (fp32 params, bf16 compute) must follow
    the exact trajectory: same loss curve within 3% at every step.  A
    semantic bug in the bf16 path (wrong accumulation dtype, a dropped
    cast) shows up as a diverging curve, not a small uniform offset."""
    xs, ys = _batches(N_STEPS + 2, BS, IMG, seed=7)
    tm, head, params, apply_feats = _vit_setup(jnp.float64, torch.float64)
    tl = _train_torch(tm, head, xs, ys)

    _, _, params16, apply16 = _vit_setup(jnp.bfloat16, torch.float64)
    params16 = jax.tree.map(lambda a: a.astype(jnp.float32), params16)
    _, jl16 = _train_jax(apply16, params16, xs.astype(np.float32),
                         ys, jnp.bfloat16)
    np.testing.assert_allclose(jl16, tl, rtol=3e-2, atol=3e-2)


# ------------------------------------------------------------------ Swin
SW_IMG, SW_PATCH = 32, 4            # 8x8 feature map > window 4 → shift on


class _TSwinSingleStage(nn.Module):
    """One Swin stage, second block shifted (the composite the fp64 test
    needs AD through: cyclic roll, attn mask, rel-pos-bias gather)."""

    def __init__(self):
        super().__init__()
        from test_swin_parity import _TPatchEmbed
        self.patch_embed = _TPatchEmbed(EMBED, SW_PATCH)
        blocks = [_TSwinBlock(EMBED, 2, WINDOW, 0),
                  _TSwinBlock(EMBED, 2, WINDOW, WINDOW // 2)]
        stage = nn.Module()
        stage.blocks = nn.ModuleList(blocks)
        self.layers = nn.ModuleList([stage])
        self.norm = nn.LayerNorm(EMBED)

    def forward(self, x):  # NCHW
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for blk in self.layers[0].blocks:
            x = blk(x)
        return self.norm(x).mean(dim=(1, 2))


def test_swin_shifted_block_trajectory_fp64(x64):
    """N AdamW train steps through a shifted-window Swin stage track torch
    to fp64 precision (roll direction, mask additivity and the bias gather
    all sit inside the differentiated graph)."""
    torch.manual_seed(1)
    tm = _TSwinSingleStage().double()
    head = nn.Linear(EMBED, NCLS).double()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    cfg = SwinConfig(patch_size=SW_PATCH, embed_dim=EMBED, depths=(2,),
                     num_heads=(2,), window_size=WINDOW, drop_path_rate=0.0)
    model = SwinTransformer(cfg, dtype=jnp.float64, name="backbone")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, SW_IMG, SW_IMG, 3)))
    imported = import_swin(sd, variables["params"])
    params = {
        "backbone": jax.tree.map(lambda a: jnp.array(np.array(a)), imported),
        "head": {"w": jnp.array(head.weight.detach().numpy().T.copy()),
                 "b": jnp.array(head.bias.detach().numpy().copy())},
    }

    def apply_feats(params, x):
        return model.apply({"params": params["backbone"]}, x, True)

    xs, ys = _batches(N_STEPS, BS, SW_IMG, seed=3)
    tl = _train_torch(tm, head, xs, ys)
    params, jl = _train_jax(apply_feats, params, xs, ys, jnp.float64)
    # fp32-limited like the ViT case (fp32 GELU by design)
    np.testing.assert_allclose(jl, tl, rtol=2e-6, atol=2e-6)


# -------------------------------------------------------------- DropPath
def test_drop_path_forward_and_grad_match_torch_semantics():
    """DropPath can't be trajectory-matched (different RNGs), so pin its
    semantics directly: given the SAME realized keep-mask, our forward and
    its AD gradient must equal timm's ``x.div(keep) * mask`` (the exact
    form the reference's blocks call, e.g. reference models/cait.py:74)."""
    rate = 0.3
    key = jax.random.PRNGKey(42)
    x = np.random.default_rng(0).normal(0, 1, (16, 5, 8)).astype(np.float32)
    w = np.random.default_rng(1).normal(0, 1, x.shape).astype(np.float32)

    out = np.asarray(drop_path(jnp.asarray(x), rate, False, key))
    # recover the realized per-sample mask from the output
    mask = (np.abs(out).sum(axis=(1, 2)) != 0).astype(np.float32)
    assert 0 < mask.sum() < len(mask), "degenerate draw; change the key"

    xt = torch.tensor(x, requires_grad=True)
    mt = torch.tensor(mask).view(-1, 1, 1)
    torch_out = xt.div(1 - rate) * mt            # timm DropPath, same mask
    np.testing.assert_allclose(out, torch_out.detach().numpy(),
                               rtol=1e-6, atol=1e-6)

    g = jax.grad(lambda x: (drop_path(x, rate, False, key)
                            * jnp.asarray(w)).sum())(jnp.asarray(x))
    (torch_out * torch.tensor(w)).sum().backward()
    np.testing.assert_allclose(np.asarray(g), xt.grad.numpy(),
                               rtol=1e-6, atol=1e-6)
