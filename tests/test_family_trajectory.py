"""Family-complete training-step trajectory parity vs torch (VERDICT r4 §2).

``test_model_trajectory.py`` pins ViT + shifted-window Swin train steps;
these tests extend the same gate to the four families whose train-time
semantics are riskiest:

- XCiT: conv-stem/LPI BatchNorm — batch-stats normalization AND the
  torch-style UNBIASED running-variance update (``layers.BatchNorm``),
  under a full AdamW train loop (reference ``models/xcit.py:58-141``);
- ResNeXt: BN everywhere + SGD-momentum (reference ``utils_network.py:119``
  ``optim.SGD(momentum=0.9)`` over torchvision ResNeXt);
- CaiT: LayerScale gammas and talking-heads head-mixing inside the
  differentiated graph (reference ``models/cait.py:87-150``);
- DeiT: distilled dual-token forward with forced (cls+dist)/2 averaging
  feeding one CE loss (reference ``models/deit.py:63-91``).

Each family gets (a) an fp64 run where loss/param/running-stat
trajectories must agree with torch to fp32-machine precision (both graphs
keep fp32-by-design ops: exact-GELU upcast, fp32 LN/BN stats), and (b) a
bf16-compute run whose loss curve must track the exact trajectory — the
production mixed-precision policy cannot drift the optimization path.

Torch minis are imported from the forward-parity suites where they exist
(XCiT/ResNeXt/DeiT); CaiT gets a full mini here (the parity suite only
covers its two attention modules) with the exact published key layout
``import_cait`` consumes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from test_cait_parity import _TClassAttn, _TTalkingHead
from test_deit_parity import _TorchDeiT, DIM as DEIT_DIM, IMG as DEIT_IMG
from test_resnet_parity import _TResNet, _randomize_bn
from test_xcit_parity import _TXCiT, DIM as XC_DIM, IMG as XC_IMG
from vit_torch_tpu.checkpoint.torch_import import import_backbone
from vit_torch_tpu.models import VisionModelZoo
from vit_torch_tpu.models.cait import CaiT, CaiTConfig
from vit_torch_tpu.train.optimizers import get_optimizer

NCLS, BS, N_STEPS, LR = 4, 2, 4, 1e-3


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


def _train_torch(net, head, xs, ys, opt):
    """N optimizer steps on CE loss; ``net.train()`` so BN uses batch stats
    and updates running stats exactly like the reference's hot loop."""
    net.train()
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


def _train_jax(apply_feats, params, state, xs, ys, dtype, opt_name="adamw"):
    """Same N steps through our optimizer registry; ``state`` threads the
    mutable ``batch_stats`` collection ({} for BN-free families)."""
    tx = get_optimizer(opt_name, lr=LR)
    opt_state = tx.init(params)
    acc = jnp.float64 if dtype == jnp.float64 else jnp.float32

    def loss_fn(params, state, x, y):
        feats, state = apply_feats(params, state, x.astype(dtype))
        logits = (feats.astype(acc) @ params["head"]["w"]
                  + params["head"]["b"])
        logp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
        return loss, state

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    losses = []
    for x, y in zip(xs, ys):
        (loss, state), grads = grad_fn(params, state,
                                       jnp.asarray(x), jnp.asarray(y))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        losses.append(float(loss))
    return params, state, losses


def _head_params(head):
    return {"w": jnp.array(head.weight.detach().double().numpy().T.copy()),
            "b": jnp.array(head.bias.detach().double().numpy().copy())}


def _leaves_close(tree_a, tree_b, atol):
    flat_a = jax.tree.leaves(tree_a)
    flat_b = jax.tree.leaves(tree_b)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float64),
                                   np.asarray(b, dtype=np.float64),
                                   atol=atol, rtol=atol)


# ------------------------------------------------------------------ XCiT
def _xcit_setup(jdtype):
    torch.manual_seed(0)
    tm = _TXCiT().double()
    head = nn.Linear(XC_DIM, NCLS).double()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    zm = VisionModelZoo.get_model("xcit_test", classifier=None,
                                  image_size=XC_IMG, dtype=jdtype)
    variables = zm.init(jax.random.PRNGKey(0), image_size=XC_IMG)
    imported = import_backbone(
        "xcit", sd, variables["params"]["backbone"],
        {"batch_stats": variables["batch_stats"]["backbone"]})
    params = {
        "backbone": jax.tree.map(lambda a: jnp.array(np.array(a)),
                                 imported["params"]),
        "head": _head_params(head),
    }
    state = jax.tree.map(lambda a: jnp.array(np.array(a)),
                         imported["batch_stats"])

    def apply_feats(params, state, x):
        feats, upd = zm.model.apply(
            {"params": {"backbone": params["backbone"]},
             "batch_stats": {"backbone": state}},
            x, False, mutable=["batch_stats"])
        return feats, upd["batch_stats"]["backbone"]

    return tm, head, params, state, apply_feats


def _torch_bn_stats(tm):
    """(mean, var) running stats of every BN module, state_dict order."""
    out = {}
    for k, v in tm.state_dict().items():
        if k.endswith("running_mean") or k.endswith("running_var"):
            out[k] = v.detach().numpy().copy()
    return out


def test_xcit_train_trajectory_fp64_exact(x64):
    """Full-XCiT AdamW train steps track torch step-for-step WITH the BN
    running statistics: batch-stats normalization in the forward, unbiased
    (×n/(n−1)) running-var updates on the side.  flax's stock BatchNorm
    fails the running-var assertion (biased update)."""
    xs, ys = _batches(N_STEPS, BS, XC_IMG)
    tm, head, params, state, apply_feats = _xcit_setup(jnp.float64)
    tl = _train_torch(tm, head, xs, ys,
                      torch.optim.AdamW([*tm.parameters(),
                                         *head.parameters()], lr=LR))
    params, state, jl = _train_jax(apply_feats, params, state, xs, ys,
                                   jnp.float64)
    np.testing.assert_allclose(jl, tl, rtol=2e-6, atol=2e-6)
    # the running stats our next EVAL would use must equal torch's
    tstats = _torch_bn_stats(tm)
    ours = state["patch_embed"]
    np.testing.assert_allclose(
        np.asarray(ours["bn0"]["var"]),
        tstats["patch_embed.proj.0.1.running_var"], atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ours["bn0"]["mean"]),
        tstats["patch_embed.proj.0.1.running_mean"], atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state["blocks_0"]["local_mp"]["bn"]["var"]),
        tstats["blocks.0.local_mp.bn.running_var"], atol=1e-6, rtol=1e-6)
    # trained params spot-check: stem conv + a LayerScale gamma
    sd = tm.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["blocks_0"]["gamma1"]),
        sd["blocks.0.gamma1"].numpy(), atol=1e-6)


def test_xcit_train_trajectory_bf16_tracks_exact(x64):
    xs, ys = _batches(N_STEPS + 2, BS, XC_IMG, seed=7)
    tm, head, params, state, apply_feats = _xcit_setup(jnp.float64)
    tl = _train_torch(tm, head, xs, ys,
                      torch.optim.AdamW([*tm.parameters(),
                                         *head.parameters()], lr=LR))
    _, _, params16, state16, apply16 = _xcit_setup(jnp.bfloat16)
    params16 = jax.tree.map(lambda a: a.astype(jnp.float32), params16)
    state16 = jax.tree.map(lambda a: a.astype(jnp.float32), state16)
    _, _, jl16 = _train_jax(apply16, params16, state16,
                            xs.astype(np.float32), ys, jnp.bfloat16)
    np.testing.assert_allclose(jl16, tl, rtol=4e-2, atol=4e-2)


# --------------------------------------------------------------- ResNeXt
RN_IMG = 32


def _resnet_setup(jdtype):
    torch.manual_seed(0)
    tm = _TResNet().double()
    _randomize_bn(tm)
    head = nn.Linear(512, NCLS).double()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    zm = VisionModelZoo.get_model("resnet_test", classifier=None,
                                  image_size=RN_IMG, dtype=jdtype)
    variables = zm.init(jax.random.PRNGKey(0), image_size=RN_IMG)
    imported = import_backbone(
        "resnet", sd, variables["params"]["backbone"],
        {"batch_stats": variables["batch_stats"]["backbone"]})
    params = {
        "backbone": jax.tree.map(lambda a: jnp.array(np.array(a)),
                                 imported["params"]),
        "head": _head_params(head),
    }
    state = jax.tree.map(lambda a: jnp.array(np.array(a)),
                         imported["batch_stats"])

    def apply_feats(params, state, x):
        feats, upd = zm.model.apply(
            {"params": {"backbone": params["backbone"]},
             "batch_stats": {"backbone": state}},
            x, False, mutable=["batch_stats"])
        return feats, upd["batch_stats"]["backbone"]

    return tm, head, params, state, apply_feats


def test_resnext_train_trajectory_fp64_exact(x64):
    """Bottleneck-ResNet SGD-momentum train steps track torch exactly —
    the reference's CNN hot path (``optim.SGD(momentum=0.9)``, BN batch
    stats, ReLU/maxpool AD) end to end, incl. unbiased running-var."""
    xs, ys = _batches(N_STEPS, BS, RN_IMG)
    tm, head, params, state, apply_feats = _resnet_setup(jnp.float64)
    tl = _train_torch(tm, head, xs, ys,
                      torch.optim.SGD([*tm.parameters(),
                                       *head.parameters()],
                                      lr=LR, momentum=0.9))
    params, state, jl = _train_jax(apply_feats, params, state, xs, ys,
                                   jnp.float64, opt_name="sgd")
    np.testing.assert_allclose(jl, tl, rtol=2e-6, atol=2e-6)
    tstats = _torch_bn_stats(tm)
    np.testing.assert_allclose(
        np.asarray(state["bn1"]["var"]), tstats["bn1.running_var"],
        atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state["layer1_0"]["bn2"]["var"]),
        tstats["layer1.0.bn2.running_var"], atol=1e-6, rtol=1e-6)
    sd = tm.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["layer2_0"]["conv1"]["kernel"]),
        sd["layer2.0.conv1.weight"].numpy().transpose(2, 3, 1, 0),
        atol=1e-6)


def test_resnext_train_trajectory_bf16_tracks_exact(x64):
    xs, ys = _batches(N_STEPS + 2, BS, RN_IMG, seed=11)
    tm, head, params, state, apply_feats = _resnet_setup(jnp.float64)
    tl = _train_torch(tm, head, xs, ys,
                      torch.optim.SGD([*tm.parameters(),
                                       *head.parameters()],
                                      lr=LR, momentum=0.9))
    _, _, params16, state16, apply16 = _resnet_setup(jnp.bfloat16)
    params16 = jax.tree.map(lambda a: a.astype(jnp.float32), params16)
    state16 = jax.tree.map(lambda a: a.astype(jnp.float32), state16)
    _, _, jl16 = _train_jax(apply16, params16, state16,
                            xs.astype(np.float32), ys, jnp.bfloat16,
                            opt_name="sgd")
    np.testing.assert_allclose(jl16, tl, rtol=4e-2, atol=4e-2)


# ------------------------------------------------------------------ CaiT
CT_DIM, CT_HEADS, CT_PATCH, CT_IMG = 32, 4, 8, 16


class _TCaiTLN(nn.Module):
    pass


class _TCaiTBlock(nn.Module):
    """LayerScale_Block (reference models/cait.py:130-150): pre-norm
    talking-heads attention + MLP, gamma-gated residuals."""

    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(CT_DIM, eps=1e-6)
        self.attn = _TTalkingHead()
        self.norm2 = nn.LayerNorm(CT_DIM, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(CT_DIM, CT_DIM * 4)
        self.mlp.fc2 = nn.Linear(CT_DIM * 4, CT_DIM)
        self.gamma_1 = nn.Parameter(torch.full((CT_DIM,), 0.5))
        self.gamma_2 = nn.Parameter(torch.full((CT_DIM,), 0.5))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        y = self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.gamma_2 * y


class _TCaiTBlockCA(nn.Module):
    """LayerScale_Block_CA (reference models/cait.py:57-84): CLS-query
    class attention over [cls; patches], CLS-only residual stream."""

    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(CT_DIM, eps=1e-6)
        self.attn = _TClassAttn()
        self.norm2 = nn.LayerNorm(CT_DIM, eps=1e-6)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(CT_DIM, CT_DIM * 4)
        self.mlp.fc2 = nn.Linear(CT_DIM * 4, CT_DIM)
        self.gamma_1 = nn.Parameter(torch.full((CT_DIM,), 0.5))
        self.gamma_2 = nn.Parameter(torch.full((CT_DIM,), 0.5))

    def forward(self, x, x_cls):
        u = torch.cat([x_cls, x], dim=1)
        x_cls = x_cls + self.gamma_1 * self.attn(self.norm1(u))
        y = self.mlp.fc2(nn.functional.gelu(self.mlp.fc1(self.norm2(x_cls))))
        return x_cls + self.gamma_2 * y


class _TorchCaiT(nn.Module):
    """Mini CaiT with the published key layout ``import_cait`` consumes
    (patch_embed.proj conv, blocks.N.*, blocks_token_only.N.*, norm)."""

    def __init__(self):
        super().__init__()
        n = (CT_IMG // CT_PATCH) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, CT_DIM, CT_PATCH, CT_PATCH)
        self.cls_token = nn.Parameter(torch.randn(1, 1, CT_DIM) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n, CT_DIM) * 0.02)
        self.blocks = nn.ModuleList(_TCaiTBlock() for _ in range(2))
        self.blocks_token_only = nn.ModuleList(
            _TCaiTBlockCA() for _ in range(2))
        self.norm = nn.LayerNorm(CT_DIM, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        cls = self.cls_token.expand(B, -1, -1)
        for blk in self.blocks_token_only:
            cls = blk(x, cls)
        x = torch.cat([cls, x], dim=1)
        return self.norm(x)[:, 0]


def _cait_setup(jdtype):
    torch.manual_seed(0)
    tm = _TorchCaiT().double()
    head = nn.Linear(CT_DIM, NCLS).double()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    cfg = CaiTConfig(embed_dim=CT_DIM, depth=2, num_heads=CT_HEADS,
                     patch_size=CT_PATCH, depth_token_only=2)
    model = CaiT(cfg, dtype=jdtype, name="backbone")
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, CT_IMG, CT_IMG, 3), jdtype))
    imported = import_backbone("cait", sd, variables["params"])
    params = {
        "backbone": jax.tree.map(lambda a: jnp.array(np.array(a)),
                                 imported["params"]),
        "head": _head_params(head),
    }

    def apply_feats(params, state, x):
        return model.apply({"params": params["backbone"]}, x, True), state

    return tm, head, params, apply_feats


def test_cait_train_trajectory_fp64_exact(x64):
    """AdamW through LayerScale gammas + talking-heads mixing + CLS-only
    class-attention blocks tracks torch step-for-step."""
    xs, ys = _batches(N_STEPS, BS, CT_IMG)
    tm, head, params, apply_feats = _cait_setup(jnp.float64)
    tl = _train_torch(tm, head, xs, ys,
                      torch.optim.AdamW([*tm.parameters(),
                                         *head.parameters()], lr=LR))
    params, _, jl = _train_jax(apply_feats, params, {}, xs, ys, jnp.float64)
    np.testing.assert_allclose(jl, tl, rtol=2e-6, atol=2e-6)
    sd = tm.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["blocks_0"]["gamma_1"]),
        sd["blocks.0.gamma_1"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["blocks_token_only_1"]["attn"]["q"]
                   ["kernel"]),
        sd["blocks_token_only.1.attn.q.weight"].numpy().T, atol=1e-6)


def test_cait_train_trajectory_bf16_tracks_exact(x64):
    xs, ys = _batches(N_STEPS + 2, BS, CT_IMG, seed=5)
    tm, head, params, apply_feats = _cait_setup(jnp.float64)
    tl = _train_torch(tm, head, xs, ys,
                      torch.optim.AdamW([*tm.parameters(),
                                         *head.parameters()], lr=LR))
    _, _, params16, apply16 = _cait_setup(jnp.bfloat16)
    params16 = jax.tree.map(lambda a: a.astype(jnp.float32), params16)
    _, _, jl16 = _train_jax(apply16, params16, {},
                            xs.astype(np.float32), ys, jnp.bfloat16)
    np.testing.assert_allclose(jl16, tl, rtol=4e-2, atol=4e-2)


# ------------------------------------------------------------------ DeiT
def _deit_setup(jdtype):
    torch.manual_seed(0)
    tm = _TorchDeiT().double()
    head = nn.Linear(DEIT_DIM, NCLS).double()
    sd = {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}

    zm = VisionModelZoo.get_model("deit_test_distilled", classifier=None,
                                  image_size=DEIT_IMG, dtype=jdtype)
    variables = zm.init(jax.random.PRNGKey(0), image_size=DEIT_IMG)
    backbone = import_backbone("deit", sd,
                               variables["params"]["backbone"])["params"]
    params = {
        "backbone": jax.tree.map(lambda a: jnp.array(np.array(a)), backbone),
        "head": _head_params(head),
    }

    def apply_feats(params, state, x):
        return zm.model.apply({"params": {"backbone": params["backbone"]}},
                              x, True), state

    return tm, head, params, apply_feats


def test_deit_train_trajectory_fp64_exact(x64):
    """AdamW through the dual-token (cls+dist)/2 forced average tracks
    torch — both token embeddings receive the same half-scaled gradient
    through the shared CE head."""
    xs, ys = _batches(N_STEPS, BS, DEIT_IMG)
    tm, head, params, apply_feats = _deit_setup(jnp.float64)
    tl = _train_torch(tm, head, xs, ys,
                      torch.optim.AdamW([*tm.parameters(),
                                         *head.parameters()], lr=LR))
    params, _, jl = _train_jax(apply_feats, params, {}, xs, ys, jnp.float64)
    np.testing.assert_allclose(jl, tl, rtol=2e-6, atol=2e-6)
    sd = tm.state_dict()
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["dist_token"]).squeeze(),
        sd["dist_token"].numpy().squeeze(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["cls_token"]).squeeze(),
        sd["cls_token"].numpy().squeeze(), atol=1e-6)


def test_deit_train_trajectory_bf16_tracks_exact(x64):
    xs, ys = _batches(N_STEPS + 2, BS, DEIT_IMG, seed=9)
    tm, head, params, apply_feats = _deit_setup(jnp.float64)
    tl = _train_torch(tm, head, xs, ys,
                      torch.optim.AdamW([*tm.parameters(),
                                         *head.parameters()], lr=LR))
    _, _, params16, apply16 = _deit_setup(jnp.bfloat16)
    params16 = jax.tree.map(lambda a: a.astype(jnp.float32), params16)
    _, _, jl16 = _train_jax(apply16, params16, {},
                            xs.astype(np.float32), ys, jnp.bfloat16)
    np.testing.assert_allclose(jl16, tl, rtol=4e-2, atol=4e-2)
