"""Golden logits-parity for the ResNet family: independent torch bottleneck
net (torchvision layout) through ``import_resnet`` must match our flax
ResNet — covers conv stride/padding conventions, maxpool semantics, BN
eval-mode math, and the grouped-conv width rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from vit_torch_tpu.checkpoint.torch_import import import_backbone
from vit_torch_tpu.models import VisionModelZoo


class _TBottleneck(nn.Module):
    def __init__(self, cin, planes, stride, groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        out = planes * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.downsample = nn.Sequential(
            nn.Conv2d(cin, out, 1, stride, bias=False), nn.BatchNorm2d(out))
        self.relu = nn.ReLU()

    def forward(self, x):
        idt = self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(idt + y)


class _TResNet(nn.Module):
    """layers=(1,1) bottleneck net matching our 'resnet_test' config, with
    torchvision key names (layer{i}.{j}.conv/bn/downsample.{0,1})."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(_TBottleneck(64, 64, 1))
        self.layer2 = nn.Sequential(_TBottleneck(256, 128, 2))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        return x.mean(dim=(2, 3))


def _randomize_bn(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.num_features, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.num_features, generator=g) * 0.1)


def test_grouped_conv_dense_rewrite_parity():
    """The block-diagonal dense rewrite (VITX_DENSE_GROUPS, the TPU
    dispatch default) must reproduce grouped-conv outputs and kernel/input
    grads exactly, and both must match torch's groups= semantics."""
    import os

    from vit_torch_tpu.models.layers import GroupedConv

    G, cin, cout = 4, 16, 24
    rng = np.random.default_rng(7)
    x = rng.normal(0, 1, (2, 9, 9, cin)).astype(np.float32)
    mod = GroupedConv(cout, (3, 3), strides=2, padding=1, groups=G,
                      dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))

    def run():
        return mod.apply(params, jnp.asarray(x))

    def loss(p):
        return (mod.apply(p, jnp.asarray(x)) ** 2).sum()

    os.environ["VITX_DENSE_GROUPS"] = "0"
    try:
        ref, gref = run(), jax.grad(loss)(params)
    finally:
        os.environ.pop("VITX_DENSE_GROUPS")
    dense, gdense = run(), jax.grad(loss)(params)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gdense["params"]["kernel"]),
        np.asarray(gref["params"]["kernel"]), rtol=1e-5, atol=1e-5)

    # partial regroup (m=2 of G=4) must also be exact
    os.environ["VITX_DENSE_GROUPS"] = "2"
    try:
        part, gpart = run(), jax.grad(loss)(params)
    finally:
        os.environ.pop("VITX_DENSE_GROUPS")
    np.testing.assert_allclose(np.asarray(part), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gpart["params"]["kernel"]),
        np.asarray(gref["params"]["kernel"]), rtol=1e-5, atol=1e-5)

    # torch golden: same weights, NCHW
    w = np.asarray(params["params"]["kernel"])          # (3,3,cin/G,cout)
    tconv = nn.Conv2d(cin, cout, 3, stride=2, padding=1, groups=G,
                      bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        theirs = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(dense),
                               theirs.transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-5)


def test_resnet_import_logits_parity():
    torch.manual_seed(0)
    tm = _TResNet().eval()
    _randomize_bn(tm)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    zm = VisionModelZoo.get_model("resnet_test", classifier=None,
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    imported = import_backbone(
        "resnet", sd, variables["params"]["backbone"],
        {"batch_stats": variables["batch_stats"]["backbone"]})

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ours = zm.model.apply(
        {"params": {"backbone": imported["params"]},
         "batch_stats": {"backbone": imported["batch_stats"]}},
        jnp.asarray(x), True)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5, rtol=1e-3)
