"""Importer tests for the CNN-containing families (ResNet, XCiT).

Two layers of checking:
1. golden conv/BN semantics vs torch (the transpose + running-stats mapping);
2. full-tree roundtrip: construct a torch-layout state_dict by the inverse
   mapping from our initialized tree, import it, and require exact equality
   (validates every key path in the importer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
from flax import linen as fnn

from vit_torch_tpu.checkpoint.torch_import import import_backbone
from vit_torch_tpu.models import VisionModelZoo


def test_conv_bn_semantics_match_torch():
    """flax Conv+BatchNorm with imported torch weights == torch eval output."""
    torch.manual_seed(0)
    tconv = nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    tbn = nn.BatchNorm2d(8)
    tbn.running_mean.normal_(); tbn.running_var.uniform_(0.5, 2.0)
    tconv.eval(); tbn.eval()

    class FConvBN(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = fnn.Conv(8, (3, 3), strides=2, padding=1, use_bias=False,
                         name="conv")(x)
            return fnn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                 momentum=0.9, name="bn")(x)

    x = np.random.default_rng(0).normal(0, 1, (2, 16, 16, 3)).astype(np.float32)
    params = {"conv": {"kernel": tconv.weight.detach().numpy().transpose(2, 3, 1, 0)},
              "bn": {"scale": tbn.weight.detach().numpy(),
                     "bias": tbn.bias.detach().numpy()}}
    stats = {"bn": {"mean": tbn.running_mean.numpy(),
                    "var": tbn.running_var.numpy()}}
    ours = FConvBN().apply({"params": params, "batch_stats": stats},
                           jnp.asarray(x))
    with torch.no_grad():
        theirs = tbn(tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def _invert_linear(node):
    out = {f"weight": np.asarray(node["kernel"]).T}
    if "bias" in node:
        out["bias"] = np.asarray(node["bias"])
    return out


def _invert_conv(node):
    return {"weight": np.asarray(node["kernel"]).transpose(3, 2, 0, 1)}


def _invert_norm(node):
    return {"weight": np.asarray(node["scale"]), "bias": np.asarray(node["bias"])}


def _invert_bn(pnode, snode):
    return {**_invert_norm(pnode),
            "running_mean": np.asarray(snode["mean"]),
            "running_var": np.asarray(snode["var"])}


def test_resnet_import_roundtrip():
    zm = VisionModelZoo.get_model("resnet_test", classifier=None,
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]

    sd = {}
    sd.update({f"conv1.{k}": v for k, v in _invert_conv(p["conv1"]).items()})
    sd.update({f"bn1.{k}": v for k, v in _invert_bn(p["bn1"], s["bn1"]).items()})
    for li in (1, 2):
        name = f"layer{li}_0"
        for j in (1, 2, 3):
            sd.update({f"layer{li}.0.conv{j}.{k}": v
                       for k, v in _invert_conv(p[name][f"conv{j}"]).items()})
            sd.update({f"layer{li}.0.bn{j}.{k}": v for k, v in
                       _invert_bn(p[name][f"bn{j}"], s[name][f"bn{j}"]).items()})
        sd.update({f"layer{li}.0.downsample.0.{k}": v for k, v in
                   _invert_conv(p[name]["downsample_conv"]).items()})
        sd.update({f"layer{li}.0.downsample.1.{k}": v for k, v in
                   _invert_bn(p[name]["downsample_bn"],
                              s[name]["downsample_bn"]).items()})

    imported = import_backbone("resnet", sd, p, {"batch_stats": s})
    for tree, ref in ((imported["params"], p), (imported["batch_stats"], s)):
        got = jax.tree_util.tree_flatten_with_path(tree)[0]
        want = dict(jax.tree_util.tree_flatten_with_path(ref)[0])
        assert len(got) == len(want)
        for path, leaf in got:
            np.testing.assert_allclose(np.asarray(leaf),
                                       np.asarray(want[path]), atol=1e-7,
                                       err_msg=jax.tree_util.keystr(path))


def test_xcit_import_roundtrip():
    zm = VisionModelZoo.get_model("xcit_test", classifier=None,
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    p = variables["params"]["backbone"]
    s = variables["batch_stats"]["backbone"]

    sd = {"cls_token": np.asarray(p["cls_token"])}
    sd["pos_embeder.token_projection.weight"] = \
        np.asarray(p["pos_proj_kernel"]).T[:, :, None, None]
    sd["pos_embeder.token_projection.bias"] = np.asarray(p["pos_proj_bias"])
    # conv patch embed (patch 8 -> 3 conv stages at seq 0, 2, 4)
    for i in range(3):
        sd.update({f"patch_embed.proj.{2 * i}.0.{k}": v for k, v in
                   _invert_conv(p["patch_embed"][f"conv{i}"]).items()})
        sd.update({f"patch_embed.proj.{2 * i}.1.{k}": v for k, v in
                   _invert_bn(p["patch_embed"][f"bn{i}"],
                              s["patch_embed"][f"bn{i}"]).items()})
    for bi in range(2):
        b = p[f"blocks_{bi}"]
        bs = s[f"blocks_{bi}"]
        for g in ("gamma1", "gamma2", "gamma3"):
            sd[f"blocks.{bi}.{g}"] = np.asarray(b[g])
        for nm in ("norm1", "norm2", "norm3"):
            sd.update({f"blocks.{bi}.{nm}.{k}": v
                       for k, v in _invert_norm(b[nm]).items()})
        sd.update({f"blocks.{bi}.attn.qkv.{k}": v
                   for k, v in _invert_linear(b["attn"]["qkv"]).items()})
        sd.update({f"blocks.{bi}.attn.proj.{k}": v
                   for k, v in _invert_linear(b["attn"]["proj"]).items()})
        sd[f"blocks.{bi}.attn.temperature"] = np.asarray(b["attn"]["temperature"])
        for fc in ("fc1", "fc2"):
            sd.update({f"blocks.{bi}.mlp.{fc}.{k}": v
                       for k, v in _invert_linear(b["mlp"][fc]).items()})
        for cv in ("conv1", "conv2"):
            sd.update({f"blocks.{bi}.local_mp.{cv}.{k}": v for k, v in
                       _invert_conv(b["local_mp"][cv]).items()})
            sd[f"blocks.{bi}.local_mp.{cv}.bias"] = \
                np.asarray(b["local_mp"][cv]["bias"])
        sd.update({f"blocks.{bi}.local_mp.bn.{k}": v for k, v in
                   _invert_bn(b["local_mp"]["bn"],
                              bs["local_mp"]["bn"]).items()})
    for bi in range(2):
        b = p[f"cls_attn_blocks_{bi}"]
        for g in ("gamma1", "gamma2"):
            sd[f"cls_attn_blocks.{bi}.{g}"] = np.asarray(b[g])
        for nm in ("norm1", "norm2"):
            sd.update({f"cls_attn_blocks.{bi}.{nm}.{k}": v
                       for k, v in _invert_norm(b[nm]).items()})
        sd.update({f"cls_attn_blocks.{bi}.attn.qkv.{k}": v
                   for k, v in _invert_linear(b["attn"]["qkv"]).items()})
        sd.update({f"cls_attn_blocks.{bi}.attn.proj.{k}": v
                   for k, v in _invert_linear(b["attn"]["proj"]).items()})
        for fc in ("fc1", "fc2"):
            sd.update({f"cls_attn_blocks.{bi}.mlp.{fc}.{k}": v
                       for k, v in _invert_linear(b["mlp"][fc]).items()})
    sd.update({f"norm.{k}": v for k, v in _invert_norm(p["norm"]).items()})

    imported = import_backbone("xcit", sd, p, {"batch_stats": s})
    got = jax.tree_util.tree_flatten_with_path(imported["params"])[0]
    want = dict(jax.tree_util.tree_flatten_with_path(p)[0])
    assert len(got) == len(want)
    for path, leaf in got:
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(want[path]),
                                   atol=1e-7,
                                   err_msg=jax.tree_util.keystr(path))
