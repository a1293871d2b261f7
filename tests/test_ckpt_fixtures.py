"""Importer tests against *real-layout* checkpoint fixtures.

The mini-model parity tests validate the math; these validate the importer
against the wrapper/extra-key quirks of the actually published state_dicts
(no egress, so the layouts are replicated synthetically at test-config size):

- DINO full checkpoints: ``{'teacher': …, 'student': …}`` with
  ``module.backbone.*`` + ``module.head.*`` keys, fp16 tensors
  (reference loads these via torch.hub, ``models/vision_all.py:156``);
- MSFT Swin releases: ``{'model': sd}`` wrapper with ``attn_mask`` /
  ``relative_position_index`` buffers and a classification head
  (reference ``models/swin.py:831-840`` ``strict=False`` +
  ``checkpoint['model']``, fuzzy URL at ``object_detr/models/swin.py:838-855``);
- timm/FB CaiT: ``module.`` prefix (reference ``models/cait.py:269-273``);
- DeiT distilled: ``dist_token`` + dual ``head``/``head_dist``;
- torchvision ResNeXt/WRN: plain layout incl. ``fc.*`` keys.

Each fixture goes through the full ``torch.save`` → ``load_torch_state_dict``
→ ``import_backbone`` path and must round-trip the backbone exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vit_torch_tpu.checkpoint.torch_import import (
    import_backbone, load_torch_state_dict)
from vit_torch_tpu.models import VisionModelZoo


# ---------------------------------------------------------------- inverters

def _t(x, dtype=torch.float32):
    return torch.tensor(np.asarray(x, np.float32)).to(dtype)


def _inv_linear(sd, prefix, node, dtype=torch.float32):
    sd[f"{prefix}.weight"] = _t(np.asarray(node["kernel"]).T, dtype)
    if "bias" in node:
        sd[f"{prefix}.bias"] = _t(node["bias"], dtype)


def _inv_norm(sd, prefix, node, dtype=torch.float32):
    sd[f"{prefix}.weight"] = _t(node["scale"], dtype)
    sd[f"{prefix}.bias"] = _t(node["bias"], dtype)


def _inv_patch_embed(sd, node_kernel, node_bias, patch, chans,
                     dtype=torch.float32):
    k = np.asarray(node_kernel)
    D = k.shape[1]
    w = k.reshape(patch, patch, chans, D).transpose(3, 2, 0, 1)
    sd["patch_embed.proj.weight"] = _t(w, dtype)
    sd["patch_embed.proj.bias"] = _t(node_bias, dtype)


def _assert_roundtrip(imported, target, label):
    got = jax.tree_util.tree_flatten_with_path(imported)[0]
    want = dict(jax.tree_util.tree_flatten_with_path(target)[0])
    assert len(got) == len(want), label
    for path, leaf in got:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(want[path], np.float32),
            atol=2e-3, err_msg=f"{label}: {jax.tree_util.keystr(path)}")


# ------------------------------------------------------------------- fixtures

def test_dino_full_checkpoint_layout(tmp_path):
    """teacher/student wrapper, module.backbone. prefix, head keys, fp16."""
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=None,
                                  image_size=32, dtype=jnp.float32)
    p = zm.init(jax.random.PRNGKey(0), image_size=32)["params"]["backbone"]

    sd = {}
    _inv_patch_embed(sd, p["patch_embed"]["kernel"],
                     p["patch_embed"]["bias"], 8, 3, torch.float16)
    sd["cls_token"] = _t(p["cls_token"], torch.float16)
    sd["pos_embed"] = _t(p["pos_embed"], torch.float16)
    for i in range(2):
        b = p[f"blocks_{i}"]
        _inv_norm(sd, f"blocks.{i}.norm1", b["norm1"], torch.float16)
        _inv_norm(sd, f"blocks.{i}.norm2", b["norm2"], torch.float16)
        _inv_linear(sd, f"blocks.{i}.attn.qkv", b["attn"]["qkv"],
                    torch.float16)
        _inv_linear(sd, f"blocks.{i}.attn.proj", b["attn"]["proj"],
                    torch.float16)
        _inv_linear(sd, f"blocks.{i}.mlp.fc1", b["mlp"]["fc1"], torch.float16)
        _inv_linear(sd, f"blocks.{i}.mlp.fc2", b["mlp"]["fc2"], torch.float16)
    _inv_norm(sd, "norm", p["norm"], torch.float16)

    # the published full-checkpoint layout
    teacher = {f"module.backbone.{k}": v for k, v in sd.items()}
    teacher["module.head.mlp.0.weight"] = torch.zeros(8, 64,
                                                      dtype=torch.float16)
    teacher["module.head.last_layer.weight_g"] = torch.zeros(
        8, 1, dtype=torch.float16)
    ckpt = {"teacher": teacher, "student": dict(teacher), "epoch": 99,
            "args": "namespace-placeholder"}
    fp = str(tmp_path / "dino_full.pth")
    torch.save(ckpt, fp)

    loaded = load_torch_state_dict(fp)
    assert "patch_embed.proj.weight" in loaded
    assert not any(k.startswith("head") for k in loaded)
    imported = import_backbone("dino", loaded, p)["params"]
    _assert_roundtrip(imported, p, "dino")


def test_msft_swin_release_layout(tmp_path):
    """{'model': sd} wrapper + attn_mask / relative_position_index buffers +
    head keys, strict=False semantics (extras ignored)."""
    from vit_torch_tpu.models.swin import SWIN_CONFIGS
    zm = VisionModelZoo.get_model("swin_test", classifier=None,
                                  image_size=32, dtype=jnp.float32)
    p = zm.init(jax.random.PRNGKey(0), image_size=32)["params"]["backbone"]

    sd = {}
    _inv_patch_embed(sd, p["patch_embed_kernel"], p["patch_embed_bias"],
                     SWIN_CONFIGS["swin_test"].patch_size, 3)
    if "patch_embed_norm" in p:
        _inv_norm(sd, "patch_embed.norm", p["patch_embed_norm"])
    for li in range(2):
        for bi in range(1):
            b = p[f"layers_{li}_blocks_{bi}"]
            pre = f"layers.{li}.blocks.{bi}"
            _inv_norm(sd, f"{pre}.norm1", b["norm1"])
            _inv_norm(sd, f"{pre}.norm2", b["norm2"])
            _inv_linear(sd, f"{pre}.attn.qkv", b["attn"]["qkv"])
            _inv_linear(sd, f"{pre}.attn.proj", b["attn"]["proj"])
            sd[f"{pre}.attn.relative_position_bias_table"] = _t(
                b["attn"]["relative_position_bias_table"])
            _inv_linear(sd, f"{pre}.mlp.fc1", b["mlp"]["fc1"])
            _inv_linear(sd, f"{pre}.mlp.fc2", b["mlp"]["fc2"])
            # buffers present in the release checkpoints, absent in our tree
            n = b["attn"]["relative_position_bias_table"].shape[0]
            w2 = int(round((np.sqrt(n) + 1) / 2)) ** 2
            sd[f"{pre}.attn.relative_position_index"] = torch.zeros(
                w2, w2, dtype=torch.int64)
            sd[f"{pre}.attn_mask"] = torch.zeros(1, w2, w2)
        if f"layers_{li}_downsample" in p:
            d = p[f"layers_{li}_downsample"]
            _inv_linear(sd, f"layers.{li}.downsample.reduction",
                        d["reduction"])
            _inv_norm(sd, f"layers.{li}.downsample.norm", d["norm"])
    _inv_norm(sd, "norm", p["norm"])
    sd["head.weight"] = torch.zeros(1000, 32)
    sd["head.bias"] = torch.zeros(1000)

    fp = str(tmp_path / "swin_release.pth")
    torch.save({"model": sd, "config": "yacs-placeholder",
                "epoch": 300}, fp)

    loaded = load_torch_state_dict(fp)
    assert "layers.0.blocks.0.attn_mask" in loaded   # buffer survives load
    imported = import_backbone("swin", loaded, p)["params"]
    _assert_roundtrip(imported, p, "swin")


def test_timm_cait_module_prefix_layout(tmp_path):
    """FB CaiT checkpoints: flat dict with a module. prefix on every key."""
    zm = VisionModelZoo.get_model("cait_test", classifier=None,
                                  image_size=32, dtype=jnp.float32)
    p = zm.init(jax.random.PRNGKey(0), image_size=32)["params"]["backbone"]

    sd = {}
    _inv_patch_embed(sd, p["patch_embed"]["kernel"], p["patch_embed"]["bias"],
                     8, 3)
    sd["cls_token"] = _t(p["cls_token"])
    sd["pos_embed"] = _t(p["pos_embed"])
    for i in range(2):
        b = p[f"blocks_{i}"]
        pre = f"blocks.{i}"
        sd[f"{pre}.gamma_1"] = _t(b["gamma_1"])
        sd[f"{pre}.gamma_2"] = _t(b["gamma_2"])
        _inv_norm(sd, f"{pre}.norm1", b["norm1"])
        _inv_norm(sd, f"{pre}.norm2", b["norm2"])
        _inv_linear(sd, f"{pre}.attn.qkv", b["attn"]["qkv"])
        _inv_linear(sd, f"{pre}.attn.proj", b["attn"]["proj"])
        sd[f"{pre}.attn.proj_l.weight"] = _t(
            np.asarray(b["attn"]["proj_l_kernel"]).T)
        sd[f"{pre}.attn.proj_l.bias"] = _t(b["attn"]["proj_l_bias"])
        sd[f"{pre}.attn.proj_w.weight"] = _t(
            np.asarray(b["attn"]["proj_w_kernel"]).T)
        sd[f"{pre}.attn.proj_w.bias"] = _t(b["attn"]["proj_w_bias"])
        _inv_linear(sd, f"{pre}.mlp.fc1", b["mlp"]["fc1"])
        _inv_linear(sd, f"{pre}.mlp.fc2", b["mlp"]["fc2"])
    for i in range(2):
        b = p[f"blocks_token_only_{i}"]
        pre = f"blocks_token_only.{i}"
        sd[f"{pre}.gamma_1"] = _t(b["gamma_1"])
        sd[f"{pre}.gamma_2"] = _t(b["gamma_2"])
        _inv_norm(sd, f"{pre}.norm1", b["norm1"])
        _inv_norm(sd, f"{pre}.norm2", b["norm2"])
        for name in ("q", "k", "v", "proj"):
            _inv_linear(sd, f"{pre}.attn.{name}", b["attn"][name])
        _inv_linear(sd, f"{pre}.mlp.fc1", b["mlp"]["fc1"])
        _inv_linear(sd, f"{pre}.mlp.fc2", b["mlp"]["fc2"])
    _inv_norm(sd, "norm", p["norm"])
    sd["head.weight"] = torch.zeros(1000, 32)
    sd["head.bias"] = torch.zeros(1000)

    fp = str(tmp_path / "cait_fb.pth")
    torch.save({f"module.{k}": v for k, v in sd.items()}, fp)

    loaded = load_torch_state_dict(fp)
    assert "patch_embed.proj.weight" in loaded        # prefix stripped
    imported = import_backbone("cait", loaded, p)["params"]
    _assert_roundtrip(imported, p, "cait")


def test_deit_distilled_layout(tmp_path):
    """DeiT distilled: dist_token + head/head_dist keys."""
    zm = VisionModelZoo.get_model("deit_test_distilled", classifier=None,
                                  image_size=32, dtype=jnp.float32)
    p = zm.init(jax.random.PRNGKey(0), image_size=32)["params"]["backbone"]

    sd = {}
    _inv_patch_embed(sd, p["patch_embed"]["kernel"], p["patch_embed"]["bias"],
                     8, 3)
    sd["cls_token"] = _t(p["cls_token"])
    sd["dist_token"] = _t(p["dist_token"])
    sd["pos_embed"] = _t(p["pos_embed"])
    for i in range(2):
        b = p[f"blocks_{i}"]
        pre = f"blocks.{i}"
        _inv_norm(sd, f"{pre}.norm1", b["norm1"])
        _inv_norm(sd, f"{pre}.norm2", b["norm2"])
        _inv_linear(sd, f"{pre}.attn.qkv", b["attn"]["qkv"])
        _inv_linear(sd, f"{pre}.attn.proj", b["attn"]["proj"])
        _inv_linear(sd, f"{pre}.mlp.fc1", b["mlp"]["fc1"])
        _inv_linear(sd, f"{pre}.mlp.fc2", b["mlp"]["fc2"])
    _inv_norm(sd, "norm", p["norm"])
    sd["head.weight"] = torch.zeros(1000, 64)
    sd["head.bias"] = torch.zeros(1000)
    sd["head_dist.weight"] = torch.zeros(1000, 64)
    sd["head_dist.bias"] = torch.zeros(1000)

    fp = str(tmp_path / "deit.pth")
    torch.save({"model": sd}, fp)                     # FB DeiT wrapper

    loaded = load_torch_state_dict(fp)
    imported = import_backbone("deit", loaded, p)["params"]
    _assert_roundtrip(imported, p, "deit")


def test_torchvision_resnet_layout(tmp_path):
    """Plain torchvision layout including the fc head keys."""
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet
    cfg = RESNET_CONFIGS["resnet_test"]
    backbone = ResNet(cfg, dtype=jnp.float32, features_only=True)
    variables = backbone.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 64, 64, 3)), True)
    p, s = variables["params"], variables["batch_stats"]

    def inv_conv(node):
        return torch.tensor(
            np.asarray(node["kernel"], np.float32).transpose(3, 2, 0, 1))

    sd = {"conv1.weight": inv_conv(p["conv1"])}

    def inv_bn(prefix, pn, sn):
        sd[f"{prefix}.weight"] = _t(pn["scale"])
        sd[f"{prefix}.bias"] = _t(pn["bias"])
        sd[f"{prefix}.running_mean"] = _t(sn["mean"])
        sd[f"{prefix}.running_var"] = _t(sn["var"])
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(1000)

    inv_bn("bn1", p["bn1"], s["bn1"])
    for li in range(1, len(cfg.layers) + 1):
        name = f"layer{li}_0"
        for j in (1, 2, 3):
            sd[f"layer{li}.0.conv{j}.weight"] = inv_conv(p[name][f"conv{j}"])
            inv_bn(f"layer{li}.0.bn{j}", p[name][f"bn{j}"], s[name][f"bn{j}"])
        if "downsample_conv" in p[name]:
            sd[f"layer{li}.0.downsample.0.weight"] = inv_conv(
                p[name]["downsample_conv"])
            inv_bn(f"layer{li}.0.downsample.1", p[name]["downsample_bn"],
                   s[name]["downsample_bn"])
    sd["fc.weight"] = torch.zeros(1000, 256)
    sd["fc.bias"] = torch.zeros(1000)

    fp = str(tmp_path / "resnext.pth")
    torch.save(sd, fp)

    loaded = load_torch_state_dict(fp)
    imported = import_backbone("resnet", loaded, p, {"batch_stats": s})
    _assert_roundtrip(imported["params"], p, "resnet-params")
    _assert_roundtrip(imported["batch_stats"], s, "resnet-stats")
