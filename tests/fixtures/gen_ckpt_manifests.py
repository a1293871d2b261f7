"""Generate key/shape manifests of the published torch checkpoint layouts.

DERIVATION CAVEAT: no environment egress → these manifests are derived
from the reference's model-constructor code (the same code that builds the
module whose ``state_dict`` the published ``.pth`` files were saved from),
NOT from hash-verified downloads of those files.  Drift between a released
file and the released model code would go undetected here; if egress ever
becomes available, add an opt-in test diffing each manifest against the
downloaded checkpoint's actual key/shape set.

The importer parity suites (`test_checkpoint.py`, `test_ckpt_fixtures.py`)
exercise the five torch key layouts against locally-built torch
mini-models.  These manifests pin the importers to the layouts of the
actual published checkpoints the reference downloads at run time, derived
from the reference's own model definitions (the published model code):

- dino_vitb8 / dino_vits16 — facebookresearch/dino hub backbones (plain
  state_dict, no wrapper, no head) — reference ``models/vision_all.py:156``
- cait_s24_224 — FB deit-release ``S24_224.pth``: ``{'model': sd}`` with a
  ``module.`` prefix on every key — reference ``models/cait.py:368-387``
  (loader semantics at ``models/cait.py:265-273``)
- swin_base/large_patch4_window12_384_22k — MSFT releases:
  ``{'model': sd}`` incl. ``relative_position_index`` / ``attn_mask``
  buffers and a 21841-class head, loaded ``strict=False`` — reference
  ``models/swin.py:823-843``; module structure ``models/swin.py:65-558``
- deit_base_distilled_patch16_224 — FB deit release: ``{'model': sd}``
  with dist_token + head_dist — reference ``models/deit.py:170-181``
- resnext50_32x4d — torchvision ImageNet weights (plain state_dict with
  ``num_batches_tracked`` buffers) — reference ``models/vision_all.py:334``
- xcit_small_24_p16 — facebookresearch/xcit release: ``{'model': sd}``
  with SyncBN buffers — reference ``models/xcit.py:68-107,111-143,449-454``

Every shape below is computed from the architecture hyper-parameters in
the reference's constructors — no checkpoint download involved.  Run this
script to (re)write ``ckpt_manifests.json``; ``test_ckpt_manifests.py``
asserts the importers consume these layouts exactly.
"""

from __future__ import annotations

import json
import os

F32, I64 = "float32", "int64"


def _lin(d, prefix, out_f, in_f, bias=True):
    d[f"{prefix}.weight"] = ([out_f, in_f], F32)
    if bias:
        d[f"{prefix}.bias"] = ([out_f], F32)


def _ln(d, prefix, dim):
    d[f"{prefix}.weight"] = ([dim], F32)
    d[f"{prefix}.bias"] = ([dim], F32)


def _conv(d, prefix, out_c, in_c, k, bias=True):
    d[f"{prefix}.weight"] = ([out_c, in_c, k, k], F32)
    if bias:
        d[f"{prefix}.bias"] = ([out_c], F32)


def _bn(d, prefix, c):
    d[f"{prefix}.weight"] = ([c], F32)
    d[f"{prefix}.bias"] = ([c], F32)
    d[f"{prefix}.running_mean"] = ([c], F32)
    d[f"{prefix}.running_var"] = ([c], F32)
    d[f"{prefix}.num_batches_tracked"] = ([], I64)


# --------------------------------------------------------------- DINO ViT
def dino_vit(dim, depth, heads, patch, img=224):
    d = {}
    n = (img // patch) ** 2
    d["cls_token"] = ([1, 1, dim], F32)
    d["pos_embed"] = ([1, n + 1, dim], F32)
    _conv(d, "patch_embed.proj", dim, 3, patch)
    for i in range(depth):
        b = f"blocks.{i}"
        _ln(d, f"{b}.norm1", dim)
        _lin(d, f"{b}.attn.qkv", 3 * dim, dim)
        _lin(d, f"{b}.attn.proj", dim, dim)
        _ln(d, f"{b}.norm2", dim)
        _lin(d, f"{b}.mlp.fc1", 4 * dim, dim)
        _lin(d, f"{b}.mlp.fc2", dim, 4 * dim)
    _ln(d, "norm", dim)
    return d


# ------------------------------------------------------------------ DeiT
def deit_distilled(dim, depth, patch=16, img=224, n_cls=1000):
    d = dino_vit(dim, depth, None, patch, img)
    n = (img // patch) ** 2
    d["dist_token"] = ([1, 1, dim], F32)
    d["pos_embed"] = ([1, n + 2, dim], F32)
    _lin(d, "head", n_cls, dim)
    _lin(d, "head_dist", n_cls, dim)
    return d


# ------------------------------------------------------------------ CaiT
def cait(dim, depth, heads, depth_token_only=2, patch=16, img=224,
         n_cls=1000):
    d = {}
    n = (img // patch) ** 2
    d["cls_token"] = ([1, 1, dim], F32)
    d["pos_embed"] = ([1, n, dim], F32)              # no CLS slot in CaiT
    _conv(d, "patch_embed.proj", dim, 3, patch)
    for i in range(depth):
        b = f"blocks.{i}"
        d[f"{b}.gamma_1"] = ([dim], F32)
        d[f"{b}.gamma_2"] = ([dim], F32)
        _ln(d, f"{b}.norm1", dim)
        _lin(d, f"{b}.attn.qkv", 3 * dim, dim)
        _lin(d, f"{b}.attn.proj", dim, dim)
        _lin(d, f"{b}.attn.proj_l", heads, heads)    # talking heads
        _lin(d, f"{b}.attn.proj_w", heads, heads)
        _ln(d, f"{b}.norm2", dim)
        _lin(d, f"{b}.mlp.fc1", 4 * dim, dim)
        _lin(d, f"{b}.mlp.fc2", dim, 4 * dim)
    for i in range(depth_token_only):
        b = f"blocks_token_only.{i}"
        d[f"{b}.gamma_1"] = ([dim], F32)
        d[f"{b}.gamma_2"] = ([dim], F32)
        _ln(d, f"{b}.norm1", dim)
        for name in ("q", "k", "v", "proj"):
            _lin(d, f"{b}.attn.{name}", dim, dim)
        _ln(d, f"{b}.norm2", dim)
        _lin(d, f"{b}.mlp.fc1", 4 * dim, dim)
        _lin(d, f"{b}.mlp.fc2", dim, 4 * dim)
    _ln(d, "norm", dim)
    _lin(d, "head", n_cls, dim)
    return d


# ------------------------------------------------------------------ Swin
def swin(embed, depths, heads, window, patch=4, img=384, n_cls=21841):
    d = {}
    _conv(d, "patch_embed.proj", embed, 3, patch)
    _ln(d, "patch_embed.norm", embed)
    res = img // patch
    n = window * window
    for li, (depth, h) in enumerate(zip(depths, heads)):
        dim = embed * 2 ** li
        for bi in range(depth):
            b = f"layers.{li}.blocks.{bi}"
            _ln(d, f"{b}.norm1", dim)
            d[f"{b}.attn.relative_position_bias_table"] = (
                [(2 * window - 1) ** 2, h], F32)
            d[f"{b}.attn.relative_position_index"] = ([n, n], I64)
            _lin(d, f"{b}.attn.qkv", 3 * dim, dim)
            _lin(d, f"{b}.attn.proj", dim, dim)
            _ln(d, f"{b}.norm2", dim)
            _lin(d, f"{b}.mlp.fc1", 4 * dim, dim)
            _lin(d, f"{b}.mlp.fc2", dim, 4 * dim)
            # attn_mask buffer: registered only for shifted blocks, and
            # shift is disabled when the stage resolution <= window
            # (models/swin.py:176-180,231)
            if bi % 2 == 1 and res > window:
                nw = (res // window) ** 2
                d[f"{b}.attn_mask"] = ([nw, n, n], F32)
        if li < len(depths) - 1:
            _lin(d, f"layers.{li}.downsample.reduction", 2 * dim, 4 * dim,
                 bias=False)
            _ln(d, f"layers.{li}.downsample.norm", 4 * dim)
            res //= 2
    final = embed * 2 ** (len(depths) - 1)
    _ln(d, "norm", final)
    _lin(d, "head", n_cls, final)
    return d


# --------------------------------------------------------------- ResNeXt
def resnext(layers, groups=32, width_per_group=4, n_cls=1000):
    d = {}
    _conv(d, "conv1", 64, 3, 7, bias=False)
    _bn(d, "bn1", 64)
    inplanes = 64
    for li, blocks in enumerate(layers, start=1):
        planes = 64 * 2 ** (li - 1)
        width = planes * width_per_group * groups // 64
        out = planes * 4
        for bi in range(blocks):
            b = f"layer{li}.{bi}"
            _conv(d, f"{b}.conv1", width, inplanes, 1, bias=False)
            _bn(d, f"{b}.bn1", width)
            d[f"{b}.conv2.weight"] = ([width, width // groups, 3, 3], F32)
            _bn(d, f"{b}.bn2", width)
            _conv(d, f"{b}.conv3", out, width, 1, bias=False)
            _bn(d, f"{b}.bn3", out)
            if bi == 0:
                _conv(d, f"{b}.downsample.0", out, inplanes, 1, bias=False)
                _bn(d, f"{b}.downsample.1", out)
            inplanes = out
    _lin(d, "fc", n_cls, 2048)
    return d


# ------------------------------------------------------------------ XCiT
def xcit(dim, depth, heads, cls_blocks=2, patch=16, n_cls=1000):
    d = {}
    d["cls_token"] = ([1, 1, dim], F32)
    # ConvPatchEmbed p16: 4 conv3x3(stride2)+SyncBN blocks at Sequential
    # indices 0/2/4/6 (GELU between) — models/xcit.py:82-90
    chans = [3, dim // 8, dim // 4, dim // 2, dim]
    for i in range(4):
        seq = 2 * i
        d[f"patch_embed.proj.{seq}.0.weight"] = (
            [chans[i + 1], chans[i], 3, 3], F32)
        _bn(d, f"patch_embed.proj.{seq}.1", chans[i + 1])
    # PositionalEncodingFourier: 1x1 conv (2*hidden_dim=64 → dim)
    d["pos_embeder.token_projection.weight"] = ([dim, 64, 1, 1], F32)
    d["pos_embeder.token_projection.bias"] = ([dim], F32)
    for i in range(depth):
        b = f"blocks.{i}"
        for g in ("gamma1", "gamma2", "gamma3"):
            d[f"{b}.{g}"] = ([dim], F32)
        for nrm in ("norm1", "norm2", "norm3"):
            _ln(d, f"{b}.{nrm}", dim)
        d[f"{b}.attn.temperature"] = ([heads, 1, 1], F32)
        _lin(d, f"{b}.attn.qkv", 3 * dim, dim)
        _lin(d, f"{b}.attn.proj", dim, dim)
        # LPI: two depthwise 3x3 convs (groups=dim) around a SyncBN
        for cv in ("conv1", "conv2"):
            d[f"{b}.local_mp.{cv}.weight"] = ([dim, 1, 3, 3], F32)
            d[f"{b}.local_mp.{cv}.bias"] = ([dim], F32)
        _bn(d, f"{b}.local_mp.bn", dim)
        _lin(d, f"{b}.mlp.fc1", 4 * dim, dim)
        _lin(d, f"{b}.mlp.fc2", dim, 4 * dim)
    for i in range(cls_blocks):
        b = f"cls_attn_blocks.{i}"
        d[f"{b}.gamma1"] = ([dim], F32)
        d[f"{b}.gamma2"] = ([dim], F32)
        _ln(d, f"{b}.norm1", dim)
        _lin(d, f"{b}.attn.qkv", 3 * dim, dim)
        _lin(d, f"{b}.attn.proj", dim, dim)
        _ln(d, f"{b}.norm2", dim)
        _lin(d, f"{b}.mlp.fc1", 4 * dim, dim)
        _lin(d, f"{b}.mlp.fc2", dim, 4 * dim)
    _ln(d, "norm", dim)
    _lin(d, "head", n_cls, dim)
    return d


MANIFESTS = {
    "dino_vitb8": {
        "wrapper": None, "module_prefix": False, "family": "dino",
        "arch": "dino_vitb8", "image_size": 224,
        "keys": dino_vit(768, 12, 12, 8),
    },
    "dino_vits16": {
        "wrapper": None, "module_prefix": False, "family": "dino",
        "arch": "dino_vits16", "image_size": 224,
        "keys": dino_vit(384, 12, 6, 16),
    },
    "cait_s24_224": {
        "wrapper": "model", "module_prefix": True, "family": "cait",
        "arch": "cait_s24_224", "image_size": 224,
        "keys": cait(384, 24, 8),
    },
    "swin_base_patch4_window12_384_22k": {
        "wrapper": "model", "module_prefix": False, "family": "swin",
        "arch": "swin_base_patch4_window12_384", "image_size": 384,
        "keys": swin(128, (2, 2, 18, 2), (4, 8, 16, 32), 12),
    },
    "swin_large_patch4_window12_384_22k": {
        "wrapper": "model", "module_prefix": False, "family": "swin",
        "arch": "swin_large_patch4_window12_384", "image_size": 384,
        "keys": swin(192, (2, 2, 18, 2), (6, 12, 24, 48), 12),
    },
    "deit_base_distilled_patch16_224": {
        "wrapper": "model", "module_prefix": False, "family": "deit",
        "arch": "deit_base_distilled_patch16_224", "image_size": 224,
        "keys": deit_distilled(768, 12),
    },
    "resnext50_32x4d": {
        "wrapper": None, "module_prefix": False, "family": "resnet",
        "arch": "resnext50_32x4d", "image_size": 224,
        "keys": resnext((3, 4, 6, 3)),
    },
    "xcit_small_24_p16": {
        "wrapper": "model", "module_prefix": False, "family": "xcit",
        "arch": "xcit_small_24_p16", "image_size": 224,
        "keys": xcit(384, 24, 8),
    },
}


def main():
    fp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "ckpt_manifests.json")
    with open(fp, "w") as f:
        json.dump(MANIFESTS, f, indent=1, sort_keys=True)
    total = sum(len(m["keys"]) for m in MANIFESTS.values())
    print(f"wrote {fp}: {len(MANIFESTS)} layouts, {total} keys")


if __name__ == "__main__":
    main()
