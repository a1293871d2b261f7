"""Torch checkpoint → flax param-tree importer.

The reference loads pretrained weights from torch.hub / timm / GitHub
releases at run time (DINO: ``models/vision_all.py:156``; CaiT ``module.``
prefix strip: ``models/cait.py:269-273``; Swin ``checkpoint['model']`` +
strict=False: ``models/swin.py:831-840``).  TPU pods have no egress, so this
importer consumes a *local* torch ``state_dict`` file and remaps each
family's key layout onto our param tree.  This is the parity gate's
foundation (BASELINE.json: logits parity against the torch reference).

Layout conversions:
- torch ``nn.Linear.weight`` is ``(out, in)`` → flax kernel ``(in, out)`` (transpose)
- torch patch-embed conv ``(D, C, ph, pw)`` → our matmul kernel
  ``(ph*pw*C, D)`` via transpose to ``(ph, pw, C, D)`` then reshape —
  matching PatchEmbed's ``(..., p, p, C)`` flatten order
- ``norm.weight/bias`` → ``norm.scale/bias``
- position embeddings trained at 224² are bicubic-interpolated to the target
  grid (DINO's ``interpolate_pos_encoding`` semantics), CLS token kept as-is.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file to a flat {key: np.ndarray} dict.

    Handles the published-checkpoint wrapper variants: ``{'model': sd}``
    (MSFT Swin releases) / ``{'state_dict': sd}`` / ``{'teacher': sd}``
    (DINO full checkpoints) unwrap, ``module.`` prefix strip (DDP /
    timm-CaiT), and the DINO full-checkpoint ``backbone.`` prefix (keys are
    ``module.backbone.*`` + ``module.head.*`` inside ``teacher`` —
    reference loads the hub backbone, which is the ``backbone.`` subtree).
    """
    import torch
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # DINO *full* checkpoints pickle an argparse.Namespace alongside the
        # weights, which strict weights_only loading rejects.  Allowlist just
        # that type (still no arbitrary-code unpickling) and retry.
        import argparse
        with torch.serialization.safe_globals([argparse.Namespace]):
            sd = torch.load(path, map_location="cpu", weights_only=True)
    for wrapper in ("model", "state_dict", "teacher"):
        if wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
            break
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    if out and all(k.startswith(("backbone.", "head.", "head_dist."))
                   for k in out):
        out = {k[len("backbone."):]: v for k, v in out.items()
               if k.startswith("backbone.")}
    return out


def interpolate_pos_embed(pos: np.ndarray, target_tokens: int,
                          num_prefix: int = 1) -> np.ndarray:
    """Bicubic-resize the patch-grid part of a ``(1, P+prefix, D)`` position
    table to ``target_tokens`` patch positions (DINO semantics)."""
    n_patch = pos.shape[1] - num_prefix
    if n_patch == target_tokens:
        return pos
    prefix, grid = pos[:, :num_prefix], pos[:, num_prefix:]
    src = int(round(n_patch ** 0.5))
    dst = int(round(target_tokens ** 0.5))
    assert src * src == n_patch and dst * dst == target_tokens, \
        f"non-square pos-embed grids: {n_patch} -> {target_tokens}"
    D = pos.shape[2]
    grid = grid.reshape(1, src, src, D)
    grid = np.asarray(jax.image.resize(jnp.asarray(grid), (1, dst, dst, D),
                                       method="bicubic"))
    return np.concatenate([prefix, grid.reshape(1, dst * dst, D)], axis=1)


def _linear(sd, prefix):
    p = {"kernel": sd[f"{prefix}.weight"].T}
    if f"{prefix}.bias" in sd:
        p["bias"] = sd[f"{prefix}.bias"]
    return p


def _norm(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def import_vit(sd: Dict[str, np.ndarray], target_params: Dict[str, Any],
               ) -> Dict[str, Any]:
    """Map a DINO/timm ViT state_dict onto our VisionTransformer tree."""
    tgt = target_params
    out: Dict[str, Any] = {}

    # patch embed: conv (D, C, p, p) -> (p*p*C, D)
    w = sd["patch_embed.proj.weight"]
    D, C, ph, pw = w.shape
    kernel = w.transpose(2, 3, 1, 0).reshape(ph * pw * C, D)
    out["patch_embed"] = {"kernel": kernel,
                          "bias": sd["patch_embed.proj.bias"]}
    out["cls_token"] = sd["cls_token"]
    num_prefix = 1
    if "dist_token" in tgt:                      # DeiT distilled variants
        out["dist_token"] = sd["dist_token"]
        num_prefix = 2
    n_target = tgt["pos_embed"].shape[1] - num_prefix
    out["pos_embed"] = interpolate_pos_embed(sd["pos_embed"], n_target,
                                             num_prefix=num_prefix)

    depth = len([k for k in sd if re.match(r"blocks\.\d+\.norm1\.weight$", k)])
    for i in range(depth):
        b = f"blocks.{i}"
        out[f"blocks_{i}"] = {
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "attn": {"qkv": _linear(sd, f"{b}.attn.qkv"),
                     "proj": _linear(sd, f"{b}.attn.proj")},
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
        }
    out["norm"] = _norm(sd, "norm")
    return out


def import_swin(sd: Dict[str, np.ndarray], target_params: Dict[str, Any],
                ) -> Dict[str, Any]:
    """Map a Microsoft-Swin state_dict (``layers.{i}.blocks.{j}...`` layout,
    loaded via the reference's ``get_swin_model`` ``models/swin.py:823-889``)
    onto our SwinTransformer tree."""
    out: Dict[str, Any] = {}
    w = sd["patch_embed.proj.weight"]           # (D, C, p, p)
    D, C, ph, pw = w.shape
    out["patch_embed_kernel"] = w.transpose(2, 3, 1, 0).reshape(ph * pw * C, D)
    out["patch_embed_bias"] = sd["patch_embed.proj.bias"]
    if "patch_embed.norm.weight" in sd:
        out["patch_embed_norm"] = _norm(sd, "patch_embed.norm")
    li = 0
    while f"layers.{li}.blocks.0.norm1.weight" in sd:
        bi = 0
        while f"layers.{li}.blocks.{bi}.norm1.weight" in sd:
            b = f"layers.{li}.blocks.{bi}"
            out[f"layers_{li}_blocks_{bi}"] = {
                "norm1": _norm(sd, f"{b}.norm1"),
                "norm2": _norm(sd, f"{b}.norm2"),
                "attn": {
                    "qkv": _linear(sd, f"{b}.attn.qkv"),
                    "proj": _linear(sd, f"{b}.attn.proj"),
                    "relative_position_bias_table":
                        sd[f"{b}.attn.relative_position_bias_table"],
                },
                "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                        "fc2": _linear(sd, f"{b}.mlp.fc2")},
            }
            bi += 1
        if f"layers.{li}.downsample.reduction.weight" in sd:
            out[f"layers_{li}_downsample"] = {
                "reduction": {"kernel": sd[f"layers.{li}.downsample.reduction.weight"].T},
                "norm": _norm(sd, f"layers.{li}.downsample.norm"),
            }
        li += 1
    out["norm"] = _norm(sd, "norm")
    return out


def import_cait(sd: Dict[str, np.ndarray], target_params: Dict[str, Any],
                ) -> Dict[str, Any]:
    """Map a CaiT state_dict (FB checkpoints with ``module.`` prefix already
    stripped — reference ``models/cait.py:265-273``) onto our CaiT tree."""
    out: Dict[str, Any] = {}
    w = sd["patch_embed.proj.weight"]
    D, C, ph, pw = w.shape
    out["patch_embed"] = {"kernel": w.transpose(2, 3, 1, 0).reshape(ph * pw * C, D),
                          "bias": sd["patch_embed.proj.bias"]}
    out["cls_token"] = sd["cls_token"]
    out["pos_embed"] = interpolate_pos_embed(
        sd["pos_embed"], target_params["pos_embed"].shape[1], num_prefix=0)
    depth = len([k for k in sd if re.match(r"blocks\.\d+\.norm1\.weight$", k)])
    for i in range(depth):
        b = f"blocks.{i}"
        out[f"blocks_{i}"] = {
            "gamma_1": sd[f"{b}.gamma_1"],
            "gamma_2": sd[f"{b}.gamma_2"],
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "attn": {
                "qkv": _linear(sd, f"{b}.attn.qkv"),
                "proj": _linear(sd, f"{b}.attn.proj"),
                "proj_l_kernel": sd[f"{b}.attn.proj_l.weight"].T,
                "proj_l_bias": sd[f"{b}.attn.proj_l.bias"],
                "proj_w_kernel": sd[f"{b}.attn.proj_w.weight"].T,
                "proj_w_bias": sd[f"{b}.attn.proj_w.bias"],
            },
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
        }
    n_ca = len([k for k in sd
                if re.match(r"blocks_token_only\.\d+\.norm1\.weight$", k)])
    for i in range(n_ca):
        b = f"blocks_token_only.{i}"
        out[f"blocks_token_only_{i}"] = {
            "gamma_1": sd[f"{b}.gamma_1"],
            "gamma_2": sd[f"{b}.gamma_2"],
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "attn": {name: _linear(sd, f"{b}.attn.{name}")
                     for name in ("q", "k", "v", "proj")},
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
        }
    out["norm"] = _norm(sd, "norm")
    return out


def _conv(sd, key):
    """torch conv weight (O, I, kh, kw) → flax kernel (kh, kw, I, O)."""
    return {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0)}


def _bn(sd, prefix):
    """torch BatchNorm → (params, batch_stats) pair."""
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def import_resnet(sd: Dict[str, np.ndarray], target_params: Dict[str, Any],
                  ) -> Dict[str, Any]:
    """Map a torchvision ResNeXt/WRN state_dict onto our ResNet tree.
    Returns ``{"params": ..., "batch_stats": ...}`` (BN running stats)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(name, conv_key=None, bn_key=None):
        node_p, node_s = {}, {}
        if conv_key:
            node_p.update(_conv(sd, conv_key))
        if bn_key:
            p, s = _bn(sd, bn_key)
            node_p.update(p)
            node_s.update(s)
        return node_p, node_s

    params["conv1"], _ = put(None, conv_key="conv1")
    params["bn1"], stats["bn1"] = _bn(sd, "bn1")
    for li in range(1, 5):
        bi = 0
        while f"layer{li}.{bi}.conv1.weight" in sd:
            b = f"layer{li}.{bi}"
            name = f"layer{li}_{bi}"
            node_p, node_s = {}, {}
            for j in (1, 2, 3):
                node_p[f"conv{j}"] = _conv(sd, f"{b}.conv{j}")
                node_p[f"bn{j}"], node_s[f"bn{j}"] = _bn(sd, f"{b}.bn{j}")
            if f"{b}.downsample.0.weight" in sd:
                node_p["downsample_conv"] = _conv(sd, f"{b}.downsample.0")
                node_p["downsample_bn"], node_s["downsample_bn"] = _bn(
                    sd, f"{b}.downsample.1")
            params[name] = node_p
            stats[name] = node_s
            bi += 1
    return {"params": params, "batch_stats": stats}


def import_xcit(sd: Dict[str, np.ndarray], target_params: Dict[str, Any],
                ) -> Dict[str, Any]:
    """Map a facebookresearch/xcit state_dict onto our XCiT tree.
    Returns ``{"params": ..., "batch_stats": ...}``."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    # conv patch-embed: Sequential of conv3x3(=Conv+BN) at even indices
    pe_p, pe_s = {}, {}
    i = 0
    seq = 0
    while f"patch_embed.proj.{seq}.0.weight" in sd:
        pe_p[f"conv{i}"] = _conv(sd, f"patch_embed.proj.{seq}.0")
        pe_p[f"bn{i}"], pe_s[f"bn{i}"] = _bn(sd, f"patch_embed.proj.{seq}.1")
        i += 1
        seq += 2  # GELU between conv blocks
    params["patch_embed"] = pe_p
    stats["patch_embed"] = pe_s
    params["cls_token"] = sd["cls_token"]
    # Fourier pos-encoding projection: 1x1 conv (dim, 64, 1, 1)
    w = sd["pos_embeder.token_projection.weight"]
    params["pos_proj_kernel"] = w[:, :, 0, 0].T
    params["pos_proj_bias"] = sd["pos_embeder.token_projection.bias"]

    depth = len([k for k in sd if re.match(r"blocks\.\d+\.norm1\.weight$", k)])
    for bi in range(depth):
        b = f"blocks.{bi}"
        lp, ls = {}, {}
        lp["conv1"] = _conv(sd, f"{b}.local_mp.conv1")
        lp["conv1"]["bias"] = sd[f"{b}.local_mp.conv1.bias"]
        lp["conv2"] = _conv(sd, f"{b}.local_mp.conv2")
        lp["conv2"]["bias"] = sd[f"{b}.local_mp.conv2.bias"]
        lp["bn"], ls["bn"] = _bn(sd, f"{b}.local_mp.bn")
        params[f"blocks_{bi}"] = {
            "gamma1": sd[f"{b}.gamma1"],
            "gamma2": sd[f"{b}.gamma2"],
            "gamma3": sd[f"{b}.gamma3"],
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "norm3": _norm(sd, f"{b}.norm3"),
            "attn": {"qkv": _linear(sd, f"{b}.attn.qkv"),
                     "proj": _linear(sd, f"{b}.attn.proj"),
                     "temperature": sd[f"{b}.attn.temperature"]},
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
            "local_mp": lp,
        }
        stats[f"blocks_{bi}"] = {"local_mp": ls}
    n_ca = len([k for k in sd
                if re.match(r"cls_attn_blocks\.\d+\.norm1\.weight$", k)])
    for bi in range(n_ca):
        b = f"cls_attn_blocks.{bi}"
        params[f"cls_attn_blocks_{bi}"] = {
            "gamma1": sd[f"{b}.gamma1"],
            "gamma2": sd[f"{b}.gamma2"],
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "attn": {"qkv": _linear(sd, f"{b}.attn.qkv"),
                     "proj": _linear(sd, f"{b}.attn.proj")},
            "mlp": {"fc1": _linear(sd, f"{b}.mlp.fc1"),
                    "fc2": _linear(sd, f"{b}.mlp.fc2")},
        }
    params["norm"] = _norm(sd, "norm")
    return {"params": params, "batch_stats": stats}


_FAMILY_IMPORTERS = {"dino": import_vit, "deit": import_vit,
                     "swin": import_swin, "cait": import_cait,
                     "xcit": import_xcit, "resnet": import_resnet}


def register_importer(family: str, fn) -> None:
    _FAMILY_IMPORTERS[family] = fn


# families whose importers return multiple variable collections
_MULTI_COLLECTION = {"xcit", "resnet"}


def import_backbone(family: str, sd: Dict[str, np.ndarray],
                    target_backbone: Dict[str, Any],
                    target_collections: Optional[Dict[str, Any]] = None,
                    ) -> Dict[str, Any]:
    """Returns ``{"params": tree[, "batch_stats": tree]}`` for the backbone."""
    if family not in _FAMILY_IMPORTERS:
        raise NotImplementedError(
            f"torch import for family {family!r} not implemented yet")
    imported = _FAMILY_IMPORTERS[family](sd, target_backbone)
    if family not in _MULTI_COLLECTION:
        imported = {"params": imported}
    _check_tree_shapes(imported["params"], target_backbone, family)
    out = {"params": jax.tree.map(
        lambda t, s: jnp.asarray(s, jnp.asarray(t).dtype),
        target_backbone, imported["params"])}
    for coll, tree in imported.items():
        if coll == "params":
            continue
        target = (target_collections or {}).get(coll)
        if target is not None:
            _check_tree_shapes(tree, target, f"{family}:{coll}")
            tree = jax.tree.map(
                lambda t, s: jnp.asarray(s, jnp.asarray(t).dtype),
                target, tree)
        out[coll] = tree
    return out


def _check_tree_shapes(imported, target, family):
    tgt_flat = jax.tree_util.tree_flatten_with_path(target)[0]
    imp_flat = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
    missing, mismatched = [], []
    for path, leaf in tgt_flat:
        if path not in imp_flat:
            missing.append(jax.tree_util.keystr(path))
        elif tuple(imp_flat[path].shape) != tuple(leaf.shape):
            mismatched.append(
                f"{jax.tree_util.keystr(path)}: ckpt {imp_flat[path].shape} "
                f"vs model {leaf.shape}")
    if missing or mismatched:
        raise ValueError(
            f"torch import ({family}) mismatch — missing: {missing[:8]}, "
            f"shape mismatches: {mismatched[:8]}")


def load_pretrained_params(zoo_model, image_size: int,
                           torch_ckpt: Optional[str], seed: int = 0,
                           image_channels: int = 3) -> Dict[str, Any]:
    """Init the model and replace the backbone subtree(s) from a torch ckpt.
    Returns the full variables dict ({'params': ...[, 'batch_stats': ...]})."""
    variables = dict(zoo_model.init(jax.random.PRNGKey(seed),
                                    image_size=image_size,
                                    image_channels=image_channels))
    if not torch_ckpt:
        raise ValueError(
            "--pretrained requires --torch_ckpt <path> in this environment "
            "(no network egress to fetch hub checkpoints)")
    if not os.path.exists(torch_ckpt):
        raise FileNotFoundError(torch_ckpt)
    sd = load_torch_state_dict(torch_ckpt)
    target_collections = {k: v.get("backbone") for k, v in variables.items()
                          if k != "params" and isinstance(v, dict)}
    imported = import_backbone(zoo_model.family, sd,
                               variables["params"]["backbone"],
                               target_collections)
    variables["params"] = {**variables["params"],
                           "backbone": imported["params"]}
    for coll, tree in imported.items():
        if coll == "params":
            continue
        variables[coll] = {**variables.get(coll, {}), "backbone": tree}
    return variables
