"""Golden parity tests for the torch-checkpoint importer.

Strategy (SURVEY.md §4): build a minimal *independent* torch ViT with the
DINO/timm key layout, export its state_dict through our importer, and verify
our flax model produces identical logits on the same input — the same gate
the full pretrained checkpoints go through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from vit_torch_tpu.checkpoint.torch_import import (
    import_backbone, interpolate_pos_embed, load_torch_state_dict,
)
from vit_torch_tpu.models import VisionModelZoo

DIM, DEPTH, HEADS, PATCH, IMG = 64, 2, 2, 8, 16


class _TorchAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * (C // h) ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class _TorchMlp(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class _TorchBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        # DINO/timm ViT: LN eps 1e-6 (reference vision_all.py:330)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchMlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class _PatchEmbed(nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)


class _TorchViT(nn.Module):
    """Minimal DINO-layout ViT (keys: patch_embed.proj, cls_token, pos_embed,
    blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}, norm)."""

    def __init__(self, dim=DIM, depth=DEPTH, heads=HEADS, patch=PATCH, img=IMG):
        super().__init__()
        n = (img // patch) ** 2
        self.patch_embed = _PatchEmbed(dim, patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(_TorchBlock(dim, heads) for _ in range(depth))
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


@pytest.fixture(scope="module")
def torch_vit():
    torch.manual_seed(0)
    return _TorchViT().eval()


def _to_numpy_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_import_logits_parity(torch_vit):
    """Ours(imported params) must match torch bit-for-bit (fp32 tolerance)."""
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=None,
                                  image_size=IMG, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=IMG)
    backbone = import_backbone("dino", _to_numpy_sd(torch_vit),
                               variables["params"]["backbone"])["params"]

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (4, IMG, IMG, 3)).astype(np.float32)
    ours = zm.model.apply({"params": {"backbone": backbone}},
                          jnp.asarray(x), True)
    with torch.no_grad():
        theirs = torch_vit(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=1e-4)


def test_import_detects_shape_mismatch(torch_vit):
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=None,
                                  image_size=IMG, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=IMG)
    sd = _to_numpy_sd(torch_vit)
    sd["blocks.0.attn.qkv.weight"] = sd["blocks.0.attn.qkv.weight"][:, :32]
    with pytest.raises(ValueError, match="mismatch"):
        import_backbone("dino", sd, variables["params"]["backbone"])


def test_pos_embed_interpolation():
    pos = np.random.default_rng(0).normal(0, 1, (1, 17, 8)).astype(np.float32)
    out = interpolate_pos_embed(pos, 64)  # 4x4 grid -> 8x8 grid
    assert out.shape == (1, 65, 8)
    np.testing.assert_array_equal(out[:, 0], pos[:, 0])  # CLS untouched
    assert interpolate_pos_embed(pos, 16) is pos  # no-op fast path


def test_pos_embed_interpolation_used_on_size_change(torch_vit):
    """Import a 16px-trained ckpt into a 32px model: grid 2x2 -> 4x4."""
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=None,
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    backbone = import_backbone("dino", _to_numpy_sd(torch_vit),
                               variables["params"]["backbone"])["params"]
    assert backbone["pos_embed"].shape == (1, 17, DIM)


def test_load_torch_state_dict_unwraps(tmp_path, torch_vit):
    """'model' wrapper + 'module.' prefix must be stripped (reference
    loaders: models/swin.py:831-840, models/cait.py:269-273)."""
    sd = torch_vit.state_dict()
    wrapped = {"model": {f"module.{k}": v for k, v in sd.items()}}
    fp = str(tmp_path / "ckpt.pth")
    torch.save(wrapped, fp)
    loaded = load_torch_state_dict(fp)
    assert "cls_token" in loaded
    assert not any(k.startswith("module.") for k in loaded)


def test_load_dino_full_checkpoint_with_namespace(tmp_path, torch_vit):
    """DINO *full* checkpoints pickle an argparse.Namespace next to the
    weights; strict weights_only loading rejects it, so the loader must
    allowlist that type and still unwrap teacher/backbone (round-3
    review — previously UnpicklingError before the unwrap ran)."""
    import argparse
    sd = torch_vit.state_dict()
    full = {
        "teacher": {f"module.backbone.{k}": v for k, v in sd.items()},
        "args": argparse.Namespace(arch="vit_base", patch_size=8),
        "epoch": 99,
    }
    fp = str(tmp_path / "dino_full.pth")
    torch.save(full, fp)
    loaded = load_torch_state_dict(fp)
    assert "cls_token" in loaded
    assert not any(k.startswith(("module.", "backbone.")) for k in loaded)
