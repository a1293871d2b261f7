"""Golden logits-parity for XCiT: an independent torch mini-XCiT (official
facebookresearch/xcit semantics incl. the ClassAttentionBlock post-norm
residual quirk) exported through ``import_xcit`` must match our flax XCiT."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vit_torch_tpu.checkpoint.torch_import import import_backbone
from vit_torch_tpu.models import VisionModelZoo

DIM, DEPTH, HEADS, PATCH, IMG = 32, 2, 2, 8, 32


def _conv3x3(cin, cout):
    return nn.Sequential(nn.Conv2d(cin, cout, 3, 2, 1, bias=False),
                         nn.BatchNorm2d(cout))


class _TPatchEmbed(nn.Module):
    def __init__(self):
        super().__init__()
        self.proj = nn.Sequential(
            _conv3x3(3, DIM // 4), nn.GELU(),
            _conv3x3(DIM // 4, DIM // 2), nn.GELU(),
            _conv3x3(DIM // 2, DIM))

    def forward(self, x):
        x = self.proj(x)
        return x.flatten(2).transpose(1, 2), x.shape[2:]


class _TXCA(nn.Module):
    def __init__(self):
        super().__init__()
        self.temperature = nn.Parameter(torch.ones(HEADS, 1, 1))
        self.qkv = nn.Linear(DIM, DIM * 3)
        self.proj = nn.Linear(DIM, DIM)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, HEADS, C // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = (t.transpose(-2, -1) for t in (qkv[0], qkv[1], qkv[2]))
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * self.temperature
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 3, 1, 2).reshape(B, N, C)
        return self.proj(out)


class _TLPI(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(DIM, DIM, 3, padding=1, groups=DIM)
        self.bn = nn.BatchNorm2d(DIM)
        self.conv2 = nn.Conv2d(DIM, DIM, 3, padding=1, groups=DIM)

    def forward(self, x, H, W):
        B, N, C = x.shape
        x = x.permute(0, 2, 1).reshape(B, C, H, W)
        x = self.conv2(self.bn(F.gelu(self.conv1(x))))
        return x.reshape(B, C, N).permute(0, 2, 1)


class _TMlp(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = nn.Linear(DIM, DIM * 4)
        self.fc2 = nn.Linear(DIM * 4, DIM)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _TXCABlock(nn.Module):
    def __init__(self):
        super().__init__()
        LN = lambda: nn.LayerNorm(DIM, eps=1e-6)
        self.norm1, self.norm2, self.norm3 = LN(), LN(), LN()
        self.attn = _TXCA()
        self.local_mp = _TLPI()
        self.mlp = _TMlp()
        self.gamma1 = nn.Parameter(torch.full((DIM,), 0.5))
        self.gamma2 = nn.Parameter(torch.full((DIM,), 0.5))
        self.gamma3 = nn.Parameter(torch.full((DIM,), 0.5))

    def forward(self, x, H, W):
        x = x + self.gamma1 * self.attn(self.norm1(x))
        x = x + self.gamma3 * self.local_mp(self.norm3(x), H, W)
        x = x + self.gamma2 * self.mlp(self.norm2(x))
        return x


class _TClassAttention(nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(DIM, DIM * 3)
        self.proj = nn.Linear(DIM, DIM)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, HEADS, C // HEADS).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        qc = q[:, :, 0:1]
        attn = (qc * k).sum(-1) * (C // HEADS) ** -0.5
        attn = attn.softmax(dim=-1)
        cls = (attn.unsqueeze(2) @ v).transpose(1, 2).reshape(B, 1, C)
        return torch.cat([self.proj(cls), x[:, 1:]], dim=1)


class _TClassAttentionBlock(nn.Module):
    def __init__(self, tokens_norm=True):
        super().__init__()
        LN = lambda: nn.LayerNorm(DIM, eps=1e-6)
        self.norm1, self.norm2 = LN(), LN()
        self.attn = _TClassAttention()
        self.mlp = _TMlp()
        self.gamma1 = nn.Parameter(torch.full((DIM,), 0.5))
        self.gamma2 = nn.Parameter(torch.full((DIM,), 0.5))
        self.tokens_norm = tokens_norm

    def forward(self, x):
        x = x + self.gamma1 * self.attn(self.norm1(x))
        if self.tokens_norm:
            x = self.norm2(x)
        else:
            x = torch.cat([self.norm2(x[:, 0:1]), x[:, 1:]], dim=1)
        x_res = x
        cls = self.gamma2 * self.mlp(x[:, 0:1])
        x = torch.cat([cls, x[:, 1:]], dim=1)
        return x_res + x                      # official-code patch doubling


class _TXCiT(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = _TPatchEmbed()
        self.cls_token = nn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.blocks = nn.ModuleList(_TXCABlock() for _ in range(DEPTH))
        self.cls_attn_blocks = nn.ModuleList(
            _TClassAttentionBlock() for _ in range(2))
        self.norm = nn.LayerNorm(DIM, eps=1e-6)
        self.pos_embeder = type("PE", (nn.Module,), {})()
        self.pos_embeder = nn.Module()
        self.pos_embeder.token_projection = nn.Conv2d(64, DIM, 1)

    def _pos(self, B, H, W):
        scale = 2 * math.pi
        eps = 1e-6
        y = torch.arange(1, H + 1, dtype=torch.float32)[None, :, None].repeat(B, 1, W)
        x = torch.arange(1, W + 1, dtype=torch.float32)[None, None, :].repeat(B, H, 1)
        y = y / (y[:, -1:, :] + eps) * scale
        x = x / (x[:, :, -1:] + eps) * scale
        dim_t = torch.arange(32, dtype=torch.float32)
        dim_t = 10000.0 ** (2 * (dim_t // 2) / 32)
        px = x[:, :, :, None] / dim_t
        py = y[:, :, :, None] / dim_t
        px = torch.stack([px[:, :, :, 0::2].sin(), px[:, :, :, 1::2].cos()],
                         dim=4).flatten(3)
        py = torch.stack([py[:, :, :, 0::2].sin(), py[:, :, :, 1::2].cos()],
                         dim=4).flatten(3)
        pos = torch.cat([py, px], dim=3).permute(0, 3, 1, 2)
        # follow the module dtype (the fp64 trajectory tests run .double())
        pos = pos.to(self.pos_embeder.token_projection.weight.dtype)
        return self.pos_embeder.token_projection(pos)

    def forward(self, x):
        B = x.shape[0]
        x, (H, W) = self.patch_embed(x)
        pos = self._pos(B, H, W).reshape(B, DIM, -1).permute(0, 2, 1)
        x = x + pos
        for blk in self.blocks:
            x = blk(x, H, W)
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.cls_attn_blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


def test_xcit_import_logits_parity():
    torch.manual_seed(0)
    tm = _TXCiT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    zm = VisionModelZoo.get_model("xcit_test", classifier=None,
                                  image_size=IMG, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=IMG)
    imported = import_backbone("xcit", sd, variables["params"]["backbone"],
                               {"batch_stats":
                                variables["batch_stats"]["backbone"]})
    # our xcit_test config uses eta=1.0 init; the imported gammas are 0.5
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
    ours = zm.model.apply(
        {"params": {"backbone": imported["params"]},
         "batch_stats": {"backbone": imported["batch_stats"]}},
        jnp.asarray(x), True)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5, rtol=1e-3)
