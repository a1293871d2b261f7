"""Golden logits-parity test for the Swin importer.

Builds an independent minimal torch Swin (standard paper structure, Microsoft
key layout), imports its state_dict through ``import_swin``, and requires our
flax Swin to reproduce its outputs — covering window partition order, the
relative-position-bias gather, the shifted-window mask, cyclic shift
direction, and PatchMerging concat order.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from vit_torch_tpu.checkpoint.torch_import import import_swin
from vit_torch_tpu.models.swin import SwinConfig, SwinTransformer

EMBED, DEPTHS, HEADS, WINDOW, PATCH, IMG = 16, (2, 2), (2, 4), 4, 4, 32


def _t_window_partition(x, w):
    B, H, W, C = x.shape
    x = x.view(B, H // w, w, W // w, w, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _t_window_reverse(windows, w, H, W):
    B = windows.shape[0] // (H * W // w // w)
    x = windows.view(B, H // w, W // w, w, w, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class _TWindowAttention(nn.Module):
    def __init__(self, dim, w, heads):
        super().__init__()
        self.w, self.heads = w, heads
        self.scale = (dim // heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * w - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            torch.arange(w), torch.arange(w), indexing="ij")).flatten(1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += w - 1
        rel[:, :, 1] += w - 1
        rel[:, :, 0] *= 2 * w - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        Bn, N, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(Bn, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(N, N, h)
        attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(Bn // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.view(Bn, h, N, N)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(Bn, N, C)
        return self.proj(out)


class _TMlp(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class _TSwinBlock(nn.Module):
    def __init__(self, dim, heads, w, shift):
        super().__init__()
        self.w, self.shift = w, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = _TWindowAttention(dim, w, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = _TMlp(dim)

    def forward(self, x):  # x: (B, H, W, C)
        B, H, W, C = x.shape
        # canonical Swin: no shift when the window covers the whole map
        shift = self.shift if min(H, W) > self.w else 0
        y = self.norm1(x)
        if shift:
            y = torch.roll(y, (-shift, -shift), dims=(1, 2))
            mask = self._mask(H, W, shift)
        else:
            mask = None
        windows = _t_window_partition(y, self.w)
        windows = self.attn(windows, mask)
        y = _t_window_reverse(windows, self.w, H, W)
        if shift:
            y = torch.roll(y, (shift, shift), dims=(1, 2))
        x = x + y
        return x + self.mlp(self.norm2(x))

    def _mask(self, H, W, shift):
        img = torch.zeros(1, H, W, 1)
        cnt = 0
        for hs in (slice(0, -self.w), slice(-self.w, -shift),
                   slice(-shift, None)):
            for ws in (slice(0, -self.w), slice(-self.w, -shift),
                       slice(-shift, None)):
                img[:, hs, ws, :] = cnt
                cnt += 1
        mw = _t_window_partition(img, self.w).squeeze(-1)
        diff = mw.unsqueeze(1) - mw.unsqueeze(2)
        return torch.where(diff != 0, torch.tensor(-100.0), torch.tensor(0.0))


class _TPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(4 * dim)
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


class _TPatchEmbed(nn.Module):
    def __init__(self, dim, patch):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, patch)
        self.norm = nn.LayerNorm(dim)


class _TStage(nn.Module):
    def __init__(self, dim, depth, heads, w, downsample):
        super().__init__()
        self.blocks = nn.ModuleList(
            _TSwinBlock(dim, heads, w, 0 if i % 2 == 0 else w // 2)
            for i in range(depth))
        self.downsample = _TPatchMerging(dim) if downsample else None


class _TSwin(nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = _TPatchEmbed(EMBED, PATCH)
        dims = [EMBED * 2 ** i for i in range(len(DEPTHS))]
        self.layers = nn.ModuleList(
            _TStage(dims[i], DEPTHS[i], HEADS[i], WINDOW,
                    downsample=i < len(DEPTHS) - 1)
            for i in range(len(DEPTHS)))
        self.norm = nn.LayerNorm(dims[-1])

    def forward(self, x):  # NCHW
        x = self.patch_embed.proj(x)             # (B, C, H', W')
        x = x.permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        for stage in self.layers:
            for blk in stage.blocks:
                x = blk(x)
            if stage.downsample is not None:
                x = stage.downsample(x)
        x = self.norm(x)
        return x.mean(dim=(1, 2))


@pytest.fixture(scope="module")
def torch_swin():
    torch.manual_seed(0)
    return _TSwin().eval()


def test_swin_import_logits_parity(torch_swin):
    cfg = SwinConfig(patch_size=PATCH, embed_dim=EMBED, depths=DEPTHS,
                     num_heads=HEADS, window_size=WINDOW, drop_path_rate=0.0)
    model = SwinTransformer(cfg, dtype=jnp.float32, name="backbone")
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, IMG, IMG, 3)))
    sd = {k: v.detach().numpy() for k, v in torch_swin.state_dict().items()}
    # torch stage layout "layers.{i}.blocks.{j}" → flatten the Stage wrapper
    sd = {k.replace(".blocks.", ".blocks."): v for k, v in sd.items()}
    params = import_swin(sd, variables["params"])
    # shape check against the target tree
    flat_t = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_i = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, leaf in flat_t:
        assert path in flat_i, f"missing {jax.tree_util.keystr(path)}"
        assert flat_i[path].shape == leaf.shape, jax.tree_util.keystr(path)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
    ours = model.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x), True)
    with torch.no_grad():
        theirs = torch_swin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=5e-5, rtol=1e-4)
