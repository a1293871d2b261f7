"""Golden parity for CaiT's two custom attentions vs independent torch
implementations (talking-heads head-mixing order and class-attention
q-from-CLS are the subtle parts of the importer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from vit_torch_tpu.models.cait import ClassAttention, TalkingHeadAttention

DIM, HEADS, N, B = 32, 4, 9, 2


class _TTalkingHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.qkv = nn.Linear(DIM, DIM * 3)
        self.proj = nn.Linear(DIM, DIM)
        self.proj_l = nn.Linear(HEADS, HEADS)
        self.proj_w = nn.Linear(HEADS, HEADS)

    def forward(self, x):
        Bb, Nn, C = x.shape
        h = HEADS
        qkv = self.qkv(x).reshape(Bb, Nn, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * (C // h) ** -0.5, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        attn = self.proj_l(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        attn = attn.softmax(dim=-1)
        attn = self.proj_w(attn.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        out = (attn @ v).transpose(1, 2).reshape(Bb, Nn, C)
        return self.proj(out)


class _TClassAttn(nn.Module):
    def __init__(self):
        super().__init__()
        self.q = nn.Linear(DIM, DIM)
        self.k = nn.Linear(DIM, DIM)
        self.v = nn.Linear(DIM, DIM)
        self.proj = nn.Linear(DIM, DIM)

    def forward(self, x):
        Bb, Nn, C = x.shape
        h = HEADS
        q = self.q(x[:, 0]).unsqueeze(1).reshape(Bb, 1, h, C // h)
        q = q.permute(0, 2, 1, 3) * (C // h) ** -0.5
        k = self.k(x).reshape(Bb, Nn, h, C // h).permute(0, 2, 1, 3)
        v = self.v(x).reshape(Bb, Nn, h, C // h).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(Bb, 1, C))


def test_talking_head_attention_parity():
    torch.manual_seed(0)
    tm = _TTalkingHead().eval()
    module = TalkingHeadAttention(HEADS, qkv_bias=True, dtype=jnp.float32)
    x = np.random.default_rng(0).normal(0, 1, (B, N, DIM)).astype(np.float32)
    params = {
        "qkv": {"kernel": tm.qkv.weight.detach().numpy().T,
                "bias": tm.qkv.bias.detach().numpy()},
        "proj": {"kernel": tm.proj.weight.detach().numpy().T,
                 "bias": tm.proj.bias.detach().numpy()},
        "proj_l_kernel": tm.proj_l.weight.detach().numpy().T,
        "proj_l_bias": tm.proj_l.bias.detach().numpy(),
        "proj_w_kernel": tm.proj_w.weight.detach().numpy().T,
        "proj_w_bias": tm.proj_w.bias.detach().numpy(),
    }
    ours = module.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=1e-4)


def test_class_attention_parity():
    torch.manual_seed(1)
    tm = _TClassAttn().eval()
    module = ClassAttention(HEADS, qkv_bias=True, dtype=jnp.float32)
    x = np.random.default_rng(1).normal(0, 1, (B, N, DIM)).astype(np.float32)
    params = {
        name: {"kernel": getattr(tm, name).weight.detach().numpy().T,
               "bias": getattr(tm, name).bias.detach().numpy()}
        for name in ("q", "k", "v", "proj")
    }
    ours = module.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=1e-4)
