"""Golden parity for the DeiT distilled importer (dist_token handling and
forced dual-token averaging)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from test_checkpoint import _PatchEmbed, _TorchBlock
from vit_torch_tpu.checkpoint.torch_import import import_backbone
from vit_torch_tpu.models import VisionModelZoo

DIM, DEPTH, HEADS, PATCH, IMG = 64, 2, 2, 8, 16


class _TorchDeiT(nn.Module):
    """Distilled ViT (DeiT layout: cls_token + dist_token, pos_embed n+2);
    forward returns the averaged token features (DeitCustom semantics)."""

    def __init__(self):
        super().__init__()
        n = (IMG // PATCH) ** 2
        self.patch_embed = _PatchEmbed(DIM, PATCH)
        self.cls_token = nn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.dist_token = nn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, n + 2, DIM) * 0.02)
        self.blocks = nn.ModuleList(_TorchBlock(DIM, HEADS)
                                    for _ in range(DEPTH))
        self.norm = nn.LayerNorm(DIM, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)
        dist = self.dist_token.expand(B, -1, -1)
        x = torch.cat([cls, dist, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return (x[:, 0] + x[:, 1]) / 2


def test_deit_distilled_import_parity():
    torch.manual_seed(0)
    tm = _TorchDeiT().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    zm = VisionModelZoo.get_model("deit_test_distilled", classifier=None,
                                  image_size=IMG, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=IMG)
    backbone = import_backbone("deit", sd,
                               variables["params"]["backbone"])["params"]
    assert backbone["dist_token"].shape == (1, 1, DIM)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
    ours = zm.model.apply({"params": {"backbone": backbone}},
                          jnp.asarray(x), True)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5, rtol=1e-4)
