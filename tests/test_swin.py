"""Tests for the Swin backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.models import VisionModelZoo
from vit_torch_tpu.models.swin import (
    SWIN_CONFIGS, relative_position_index, shifted_window_mask, swin_flops,
    window_partition, window_reverse,
)


def test_window_partition_reverse_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
    w = window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 3)
    back = window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < (2 * 7 - 1) ** 2
    # symmetric pairs map to mirrored offsets: diagonal is the center index
    center = (7 - 1) * (2 * 7 - 1) + (7 - 1)
    assert (np.diag(idx) == center).all()


def test_shifted_window_mask_blocks_cross_region():
    mask = shifted_window_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    # first window (top-left, untouched by shift) has no masking
    np.testing.assert_array_equal(mask[0], 0.0)
    # bottom-right window mixes 4 regions -> must contain -100 entries
    assert (mask[-1] == -100.0).any()
    # mask is symmetric in its pattern
    np.testing.assert_array_equal(mask[-1], mask[-1].transpose(1, 0))


def test_swin_config_surface():
    """Reference config names (models/swin.py:748-820) must resolve."""
    for name in ["swin_tiny_patch4_window7_224", "swin_small_patch4_window7_224",
                 "swin_base_patch4_window7_224", "swin_base_patch4_window12_384",
                 "swin_large_patch4_window12_384_22k",
                 "swin_base_patch4_window7_224_22k"]:
        assert name in SWIN_CONFIGS, name
    assert SWIN_CONFIGS["swin_base_patch4_window7_224"].feature_dim == 1024
    assert SWIN_CONFIGS["swin_large_patch4_window12_384"].feature_dim == 1536


def test_swin_forward_tiny():
    zm = VisionModelZoo.get_model("swin_test", classifier=[10], image_size=32,
                                  dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    out = zm.apply(variables, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 10)
    # param layout mirrors torch for the importer
    bb = variables["params"]["backbone"]
    assert "layers_0_blocks_0" in bb
    assert "qkv" in bb["layers_0_blocks_0"]["attn"]
    assert "relative_position_bias_table" in bb["layers_0_blocks_0"]["attn"]
    assert "layers_0_downsample" in bb


def test_swin_features_only_mode():
    """SwinTransformerOD equivalent: (B, H', W', C) feature map out."""
    from vit_torch_tpu.models.swin import SwinTransformer
    cfg = SWIN_CONFIGS["swin_test"]
    model = SwinTransformer(cfg, dtype=jnp.float32, features_only=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))
    out = model.apply(variables, jnp.ones((2, 32, 32, 3)))
    # patch 4 -> 8x8 grid, one merge -> 4x4, dim 16*2
    assert out.shape == (2, 4, 4, 32)


def test_swin_nondivisible_input_padded():
    """96px with window 7: grid 24 not divisible by 7 — must pad and crop."""
    zm = VisionModelZoo.get_model("swin_tiny_patch4_window7_224",
                                  classifier=None, image_size=96,
                                  dtype=jnp.float32)
    out_shape = VisionModelZoo.get_output_shape(zm, image_size=96)
    assert out_shape == (1, 768)


def test_swin_flops_tiny_224():
    """Swin-T @224 is ~4.5 GMACs (reference flops accounting ballpark)."""
    f = swin_flops(SWIN_CONFIGS["swin_tiny_patch4_window7_224"], 224)
    assert 6e9 < f < 12e9, f  # 2*MACs convention: ~9G


def test_swin_grad_flows():
    zm = VisionModelZoo.get_model("swin_test", classifier=[10], image_size=32,
                                  dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    def loss(p):
        return jnp.sum(zm.model.apply({"params": p}, x, True) ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree.leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)
    assert sum(float(jnp.sum(jnp.abs(l))) for l in leaves) > 0
