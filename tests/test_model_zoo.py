"""Tests for the CaiT / XCiT / DeiT / ResNet families and zoo completeness."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.models import VisionModelZoo, arch_family


def _forward(arch, image_size=32, classifier=(10,), **kw):
    zm = VisionModelZoo.get_model(arch, classifier=list(classifier),
                                  image_size=image_size, dtype=jnp.float32, **kw)
    variables = zm.init(jax.random.PRNGKey(0), image_size=image_size)
    out = zm.apply(variables, jnp.ones((2, image_size, image_size, 3)))
    return zm, variables, out


# --- CaiT -----------------------------------------------------------------

def test_cait_forward_and_layout():
    zm, variables, out = _forward("cait_test")
    assert out.shape == (2, 10)
    bb = variables["params"]["backbone"]
    assert "blocks_0" in bb and "blocks_token_only_0" in bb
    blk = bb["blocks_0"]
    assert "gamma_1" in blk and "gamma_2" in blk
    assert "proj_l_kernel" in blk["attn"]           # talking heads
    ca = bb["blocks_token_only_0"]["attn"]
    assert {"q", "k", "v", "proj"} <= set(ca)        # separate q/k/v


def test_cait_config_surface():
    from vit_torch_tpu.models.cait import CAIT_CONFIGS
    for name in ["cait_xxs24_224", "cait_s24_224", "cait_s24_384",
                 "cait_m36_384", "cait_m48_448", "cait_XXS24_224",
                 "cait_S24_224"]:
        assert name in CAIT_CONFIGS, name
    assert CAIT_CONFIGS["cait_m48_448"].depth == 48
    assert CAIT_CONFIGS["cait_s36_384"].init_scale == 1e-6


def test_cait_layerscale_init():
    zm, variables, _ = _forward("cait_test")
    g1 = variables["params"]["backbone"]["blocks_0"]["gamma_1"]
    np.testing.assert_allclose(np.asarray(g1), 1e-5)


# --- XCiT -----------------------------------------------------------------

def test_xcit_forward_and_batchstats():
    zm = VisionModelZoo.get_model("xcit_test", classifier=[10], image_size=32,
                                  dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    assert "batch_stats" in variables            # conv stem BatchNorm
    out = zm.apply(variables, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 10)
    bb = variables["params"]["backbone"]
    assert "temperature" in bb["blocks_0"]["attn"]   # XCA learnable temp
    assert "local_mp" in bb["blocks_0"]              # LPI
    assert "cls_attn_blocks_0" in bb


def test_xcit_config_surface():
    from vit_torch_tpu.models.xcit import XCIT_CONFIGS
    names = [n for n in XCIT_CONFIGS if n != "xcit_test"]
    assert len(names) == 14                      # 7 sizes × p16/p8
    assert XCIT_CONFIGS["xcit_nano_12_p16"].tokens_norm is False
    assert XCIT_CONFIGS["xcit_large_24_p8"].eta == 1e-5


def test_xcit_fourier_pos_encoding():
    from vit_torch_tpu.models.xcit import fourier_pos_encoding
    pos = fourier_pos_encoding(4, 6)
    assert pos.shape == (1, 4, 6, 64)
    assert np.isfinite(np.asarray(pos)).all()
    # values bounded by sin/cos
    assert np.abs(np.asarray(pos)).max() <= 1.0 + 1e-6


# --- DeiT -----------------------------------------------------------------

def test_deit_distilled_forward():
    zm, variables, out = _forward("deit_test_distilled")
    assert out.shape == (2, 10)
    bb = variables["params"]["backbone"]
    assert "dist_token" in bb and "cls_token" in bb
    # pos embed covers patches + 2 prefix tokens
    n_patches = (32 // 8) ** 2
    assert bb["pos_embed"].shape == (1, n_patches + 2, 64)


def test_deit_config_surface():
    from vit_torch_tpu.models.deit import DEIT_CONFIGS
    for name in ["deit_tiny_patch16_224", "deit_base_patch16_384",
                 "deit_base_distilled_patch16_384"]:
        assert name in DEIT_CONFIGS, name
    assert len([n for n in DEIT_CONFIGS if "distilled" in n and
                n != "deit_test_distilled"]) == 4


# --- ResNets --------------------------------------------------------------

def test_resnet_forward_and_batchstats():
    zm = VisionModelZoo.get_model("resnet_test", classifier=[10],
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    assert "batch_stats" in variables
    out = zm.apply(variables, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 10)


def test_resnext_topology():
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS
    assert RESNET_CONFIGS["resnext50_32x4d"].groups == 32
    assert RESNET_CONFIGS["wide_resnet50_2"].width_per_group == 128
    assert RESNET_CONFIGS["resnext101_32x8d"].layers == (3, 4, 23, 3)
    zm = VisionModelZoo.get_model("resnext50_32x4d", classifier=None,
                                  image_size=64, dtype=jnp.float32)
    assert zm.feature_dim == 2048


# --- facade dispatch ------------------------------------------------------

def test_arch_family_dispatch():
    """Reference archs_types table (models/vision_all.py:31-75) coverage."""
    cases = {
        "dino_vitb8": "dino", "dino_vits16": "dino",
        "cait_s24_224": "cait", "xcit_small_12_p8": "xcit",
        "swin_base_patch4_window7_224": "swin",
        "deit_base_patch16_224": "deit",
        "resnext50_32x4d": "resnet", "wide_resnet101_2": "resnet",
    }
    for arch, family in cases.items():
        assert arch_family(arch) == family, arch


def test_available_archs_lists_all_families():
    archs = VisionModelZoo.available_archs()
    for probe in ["dino_vitb8", "cait_s24_224", "xcit_small_12_p8",
                  "swin_large_patch4_window12_384_22k",
                  "deit_base_distilled_patch16_224", "wide_resnet50_2"]:
        assert probe in archs, probe


# --- BatchNorm models train end-to-end ------------------------------------

def test_bn_model_train_step_updates_stats():
    from vit_torch_tpu.train import create_train_state, get_optimizer
    from vit_torch_tpu.train.steps import make_train_step
    zm = VisionModelZoo.get_model("resnet_test", classifier=[10],
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    tx = get_optimizer("sgd", lr=0.01)
    state = create_train_state(
        jax.random.PRNGKey(1), variables["params"], tx,
        model_state={"batch_stats": variables["batch_stats"]})
    step = make_train_step(zm.model.apply, tx, donate=False)
    rng = np.random.default_rng(0)
    batch = {"image": rng.normal(0, 1, (4, 32, 32, 3)).astype(np.float32),
             "label": rng.integers(0, 10, 4).astype(np.int32),
             "mask": np.ones(4, np.float32)}
    state2, m = step(state, batch)
    before = jax.tree.leaves(state.model_state["batch_stats"])
    after = jax.tree.leaves(state2.model_state["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed, "batch_stats must update during training"
    assert np.isfinite(float(m["loss_sum"]))


def test_zoo_flops_match_published():
    """Analytic per-family FLOPs pinned to published GMac counts (fvcore/
    timm) within 2% — the MFU accounting for the whole zoo bench sweep."""
    from vit_torch_tpu.models.cait import CAIT_CONFIGS, cait_flops
    from vit_torch_tpu.models.deit import deit_flops
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, resnet_flops
    from vit_torch_tpu.models.xcit import XCIT_CONFIGS, xcit_flops

    published_gmac = {
        "cait_s24_224": (cait_flops(CAIT_CONFIGS["cait_s24_224"], 224), 9.35),
        "xcit_small_12_p16": (
            xcit_flops(XCIT_CONFIGS["xcit_small_12_p16"], 224), 4.81),
        "deit_base_distilled": (
            deit_flops("deit_base_distilled_patch16_224", 224), 17.68),
        "resnext50_32x4d": (
            resnet_flops(RESNET_CONFIGS["resnext50_32x4d"], 224), 4.27),
        "wide_resnet50_2": (
            resnet_flops(RESNET_CONFIGS["wide_resnet50_2"], 224), 11.43),
    }
    for name, (flops, gmac) in published_gmac.items():
        ratio = flops / (2e9 * gmac)
        assert 0.98 < ratio < 1.02, (name, flops, gmac, ratio)


def test_bench_flops_dispatch_covers_zoo():
    """bench.model_flops_per_image resolves every zoo bench family (no
    silent zero-MFU rows)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    for arch, size in [("dino_vits16", 224), ("deit_base_distilled_patch16_224", 224),
                       ("cait_s24_224", 224), ("xcit_small_12_p16", 224),
                       ("swin_tiny_patch4_window7_224", 224),
                       ("resnext50_32x4d", 224), ("dino_vitb8", 384)]:
        assert bench.model_flops_per_image(arch, size) > 1e9, arch


# --- eval-mode conv+BN folding ---------------------------------------------

@pytest.mark.parametrize("arch", ["resnet_test"])
def test_folded_bn_matches_module_path(arch, monkeypatch):
    """VITX_FOLD_BN (default on) folds eval-mode BatchNorm into the conv
    kernels (models/layers.py:fold_conv_bn_eval).  Must be numerically
    equivalent to the unfused nn.Conv -> nn.BatchNorm module path — exact
    modulo fp association — including under non-trivial running stats."""
    zm, variables, _ = _forward(arch)
    rng = np.random.default_rng(0)

    def jitter(t):  # keep var positive: additive uniform in [0.1, 0.5]
        return t + jnp.asarray(
            rng.uniform(0.1, 0.5, t.shape).astype(np.float32))

    variables = dict(variables)
    variables["batch_stats"] = jax.tree.map(jitter, variables["batch_stats"])
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    monkeypatch.setenv("VITX_FOLD_BN", "1")
    y_fold = zm.apply(variables, x)
    monkeypatch.setenv("VITX_FOLD_BN", "0")
    y_mod = zm.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_mod),
                               atol=1e-4, rtol=1e-4)
