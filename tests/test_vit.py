"""Tests for the ViT backbone and zoo facade."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.models import VisionModelZoo, VIT_CONFIGS
from vit_torch_tpu.models.layers import ClassifierHead, PatchEmbed


def test_patch_embed_matches_conv_semantics():
    """reshape+matmul patch embed must equal a stride==kernel convolution."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 3))
    pe = PatchEmbed(patch_size=4, embed_dim=16, dtype=jnp.float32)
    variables = pe.init(rng, x)
    out = pe.apply(variables, x)
    assert out.shape == (2, 4, 16)
    # reference conv: kernel (p, p, C, D) == our (p*p*C, D) reshaped
    kernel = variables["params"]["kernel"].reshape(4, 4, 3, 16)
    conv = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(4, 4), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    conv = conv.reshape(2, 4, 16) + variables["params"]["bias"]
    np.testing.assert_allclose(out, conv, atol=1e-5)


def test_classifier_head_reference_semantics():
    """GELU between Linears; last layer has no bias (vision_all.py:300-320)."""
    rng = jax.random.PRNGKey(0)
    head = ClassifierHead((256, 128, 10), dtype=jnp.float32)
    x = jnp.ones((2, 384))
    variables = head.init(rng, x)
    p = variables["params"]
    assert set(p) == {"fc0", "fc1", "fc2"}
    assert "bias" in p["fc0"] and "bias" in p["fc1"]
    assert "bias" not in p["fc2"], "last layer must be bias-free"
    assert head.apply(variables, x).shape == (2, 10)


@pytest.mark.parametrize("arch,dim", [("dino_vits16", 384), ("dino_vitb16", 768)])
def test_vit_forward_shapes(arch, dim):
    zm = VisionModelZoo.get_model(arch, classifier=[10], image_size=32,
                                  dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    x = jnp.ones((2, 32, 32, 3))
    out = zm.apply(variables, x)
    assert out.shape == (2, 10)
    assert zm.feature_dim == dim
    # param tree split for lineareval freezing
    assert set(variables["params"]) == {"backbone", "head"}


def test_vit_headless_features():
    zm = VisionModelZoo.get_model("dino_vits16", classifier=None, image_size=32,
                                  dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    out = zm.apply(variables, jnp.ones((2, 32, 32, 3)))
    assert out.shape == (2, 384)
    assert "head" not in variables["params"]


def test_fc_stack_classifier():
    """--fc 256 128 32 → classifier=[256,128,32,num_labels]."""
    fc = [256, 128, 32]
    zm = VisionModelZoo.get_model("dino_vits16", classifier=fc + [10],
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    head = variables["params"]["head"]
    assert set(head) == {"fc0", "fc1", "fc2", "fc3"}
    assert head["fc0"]["kernel"].shape == (384, 256)
    assert head["fc3"]["kernel"].shape == (32, 10)


def test_output_shape_probe_no_flops():
    zm = VisionModelZoo.get_model("dino_vits16", classifier=None, image_size=64,
                                  dtype=jnp.float32)
    assert VisionModelZoo.get_output_shape(zm, image_size=64) == (1, 384)


def test_vit_param_count_matches_reference_topology():
    """dino_vits16 has ~21.7M backbone params (embed 384, depth 12, heads 6)."""
    zm = VisionModelZoo.get_model("dino_vits16", classifier=None, image_size=224,
                                  dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=224)
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables))
    assert 21e6 < n < 23e6, f"param count {n:,} out of range for ViT-S/16"


def test_unknown_arch_raises():
    with pytest.raises(ValueError):
        VisionModelZoo.get_model("not_a_real_arch")


def test_vit_jit_and_grad():
    """Backbone must be jittable and differentiable end to end."""
    zm = VisionModelZoo.get_model("dino_vits16", classifier=[10], image_size=32,
                                  dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    y = jnp.array([0, 1, 2, 3])

    @jax.jit
    def loss_fn(params):
        logits = zm.model.apply({"params": params}, x, True)
        return jnp.mean(-jax.nn.log_softmax(logits)[jnp.arange(4), y])

    g = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(jnp.sum(v ** 2) for v in jax.tree.leaves(g))
    assert jnp.isfinite(gnorm) and gnorm > 0
