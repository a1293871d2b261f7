"""Tests for device-side AutoAugment: op semantics vs PIL golden values,
policy tables, jit/vmap compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from vit_torch_tpu.data.autoaugment import (
    CIFAR10_POLICY, IMAGENET_POLICY, POLICIES, STL10_POLICY, SVHN_POLICY,
    _autocontrast, _brightness, _color, _contrast, _equalize, _invert,
    _posterize, _rotate, _sharpness, _shear_x, _solarize, _translate_x,
    make_autoaugment,
)


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (16, 16, 3)).astype(np.float32)


def _pil(img):
    return Image.fromarray(img.astype(np.uint8))


def test_policy_tables_verbatim():
    assert len(IMAGENET_POLICY) == 25
    assert len(CIFAR10_POLICY) == 25
    assert len(SVHN_POLICY) == 25
    assert STL10_POLICY is IMAGENET_POLICY  # reference tables identical
    assert IMAGENET_POLICY[0] == (0.4, "posterize", 8, 0.6, "rotate", 9)
    assert CIFAR10_POLICY[1] == (0.7, "rotate", 2, 0.3, "translateX", 9)
    assert SVHN_POLICY[0] == (0.9, "shearX", 4, 0.2, "invert", 3)


def test_invert_matches_pil(img):
    ours = np.asarray(_invert(jnp.asarray(img), 0.0, 1.0))
    ref = np.asarray(ImageOps.invert(_pil(img)), np.float32)
    np.testing.assert_allclose(ours, ref)


def test_posterize_matches_pil(img):
    ours = np.asarray(_posterize(jnp.asarray(img), jnp.float32(4), 1.0))
    ref = np.asarray(ImageOps.posterize(_pil(img), 4), np.float32)
    np.testing.assert_allclose(ours, ref)


def test_solarize_matches_pil(img):
    ours = np.asarray(_solarize(jnp.asarray(img), jnp.float32(128), 1.0))
    ref = np.asarray(ImageOps.solarize(_pil(img), 128), np.float32)
    np.testing.assert_allclose(ours, ref)


def test_equalize_matches_pil(img):
    ours = np.asarray(_equalize(jnp.asarray(img), 0.0, 1.0))
    ref = np.asarray(ImageOps.equalize(_pil(img)), np.float32)
    np.testing.assert_allclose(ours, ref)


def test_brightness_matches_pil(img):
    factor = 1.5
    ours = np.asarray(_brightness(jnp.asarray(img), jnp.float32(0.5), 1.0))
    ref = np.asarray(ImageEnhance.Brightness(_pil(img)).enhance(factor),
                     np.float32)
    np.testing.assert_allclose(ours, ref, atol=1.0)  # PIL rounds per-op


def test_color_matches_pil(img):
    ours = np.asarray(_color(jnp.asarray(img), jnp.float32(0.4), 1.0))
    ref = np.asarray(ImageEnhance.Color(_pil(img)).enhance(1.4), np.float32)
    np.testing.assert_allclose(ours, ref, atol=2.0)


def test_contrast_close_to_pil(img):
    ours = np.asarray(_contrast(jnp.asarray(img), jnp.float32(0.3), -1.0))
    ref = np.asarray(ImageEnhance.Contrast(_pil(img)).enhance(0.7), np.float32)
    np.testing.assert_allclose(ours, ref, atol=2.0)


def test_sharpness_close_to_pil(img):
    ours = np.asarray(_sharpness(jnp.asarray(img), jnp.float32(0.5), 1.0))
    ref = np.asarray(ImageEnhance.Sharpness(_pil(img)).enhance(1.5),
                     np.float32)
    # interior only: PIL leaves a 1px border unfiltered (we replicate), but
    # rounding differs slightly at edges
    np.testing.assert_allclose(ours[1:-1, 1:-1], ref[1:-1, 1:-1], atol=2.0)


def test_translate_fills_128(img):
    # PIL affine c=+m·W samples input at x+8: right half goes out of bounds
    out = np.asarray(_translate_x(jnp.asarray(img), jnp.float32(0.5), 1.0))
    assert (out[:, 8:] == 128).all()
    np.testing.assert_allclose(out[:, :8], img[:, 8:])


def test_shear_matches_pil_bicubic(img):
    """Reference shears with Image.BICUBIC (utils_datasets.py:294-300);
    PIL's transform-bicubic is cubic convolution with a=-1.0 (round-3
    review: was nearest-neighbor)."""
    from vit_torch_tpu.data.autoaugment import _shear_y
    for mag in (0.1, 0.3, -0.3):
        ref = np.asarray(_pil(img).transform(
            (16, 16), Image.AFFINE, (1, mag, 0, 0, 1, 0), Image.BICUBIC,
            fillcolor=(128, 128, 128)), np.float64)
        ours = np.round(np.asarray(_shear_x(
            jnp.asarray(img), jnp.float32(abs(mag)), float(np.sign(mag)))))
        np.testing.assert_allclose(ours, ref, atol=1.0)  # rounding order
    ref = np.asarray(_pil(img).transform(
        (16, 16), Image.AFFINE, (1, 0, 0, 0.3, 1, 0), Image.BICUBIC,
        fillcolor=(128, 128, 128)), np.float64)
    ours = np.round(np.asarray(_shear_y(jnp.asarray(img), jnp.float32(0.3),
                                        1.0)))
    np.testing.assert_allclose(ours, ref, atol=1.0)


def test_rotate_matches_pil_exactly(img):
    """rotate must reproduce the reference's _rotate_with_fill bit-exactly:
    PIL center (W/2, H/2) and pixel-center nearest sampling (round-3 review:
    the (W-1)/2 center put every sample half a pixel off)."""
    for ang in (9.0, 30.0):
        rot = _pil(img).convert("RGBA").rotate(ang)
        ref = np.asarray(Image.composite(
            rot, Image.new("RGBA", rot.size, (128,) * 4), rot).convert("RGB"),
            np.float32)
        ours = np.asarray(_rotate(jnp.asarray(img), jnp.float32(ang), 1.0))
        np.testing.assert_array_equal(ours, ref)


def test_translate_fractional_matches_pil(img):
    """Non-integer translation magnitudes floor exactly like PIL's
    pixel-center nearest sampling."""
    ref = np.asarray(_pil(img).transform(
        (16, 16), Image.AFFINE, (1, 0, 0.37 * 16, 0, 1, 0),
        fillcolor=(128, 128, 128)), np.float32)
    ours = np.asarray(_translate_x(jnp.asarray(img), jnp.float32(0.37), 1.0))
    np.testing.assert_array_equal(ours, ref)


def test_autocontrast_stretches(img):
    compressed = img * 0.5 + 64  # range [64, 191]
    out = np.asarray(_autocontrast(jnp.asarray(compressed), 0.0, 1.0))
    assert out.min() < 5 and out.max() > 250


@pytest.mark.parametrize("policy", list(POLICIES))
def test_autoaugment_batched_jit(policy):
    aug = make_autoaugment(policy)
    rng = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (4, 16, 16, 3), dtype=np.uint8))
    out = jax.jit(aug)(rng, x)
    assert out.shape == x.shape and out.dtype == jnp.uint8
    # different rng -> different augmentation
    out2 = jax.jit(aug)(jax.random.PRNGKey(1), x)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))


def test_full_train_augment_with_policy():
    from vit_torch_tpu.data.augment import make_train_augment
    from vit_torch_tpu.data.datasets import NORM_VALUES
    aug = make_train_augment(**NORM_VALUES["cifar10"], auto_policy="cifar10")
    x = jnp.zeros((2, 32, 32, 3), jnp.uint8)
    out = jax.jit(aug)(jax.random.PRNGKey(0), x)
    assert out.shape == (2, 32, 32, 3) and out.dtype == jnp.float32
