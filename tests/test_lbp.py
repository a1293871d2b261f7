"""Tests for the LBP transforms (native C++ vs numpy fallback) and the tire
dataset builder."""

import numpy as np
import pytest
from PIL import Image

from vit_torch_tpu.data.lbp import (
    LBP_METHODS, get_lbp_full, get_lbp_merge, local_binary_pattern,
    _lbp_numpy, rgb_to_gray,
)


@pytest.fixture
def gray_img():
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (24, 24)).astype(np.float64)


@pytest.mark.parametrize("method", ["default", "ror", "uniform",
                                    "nri_uniform", "var"])
def test_native_matches_numpy(gray_img, method):
    """C++ LBP must agree with the independent numpy implementation.

    Compared on the interior: at clamped borders, bilinear samples can tie
    exactly with the center and FP rounding order may flip the >= bit.
    """
    native = local_binary_pattern(gray_img, 8, 1.0, method)[1:-1, 1:-1]
    ref = _lbp_numpy(gray_img, 8, 1.0, method)[1:-1, 1:-1]
    if method == "var":
        np.testing.assert_allclose(native, ref, rtol=1e-9)
    else:
        np.testing.assert_array_equal(native, ref)


def test_uniform_flat_region_is_all_ones_pattern():
    """On a constant image every neighbor >= center → uniform code = P."""
    img = np.full((8, 8), 100.0)
    out = local_binary_pattern(img, 8, 1.0, "uniform")
    assert (out[1:-1, 1:-1] == 8).all()  # borders have clamped-sample FP ties


def test_ring_orientation_matches_skimage():
    """skimage convention: sample p=0 sits due EAST of the center and the
    ring is traversed counter-clockwise (round-3 review: the ring was
    reflected, changing every default/ror/nri_uniform code)."""
    img = np.zeros((5, 5), np.float64)
    img[2, 2] = 100.0       # center
    img[2, 3] = 200.0       # east neighbor only
    code = local_binary_pattern(img, 8, 1.0, "default")[2, 2]
    assert code == 1.0      # east = bit 0 → 2**0
    img2 = np.zeros((5, 5), np.float64)
    img2[2, 2] = 100.0
    img2[1, 2] = 200.0      # north neighbor only (row-1 = -sin(pi/2))
    code2 = local_binary_pattern(img2, 8, 1.0, "default")[2, 2]
    assert code2 == 4.0     # north = bit 2 → 2**2 (CCW traversal)


def test_gray_matches_pil_convert_l():
    """The LBP input and the 'l' channel quantize exactly like PIL
    convert('L') — the reference's pre-LBP step (utils_datasets.py:1105)."""
    from vit_torch_tpu.data.lbp import rgb_to_gray_uint8
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    pil = np.array(Image.fromarray(img).convert("L"))
    np.testing.assert_array_equal(rgb_to_gray_uint8(img), pil)


def test_ror_rotation_invariance():
    """ror value range never exceeds the default range and is <= default."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16)).astype(np.float64)
    d = local_binary_pattern(img, 8, 1.0, "default")
    r = local_binary_pattern(img, 8, 1.0, "ror")
    assert (r <= d).all()


def test_get_lbp_full_reference_ranges(gray_img):
    maps = get_lbp_full(gray_img.astype(np.uint8), radius=2)
    assert set(maps) == set(LBP_METHODS)
    for m in maps.values():
        assert m.dtype == np.uint8 and m.shape == gray_img.shape


def test_get_lbp_merge_channel_stack():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    merged = get_lbp_merge(img, methods=("l", "default", "uniform", "r"))
    assert merged.shape == (16, 16, 4)
    np.testing.assert_array_equal(merged[..., 3], img[..., 0])  # 'r' channel
    pil_gray = np.array(Image.fromarray(img).convert("L"))
    np.testing.assert_array_equal(merged[..., 0], pil_gray)


@pytest.mark.parametrize("methods,radius", [
    (("l", "default", "uniform"), 2),
    (("r", "g", "b", "default", "uniform", "ror", "nri_uniform"), 2),
    (("l", "default", "uniform"), 1),
])
def test_device_lbp_matches_host(methods, radius):
    """The jittable LBP (data/lbp_device.py) must be bit-exact vs the host
    kernels for every tire recipe — it sits inside the train step when
    AutoAugment-before-LBP parity is requested."""
    import jax
    import jax.numpy as jnp
    from vit_torch_tpu.data.lbp_device import lbp_merge_device
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, 20, 20, 3), dtype=np.uint8)
    host = np.stack([get_lbp_merge(im, radius=radius, point_mult=8,
                                   methods=methods) for im in imgs])
    dev = np.asarray(jax.jit(
        lambda x: lbp_merge_device(x, radius=radius, point_mult=8,
                                   methods=methods))(jnp.asarray(imgs)))
    np.testing.assert_array_equal(host.astype(np.float32), dev)


def test_tire_aug_auto_full_device_pipeline(tmp_path):
    """aug_auto mode: the train loader carries raw RGB and the augment fn
    runs crop → flips → AutoAugment → device LBP → normalize as ONE jitted
    program (the reference's utils_dataset_tire.py:81-90 pipeline order)."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    for cls in ("good", "bad"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                         dtype=np.uint8)).save(d / f"{i}.png")
    from vit_torch_tpu.data.tire import get_tire_dataset
    ds = get_tire_dataset(str(tmp_path), image_size=16, bs=4, settings=1,
                          aug_auto="imagenet", prefetch=False)
    batch = next(iter(ds.loaders["train"]))
    assert batch["image"].shape[-1] == 3          # raw RGB, margin kept
    assert batch["image"].shape[1] > 16
    aug = ds.make_augment_fn()
    out = jax.jit(aug)(jax.random.PRNGKey(0), jnp.asarray(batch["image"]))
    assert out.shape == (4, 16, 16, 3)            # LBP channel stack
    assert out.dtype == jnp.float32
    assert float(jnp.abs(out).max()) <= 2.01      # normalized (0.5, 0.25)
    # eval path unchanged: precomputed LBP stack at final size
    val = next(iter(ds.loaders["val"]))
    assert val["image"].shape[1:] == (16, 16, 3)
    assert val["image"].dtype == np.uint8


def test_tire_dataset(tmp_path):
    # build a tiny ImageFolder
    rng = np.random.default_rng(0)
    for cls in ("good", "bad"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(6):
            Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                         dtype=np.uint8)).save(d / f"{i}.png")
    from vit_torch_tpu.data.tire import TIRE_SETTINGS, get_tire_dataset
    ds = get_tire_dataset(str(tmp_path), image_size=16, bs=4, settings=1)
    assert ds.num_labels == 2
    assert ds.image_channels == 3          # ('l', 'default', 'uniform')
    # train keeps the pre-random-crop margin: 16 * 1.2 // 2 * 2 = 18
    batch = next(iter(ds.loaders["train"]))
    assert batch["image"].shape == (4, 18, 18, 3)
    assert batch["image"].dtype == np.uint8
    val = next(iter(ds.loaders["val"]))
    assert val["image"].shape[1:] == (16, 16, 3)
    # setting 0 is the 7-channel recipe (reference main.py:135-152)
    ds0 = get_tire_dataset(str(tmp_path), image_size=16, bs=4, settings=0)
    assert ds0.image_channels == 7


def test_tire_settings_differ(tmp_path):
    """Settings 0-3 produce visibly different preprocessing: channel counts
    and zoom/crop geometry per the reference preset table."""
    rng = np.random.default_rng(1)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(4):
            Image.fromarray(rng.integers(0, 256, (40, 24, 3),
                                         dtype=np.uint8)).save(d / f"{i}.png")
    from vit_torch_tpu.data.tire import get_tire_dataset
    infos = {}
    for s in range(4):
        ds = get_tire_dataset(str(tmp_path), image_size=20, bs=2, settings=s,
                              prefetch=False)
        infos[s] = (ds.image_channels, ds.info["zoom_shape"],
                    ds.info["pre_crop_shape"])
    assert infos[0] == (7, 40, 24)       # zoom 2.0, crop 1.2
    assert infos[1] == (3, 40, 24)
    assert infos[2] == (3, 48, 24)       # zoom 2.4
    assert infos[3] == (3, 48, 32)       # zoom 2.4, crop 1.6
    assert len({v for v in infos.values()}) == 4


def test_tire_augment_fn_crops_and_normalizes(tmp_path):
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(4):
            Image.fromarray(rng.integers(0, 256, (32, 32, 3),
                                         dtype=np.uint8)).save(d / f"{i}.png")
    from vit_torch_tpu.data.tire import get_tire_dataset
    ds = get_tire_dataset(str(tmp_path), image_size=16, bs=2, settings=3,
                          prefetch=False)
    aug = ds.make_augment_fn()
    batch = next(iter(ds.loaders["train"]))
    out = aug(jax.random.PRNGKey(0), jnp.asarray(batch["image"]))
    assert out.shape == (2, 16, 16, 3)       # cropped to image_size
    assert out.dtype == jnp.float32
    assert float(jnp.abs(out).max()) <= 2.01  # normalized (0.5, 0.25)
