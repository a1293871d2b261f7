"""Tests for the data layer: loader, device-side augmentation, datasets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.data.augment import (
    cutout, make_eval_transform, make_train_augment, normalize, random_crop,
    random_hflip,
)
from vit_torch_tpu.data.datasets import Datasets, NORM_VALUES, resize_images
from vit_torch_tpu.data.loader import ArrayDataLoader, PrefetchLoader


def test_loader_fixed_shapes_and_mask():
    images = np.zeros((10, 8, 8, 3), np.uint8)
    labels = np.arange(10, dtype=np.int32)
    dl = ArrayDataLoader(images, labels, batch_size=4)
    batches = list(dl)
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (4, 8, 8, 3)
        assert b["mask"].shape == (4,)
    assert batches[-1]["mask"].tolist() == [1.0, 1.0, 0.0, 0.0]


def test_loader_shuffle_differs_by_epoch():
    images = np.arange(32, dtype=np.uint8).reshape(32, 1, 1, 1).repeat(3, -1)
    labels = np.arange(32, dtype=np.int32)
    dl = ArrayDataLoader(images, labels, batch_size=32, shuffle=True)
    e1 = next(iter(dl))["label"].copy()
    e2 = next(iter(dl))["label"].copy()
    assert not np.array_equal(e1, e2)
    assert sorted(e1) == sorted(e2)


def test_loader_limit():
    dl = ArrayDataLoader(np.zeros((100, 2, 2, 3), np.uint8),
                         np.zeros(100, np.int32), batch_size=10, limit=25)
    assert dl.num_samples == 25 and len(dl) == 3


def test_prefetch_loader_equivalent():
    images = np.random.default_rng(0).integers(0, 255, (20, 4, 4, 3)).astype(np.uint8)
    labels = np.arange(20, dtype=np.int32)
    base = ArrayDataLoader(images, labels, batch_size=8)
    pre = PrefetchLoader(ArrayDataLoader(images, labels, batch_size=8))
    for a, b in zip(base, pre):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_prefetch_loader_abandoned_iteration_reaps_worker():
    """Abandoning iteration mid-epoch must not leak the worker thread (it
    used to block forever in q.put on the full bounded queue — round-3
    review)."""
    import threading
    images = np.zeros((64, 4, 4, 3), np.uint8)
    labels = np.zeros(64, np.int32)
    pre = PrefetchLoader(ArrayDataLoader(images, labels, batch_size=4),
                         prefetch=1)
    baseline = threading.active_count()
    for _ in range(5):
        it = iter(pre)
        next(it)        # worker now blocked on the full queue
        it.close()      # generator finalizer must release + join it
    assert threading.active_count() <= baseline


def test_imagefolder_empty_split_raises_clearly(tmp_path):
    """One image per class → train split empty → a named error, not an
    opaque np.stack crash (round-3 review)."""
    from PIL import Image
    import pytest
    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(d / "only.png")
    from vit_torch_tpu.data.datasets import _imagefolder_arrays
    with pytest.raises(ValueError, match="train.*empty|empty.*train"):
        _imagefolder_arrays(str(tmp_path), image_size=8)


def test_normalize_matches_torchvision_semantics():
    """normalize(uint8) == (x/255 - mean) / std"""
    x = np.random.default_rng(0).integers(0, 256, (2, 4, 4, 3)).astype(np.uint8)
    mean, std = [0.5, 0.4, 0.3], [0.2, 0.25, 0.3]
    out = normalize(jnp.asarray(x), mean, std)
    expected = (x.astype(np.float32) / 255.0 - np.array(mean)) / np.array(std)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_random_crop_preserves_shape_and_content_domain():
    rng = jax.random.PRNGKey(0)
    x = jnp.full((4, 8, 8, 3), 200, jnp.uint8)
    out = random_crop(rng, x, pad=2, fill=128)
    assert out.shape == x.shape
    vals = set(np.unique(np.asarray(out)).tolist())
    assert vals <= {128, 200}  # only original content or pad fill


def test_random_hflip_is_exact_mirror():
    rng = jax.random.PRNGKey(0)
    x = jnp.arange(2 * 1 * 4 * 1, dtype=jnp.uint8).reshape(2, 1, 4, 1)
    out = np.asarray(random_hflip(rng, x, p=1.0))
    np.testing.assert_array_equal(out, np.asarray(x)[:, :, ::-1, :])


def test_cutout_masks_square():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16, 16, 3), jnp.float32)
    out = np.asarray(cutout(rng, x, size=8, fill_value=0.0))
    assert (out == 0).sum() > 0
    assert (out == 1).sum() > 0


def test_train_augment_composes():
    aug = make_train_augment(**NORM_VALUES["cifar10"])
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 32, 32, 3), jnp.uint8)
    out = aug(rng, x)
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    # jit-compatible (it runs inside the train step)
    out2 = jax.jit(aug)(rng, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_synthetic_dataset_learnable_and_deterministic():
    d1 = Datasets("synthetic", bs=16, synthetic_size=64)
    d2 = Datasets("synthetic", bs=16, synthetic_size=64)
    np.testing.assert_array_equal(d1.sets["train"][0], d2.sets["train"][0])
    assert d1.num_labels == 10
    assert d1.info["sample_count_train"] == 64
    b = next(iter(d1.loaders["train"]))
    assert b["image"].dtype == np.uint8


def test_resize_images_bicubic():
    x = np.random.default_rng(0).integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    out = resize_images(x, 16)
    assert out.shape == (2, 16, 16, 3)
    assert resize_images(x, 8) is x  # no-op fast path


def test_missing_dataset_files_raise_helpfully(tmp_path):
    with pytest.raises(RuntimeError, match="synthetic"):
        Datasets("cifar10", root_path=str(tmp_path))


def _write_fake_cifar10(root):
    import os
    import pickle
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for name, n in [("data_batch_1", 20), ("test_batch", 10)]:
        batch = {b"data": rng.integers(0, 256, (n, 3072), dtype=np.uint8),
                 b"labels": rng.integers(0, 10, n).tolist()}
        with open(os.path.join(d, name), "wb") as f:
            pickle.dump(batch, f)
    # remaining train batches empty-pad to keep the loader simple
    for i in range(2, 6):
        with open(os.path.join(d, f"data_batch_{i}"), "wb") as f:
            pickle.dump({b"data": np.zeros((0, 3072), np.uint8),
                         b"labels": []}, f)


def test_cifar10_binary_parsing(tmp_path):
    """Direct numpy parse of the standard CIFAR pickle layout."""
    _write_fake_cifar10(str(tmp_path))
    d = Datasets("cifar10", root_path=str(tmp_path), bs=8)
    assert d.sets["train"][0].shape == (20, 32, 32, 3)
    assert d.sets["test"][0].shape == (10, 32, 32, 3)
    assert d.num_labels == 10


def test_stl10_binary_parsing(tmp_path):
    """STL-10 binaries are 3x96x96 column-major, labels 1-based."""
    import os
    d = os.path.join(str(tmp_path), "stl10_binary")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    for stem, n in [("train", 6), ("test", 4)]:
        rng.integers(0, 256, n * 3 * 96 * 96, dtype=np.uint8).tofile(
            os.path.join(d, f"{stem}_X.bin"))
        (rng.integers(0, 10, n).astype(np.uint8) + 1).tofile(
            os.path.join(d, f"{stem}_y.bin"))
    ds = Datasets("stl10", root_path=str(tmp_path), bs=2)
    assert ds.sets["train"][0].shape == (6, 96, 96, 3)
    assert ds.sets["train"][1].min() >= 0 and ds.sets["train"][1].max() <= 9
