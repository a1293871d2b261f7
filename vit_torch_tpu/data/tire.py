"""Tire (ImageFolder + LBP) dataset builder.

Capability parity with the reference's ``utils_dataset_tire.py``
(``get_tire_dataset``, ``:30-132``) and the per-setting presets in the
reference CLI (``main.py:135-152``):

| setting | LBP methods                                   | zoom | crop |
|---------|-----------------------------------------------|------|------|
| 0       | r,g,b,default,uniform,ror,nri_uniform (7 ch)  | 2.0  | 1.2  |
| 1       | l,default,uniform (3 ch)                      | 2.0  | 1.2  |
| 2       | l,default,uniform                             | 2.4  | 1.2  |
| 3       | l,default,uniform                             | 2.4  | 1.6  |

with LBP radius 2 / point_mult 8 in every setting, and the reference's
pipeline order (``utils_dataset_tire.py:59-90``):
``fit_to(zoom_shape, fill=128)`` → ``CenterCrop(pre_crop_shape)`` →
``RandomCrop(image_size)`` → HFlip → VFlip → [ColorJitter → AutoAugment] →
``lbp_merge`` → ``Normalize(0.5, 0.25)``, where
``zoom_shape = image_size·max(1, crop, zoom)`` and
``pre_crop_shape = image_size·max(1, crop)`` (both rounded to even).

TPU redesign, two modes:

- Default (``aug_auto=''``): the deterministic prefix (letterbox + center
  crop) and the LBP stack run once at dataset-build time on the host; the
  random crop and flips run device-side inside the jitted train step **on
  the LBP channel stack** (``make_augment_fn``).  Cropping commutes with LBP
  (codes are local); flips of LBP maps differ from LBP of flipped images
  only for orientation-sensitive codes — accepted so train steps need no
  per-step host LBP (the reference needed 16 worker processes for exactly
  that).  NB the reference's ``autoaugment_imagenet=True`` default stage is
  NOT applied in this mode (AutoAugment must precede LBP).
- ``aug_auto='imagenet'`` (…/cifar10/svhn): the reference's FULL random
  pipeline per step, entirely on device — crop → flips → AutoAugment →
  **device LBP** (``data/lbp_device.py``, bit-exact vs the host kernels) →
  normalize — restoring the reference's default AutoAugment stage in its
  correct pipeline position.

Color jitter is intentionally dropped in both modes: LBP is invariant to
monotone intensity transforms, so it only affected the raw r/g/b
passthrough channels.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from vit_torch_tpu.data.datasets import NORM_VALUES, _imagefolder_arrays
from vit_torch_tpu.data.lbp import get_lbp_merge
from vit_torch_tpu.data.loader import ArrayDataLoader, PrefetchLoader

# reference preset table (main.py:135-152): (methods, zoom, random_crop)
TIRE_SETTINGS = {
    0: dict(methods=("r", "g", "b", "default", "uniform", "ror",
                     "nri_uniform"), zoom=2.0, crop=1.2),
    1: dict(methods=("l", "default", "uniform"), zoom=2.0, crop=1.2),
    2: dict(methods=("l", "default", "uniform"), zoom=2.4, crop=1.2),
    3: dict(methods=("l", "default", "uniform"), zoom=2.4, crop=1.6),
}
TIRE_LBP_RADIUS = 2       # reference _lbp_dict (main.py:152)
TIRE_LBP_POINT_MULT = 8


def _center_crop(imgs: np.ndarray, size: int) -> np.ndarray:
    H, W = imgs.shape[1:3]
    oy, ox = (H - size) // 2, (W - size) // 2
    return imgs[:, oy:oy + size, ox:ox + size]


def get_tire_dataset(data_path: str, image_size: int = 224, bs: int = 32,
                     settings: int = 0, test_ratio: float = 0.2,
                     seed: int = 0, limit_train: int = 0, limit_test: int = 0,
                     prefetch: bool = True,
                     aug_auto: str = "") -> "TireDatasets":
    return TireDatasets(data_path, image_size=image_size, bs=bs,
                        settings=settings, test_ratio=test_ratio, seed=seed,
                        limit_train=limit_train, limit_test=limit_test,
                        prefetch=prefetch, aug_auto=aug_auto)


class TireDatasets:
    def __init__(self, data_path: str, image_size: int = 224, bs: int = 32,
                 settings: int = 0, test_ratio: float = 0.2, seed: int = 0,
                 limit_train: int = 0, limit_test: int = 0,
                 prefetch: bool = True, aug_auto: str = "") -> None:
        assert settings in TIRE_SETTINGS, f"settings must be 0-3, got {settings}"
        recipe = TIRE_SETTINGS[settings]
        zoom, crop = recipe["zoom"], recipe["crop"]
        # reference shape arithmetic (utils_dataset_tire.py:57-58)
        zoom_shape = int(image_size * max(1.0, crop, zoom)) // 2 * 2
        pre_crop_shape = int(image_size * max(1.0, crop)) // 2 * 2
        folder_splits, classes = _imagefolder_arrays(
            data_path, zoom_shape, test_ratio=test_ratio, seed=seed,
            letterbox=True, fill=128)
        self.classes = classes
        self.num_labels = len(classes)
        self.image_channels = len(recipe["methods"])

        lbp = functools.partial(get_lbp_merge, radius=TIRE_LBP_RADIUS,
                                point_mult=TIRE_LBP_POINT_MULT,
                                methods=recipe["methods"])
        self.aug_auto = aug_auto
        splits: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for split, (imgs, labels) in folder_splits.items():
            # train keeps the pre-random-crop margin (device crops per step);
            # test is deterministically center-cropped to the final size
            crop_size = pre_crop_shape if split == "train" else image_size
            imgs = _center_crop(imgs, crop_size)
            if split == "train" and aug_auto:
                # AutoAugment mode: the train loader carries RAW RGB and the
                # whole random pipeline (crop → flips → AutoAugment → LBP →
                # normalize) runs on device per step (``lbp_device``) — the
                # reference's order, where AutoAugment precedes lbp_merge
                # (utils_dataset_tire.py:81-90)
                splits[split] = (imgs, labels)
            else:
                splits[split] = (np.stack([lbp(img) for img in imgs]), labels)
        self.sets = splits
        self.image_size = image_size
        self.settings = settings
        # LBP channels are ~uniform in [0,255]; reference normalizes all
        # channels with (0.5, 0.25) (utils_dataset_tire.py:91)
        self.norm_values = {
            "mean": [0.5] * self.image_channels,
            "std": [0.25] * self.image_channels,
        }
        self.info = {
            "dataset": "tire",
            "num_labels": self.num_labels,
            "image_size": image_size,
            "image_channels": self.image_channels,
            "settings": settings,
            "zoom_shape": zoom_shape,
            "pre_crop_shape": pre_crop_shape,
            "sample_count_train": len(splits["train"][1]),
            "sample_count_val": len(splits["test"][1]),
        }
        train_loader = ArrayDataLoader(*splits["train"], batch_size=bs,
                                       shuffle=True, seed=seed,
                                       limit=limit_train)
        val_loader = ArrayDataLoader(*splits["test"], batch_size=bs,
                                     limit=limit_test)
        if prefetch:
            train_loader = PrefetchLoader(train_loader)
            val_loader = PrefetchLoader(val_loader)
        self.loaders = {"train": train_loader, "val": val_loader}

    def make_augment_fn(self, dtype=None) -> Callable:
        """Device-side train augmentation.

        Default: RandomCrop to ``image_size`` + HFlip + VFlip + Normalize on
        the precomputed LBP stack (the random suffix of the reference
        pipeline; crops commute with LBP, see module docstring).

        With ``aug_auto`` set: the reference's FULL random pipeline on raw
        RGB — crop → flips → AutoAugment(policy) → device LBP → normalize —
        one jitted program per step (``utils_dataset_tire.py:81-90`` order;
        its ``autoaugment_imagenet=True`` default maps to
        ``aug_auto='imagenet'``)."""
        import jax
        import jax.numpy as jnp
        from vit_torch_tpu.data.augment import (
            normalize, random_crop_to, random_hflip, random_vflip)
        size = self.image_size
        mean, std = self.norm_values["mean"], self.norm_values["std"]
        out_dtype = dtype if dtype is not None else jnp.float32
        auto_fn = None
        lbp_fn = None
        if self.aug_auto:
            from vit_torch_tpu.data.autoaugment import make_autoaugment
            from vit_torch_tpu.data.lbp_device import lbp_merge_device
            auto_fn = make_autoaugment(self.aug_auto)
            recipe = TIRE_SETTINGS[self.settings]
            lbp_fn = functools.partial(lbp_merge_device,
                                       radius=TIRE_LBP_RADIUS,
                                       point_mult=TIRE_LBP_POINT_MULT,
                                       methods=recipe["methods"])

        def augment(rng, images):
            r_crop, r_h, r_v, r_a = jax.random.split(rng, 4)
            x = images
            if x.shape[1] > size:
                x = random_crop_to(r_crop, x, size)
            x = random_hflip(r_h, x)
            x = random_vflip(r_v, x)
            if auto_fn is not None:
                x = auto_fn(r_a, x.astype(jnp.uint8))
                x = lbp_fn(x)
            return normalize(x, mean, std, dtype=out_dtype)

        return augment
