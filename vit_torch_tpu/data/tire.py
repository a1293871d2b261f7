"""Tire (ImageFolder + LBP) dataset builder.

Capability parity with the reference's ``utils_dataset_tire.py``
(``get_tire_dataset``, ``:30-132``): an ImageFolder dataset whose inputs are
LBP channel-stacks (channel count = number of LBP methods / channels chosen),
with zoom/letterbox preprocessing settings 0-3 and standard train-time
augmentation.  LBP construction happens once at dataset build time on the
host (it feeds an N-channel model via the zoo's ``image_channels``); the
random crop/flip run on device like every other dataset.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from vit_torch_tpu.data.datasets import NORM_VALUES, _imagefolder_arrays
from vit_torch_tpu.data.lbp import get_lbp_merge
from vit_torch_tpu.data.loader import ArrayDataLoader, PrefetchLoader

# the reference's preprocessing presets (--tire_settings 0..3):
# channel recipes for the LBP stack
TIRE_SETTINGS = {
    0: dict(methods=("l", "default", "uniform"), radius=1),
    1: dict(methods=("l", "default", "uniform"), radius=2),
    2: dict(methods=("default", "ror", "uniform", "nri_uniform"), radius=1),
    3: dict(methods=("r", "g", "b"), radius=1),       # plain RGB passthrough
}


def get_tire_dataset(data_path: str, image_size: int = 224, bs: int = 32,
                     settings: int = 0, test_ratio: float = 0.2,
                     seed: int = 0, limit_train: int = 0, limit_test: int = 0,
                     prefetch: bool = True) -> "TireDatasets":
    return TireDatasets(data_path, image_size=image_size, bs=bs,
                        settings=settings, test_ratio=test_ratio, seed=seed,
                        limit_train=limit_train, limit_test=limit_test,
                        prefetch=prefetch)


class TireDatasets:
    def __init__(self, data_path: str, image_size: int = 224, bs: int = 32,
                 settings: int = 0, test_ratio: float = 0.2, seed: int = 0,
                 limit_train: int = 0, limit_test: int = 0,
                 prefetch: bool = True) -> None:
        assert settings in TIRE_SETTINGS, f"settings must be 0-3, got {settings}"
        recipe = TIRE_SETTINGS[settings]
        folder_splits, classes = _imagefolder_arrays(
            data_path, image_size, test_ratio=test_ratio, seed=seed)
        self.classes = classes
        self.num_labels = len(classes)
        self.image_channels = len(recipe["methods"])
        splits: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for split, (imgs, labels) in folder_splits.items():
            stacked = np.stack([
                get_lbp_merge(img, radius=recipe["radius"],
                              methods=recipe["methods"])
                for img in imgs])
            splits[split] = (stacked, labels)
        self.sets = splits
        self.image_size = image_size
        # LBP channels are ~uniform in [0,255]; normalize mid-range
        self.norm_values = {
            "mean": [0.5] * self.image_channels,
            "std": [0.25] * self.image_channels,
        }
        self.info = {
            "dataset": "tire",
            "num_labels": self.num_labels,
            "image_size": image_size,
            "image_channels": self.image_channels,
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
