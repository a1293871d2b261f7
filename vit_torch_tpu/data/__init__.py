from vit_torch_tpu.data.datasets import Datasets, NORM_VALUES
from vit_torch_tpu.data.loader import ArrayDataLoader, PrefetchLoader
from vit_torch_tpu.data.augment import (
    make_train_augment, make_eval_transform, normalize,
)
