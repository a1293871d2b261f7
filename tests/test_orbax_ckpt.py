"""Tests for orbax checkpoint save/resume (net-new capability vs the
reference, which had no training checkpointing at all — SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_torch_tpu.checkpoint.orbax_io import (
    latest_step, restore_checkpoint, save_checkpoint,
)
from vit_torch_tpu.models import VisionModelZoo
from vit_torch_tpu.train import create_train_state, get_optimizer


def _state():
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=16)
    tx = get_optimizer("adamw", lr=1e-3)
    return zm, tx, create_train_state(jax.random.PRNGKey(1),
                                      variables["params"], tx)


def test_save_restore_roundtrip(tmp_path):
    zm, tx, state = _state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, step=3, metrics={"val_acc": 0.5})
    assert latest_step(ckpt) == 3

    _, _, template = _state()
    restored = restore_checkpoint(ckpt, template)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_step_empty(tmp_path):
    assert latest_step(str(tmp_path / "nope")) is None


def test_trainer_resume_path(tmp_path):
    """Trainer(resume=...) restores and continues at the next epoch."""
    from vit_torch_tpu.data.datasets import Datasets
    from vit_torch_tpu.train import Trainer
    data = Datasets("synthetic", bs=16, synthetic_size=32, image_size=16)
    ckpt = str(tmp_path / "ckpt")
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    t1 = Trainer(zm, epochs=2, lr=0.01, opt="sgd", lr_scheduler="none",
                 earlystop_epoch=0, image_size=16, print_progress=False,
                 ckpt_dir=ckpt, save_every=1)
    t1.fit_scan({"train": data.sets["train"], "val": data.sets["test"]}, 16)
    assert latest_step(ckpt) is not None

    t2 = Trainer(zm, epochs=4, lr=0.01, opt="sgd", lr_scheduler="none",
                 earlystop_epoch=0, image_size=16, print_progress=False,
                 resume=ckpt)
    assert t2.start_epoch >= 1
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))
