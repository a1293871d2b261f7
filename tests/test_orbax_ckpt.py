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


def test_metrics_sidecar_survives_eviction(tmp_path):
    """best_saved_metric sees metrics of steps recency-retention deleted."""
    from vit_torch_tpu.checkpoint.orbax_io import best_saved_metric
    _, _, state = _state()
    ckpt = str(tmp_path / "ck")
    for step, acc in [(0, 0.2), (1, 0.9), (2, 0.4), (3, 0.5)]:
        save_checkpoint(ckpt, state, step, metrics={"val_acc": acc},
                        max_to_keep=2)
    assert latest_step(ckpt) == 3
    assert best_saved_metric(ckpt) == 0.9
    assert best_saved_metric(str(tmp_path / "nope")) is None


def test_trainer_best_dir_and_resume_seeding(tmp_path):
    """The best-val checkpoint survives max_to_keep eviction (mirrored into
    ckpt_dir/best) and resume re-seeds best-val tracking so the first
    post-resume epoch is not treated as a fresh best (round-3 review)."""
    from vit_torch_tpu.checkpoint.orbax_io import BEST_SUBDIR
    from vit_torch_tpu.train import Trainer
    ckpt = str(tmp_path / "ck")
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    t = Trainer(zm, epochs=1, image_size=16, print_progress=False,
                ckpt_dir=ckpt, save_every=1)
    # val acc peaks at epoch 0, then 5 periodic saves push it out of the
    # max_to_keep=3 recency window
    for epoch, acc in enumerate([0.9, 0.1, 0.2, 0.3, 0.4, 0.5]):
        t._maybe_checkpoint(epoch, acc)
    assert latest_step(ckpt) == 5
    best_dir = str(tmp_path / "ck" / BEST_SUBDIR)
    assert latest_step(best_dir) == 0          # the 0.9 epoch, kept

    t2 = Trainer(zm, epochs=8, image_size=16, print_progress=False,
                 ckpt_dir=ckpt, resume=ckpt)
    assert t2.start_epoch == 6
    assert t2.best_acc == 0.9                  # seeded from metrics sidecar
    # a post-resume epoch below the historical best must NOT touch best/
    t2._maybe_checkpoint(6, 0.6)
    assert latest_step(best_dir) == 0
    # ... but a genuine new best must
    t2._maybe_checkpoint(7, 0.95)
    assert latest_step(best_dir) == 7


def test_lineareval_cached_checkpoint_is_resumable(tmp_path):
    """fit_lineareval_cached must checkpoint the FULL lineareval state
    (frozen backbone + head), not the temporary head-only inner state —
    otherwise resume against the full template fails (round-3 review)."""
    from vit_torch_tpu.data.datasets import Datasets
    from vit_torch_tpu.train import Trainer
    data = Datasets("synthetic", bs=8, synthetic_size=16, image_size=16)
    ckpt = str(tmp_path / "ck")
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    t1 = Trainer(zm, epochs=2, lr=0.01, opt="sgd", lr_scheduler="none",
                 lineareval=True, earlystop_epoch=0, image_size=16,
                 print_progress=False, ckpt_dir=ckpt, save_every=1)
    t1.fit_lineareval_cached(
        {"train": data.sets["train"], "val": data.sets["test"]}, 8)
    assert latest_step(ckpt) is not None

    t2 = Trainer(zm, epochs=3, lr=0.01, opt="sgd", lr_scheduler="none",
                 lineareval=True, earlystop_epoch=0, image_size=16,
                 print_progress=False, resume=ckpt)
    assert t2.start_epoch >= 1
    # frozen backbone restored intact, head matches the trained head
    for a, b in zip(jax.tree.leaves(t1.state.frozen),
                    jax.tree.leaves(t2.state.frozen)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))


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
