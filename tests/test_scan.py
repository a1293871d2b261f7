"""Tests for epoch-scan training and cached-feature linear-eval."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_torch_tpu.data.augment import make_eval_transform, make_train_augment
from vit_torch_tpu.data.datasets import Datasets, NORM_VALUES
from vit_torch_tpu.models import VisionModelZoo
from vit_torch_tpu.train import Trainer, create_train_state, get_optimizer
from vit_torch_tpu.train.scan import (
    cache_backbone_features, epoch_indices, make_scan_eval_fn,
    make_scan_train_fn,
)


def test_epoch_indices_cover_and_pad():
    rng = np.random.default_rng(0)
    idx, msk = epoch_indices(10, 4, rng, shuffle=True)
    assert idx.shape == (3, 4) and msk.shape == (3, 4)
    assert msk.sum() == 10
    valid = idx.reshape(-1)[msk.reshape(-1) > 0]
    assert sorted(valid.tolist()) == list(range(10))


def _tiny(lineareval=False):
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=16)
    tx = get_optimizer("sgd", lr=0.05)
    state = create_train_state(jax.random.PRNGKey(1), variables["params"], tx,
                               lineareval=lineareval)
    return zm, tx, state


def test_scan_train_matches_per_step_semantics():
    """One scan dispatch over K steps must train (loss falls) and produce
    exact metric sums."""
    zm, tx, state = _tiny()
    run = make_scan_train_fn(zm.model.apply, tx, None)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (32, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, 32), jnp.int32)
    nprng = np.random.default_rng(1)
    losses = []
    for _ in range(6):
        idx, msk = epoch_indices(32, 8, nprng, shuffle=True)
        state, m = run(state, images, labels, jnp.asarray(idx),
                       jnp.asarray(msk))
        assert float(m["count"]) == 32.0
        losses.append(float(m["loss_sum"]) / 32.0)
    assert losses[-1] < losses[0]
    assert int(state.step) == 24  # 6 epochs x 4 steps


def test_scan_eval_counts_only_valid():
    zm, tx, state = _tiny()
    run = make_scan_eval_fn(zm.model.apply, None)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (10, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, 10), jnp.int32)
    idx, msk = epoch_indices(10, 4, np.random.default_rng(0), shuffle=False)
    m = run(state, images, labels, jnp.asarray(idx), jnp.asarray(msk))
    assert float(m["count"]) == 10.0


def test_cache_backbone_features():
    zm, tx, state = _tiny(lineareval=True)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (10, 16, 16, 3), dtype=np.uint8)
    transform = make_eval_transform(**NORM_VALUES["cifar10"])
    feats = cache_backbone_features(
        zm.model.backbone.apply, state.frozen["backbone"], images, 4,
        transform)
    assert feats.shape == (10, 64)
    # features must equal a direct forward
    direct = zm.model.backbone.apply(
        {"params": state.frozen["backbone"]},
        transform(jnp.asarray(images[:4])), True)
    np.testing.assert_allclose(np.asarray(feats[:4]), np.asarray(direct),
                               atol=1e-5)


def test_trainer_fit_scan_end_to_end(tmp_path):
    data = Datasets("synthetic", bs=16, synthetic_size=64, image_size=16)
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    trainer = Trainer(zm, epochs=5, lr=0.05, opt="adamw", lr_scheduler="none",
                      earlystop_epoch=0, image_size=16, print_progress=False,
                      eval_transform=make_eval_transform(**data.norm_values))
    stats = trainer.fit_scan({"train": data.sets["train"],
                              "val": data.sets["test"]}, batch_size=16)
    rows = stats.splits["train"].rows
    assert len(rows) == 5
    assert rows[-1]["loss"] < rows[0]["loss"]
    assert rows[0]["sample"] == 64


def test_fit_scan_debug_eval_dump(capsys, monkeypatch):
    """VITX_DEBUG_EVAL=1 also dumps in epoch-scan mode (preds ride the
    scan as a second output)."""
    monkeypatch.setenv("VITX_DEBUG_EVAL", "1")
    data = Datasets("synthetic", bs=16, synthetic_size=32, image_size=16)
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    trainer = Trainer(zm, epochs=1, lr=0.05, opt="sgd", lr_scheduler="none",
                      earlystop_epoch=0, image_size=16, print_progress=False,
                      eval_transform=make_eval_transform(**data.norm_values))
    trainer.fit_scan({"train": data.sets["train"],
                      "val": data.sets["test"]}, batch_size=16)
    out = capsys.readouterr().out
    assert "got outputs shape" in out and "output:" in out


def test_trainer_fit_lineareval_cached(tmp_path):
    data = Datasets("synthetic", bs=16, synthetic_size=64, image_size=16)
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[32, 10],
                                  image_size=16, dtype=jnp.float32)
    trainer = Trainer(zm, epochs=4, lr=0.1, opt="adamw", lr_scheduler="none",
                      lineareval=True, earlystop_epoch=0, image_size=16,
                      print_progress=False,
                      eval_transform=make_eval_transform(**data.norm_values))
    before = jax.device_get(trainer.state.frozen["backbone"])
    stats = trainer.fit_lineareval_cached(
        {"train": data.sets["train"], "val": data.sets["test"]},
        batch_size=16)
    rows = stats.splits["train"].rows
    assert len(rows) == 4
    assert rows[-1]["loss"] < rows[0]["loss"]
    # backbone untouched; head updated and merged back
    after = jax.device_get(trainer.state.frozen["backbone"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert "head" in trainer.state.params


def test_scan_data_parallel_mesh():
    """Scan mode over an 8-device data mesh matches single-device numerics."""
    from vit_torch_tpu.parallel.mesh import make_mesh
    from vit_torch_tpu.train.scan import make_scan_train_fn

    def run(mesh):
        zm, tx, state = _tiny()
        fn = make_scan_train_fn(zm.model.apply, tx, None, mesh=mesh)
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.normal(0, 1, (32, 16, 16, 3)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, 10, 32), jnp.int32)
        idx, msk = epoch_indices(32, 16, np.random.default_rng(1), True)
        state, m = fn(state, images, labels, jnp.asarray(idx),
                      jnp.asarray(msk))
        return float(m["loss_sum"]) / float(m["count"])

    loss_dp = run(make_mesh("data=8"))
    loss_1 = run(None)
    np.testing.assert_allclose(loss_dp, loss_1, rtol=2e-4)
