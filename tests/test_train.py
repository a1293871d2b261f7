"""Tests for the training engine: schedules, optimizers, steps, trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.models import VisionModelZoo
from vit_torch_tpu.train import (
    Trainer, create_train_state, get_lr_factor_fn, get_optimizer,
    make_eval_step, make_train_step, set_learning_rate, split_params,
)
from vit_torch_tpu.utils.stats import Stats


# --- schedules (reference semantics, utils_network.py:35-73) -------------

def test_step_schedule():
    fn = get_lr_factor_fn("step", lr_step=10, lr_gamma=0.5)
    assert fn(0) == 1.0 and fn(9) == 1.0
    assert fn(10) == 0.5 and fn(20) == 0.25


def test_exp_schedule():
    fn = get_lr_factor_fn("exp", lr_gamma=0.9)
    assert abs(fn(2) - 0.81) < 1e-9


def test_cos_schedule_restarts():
    """Reference cosine restarts every step/2 epochs (mod(e/step, 0.5))."""
    fn = get_lr_factor_fn("cos", lr_step=20, lr_scale=0.1)
    assert abs(fn(0) - 1.0) < 1e-9
    # sweeps toward min_scale just before e = step/2, then restarts at 1.0
    assert fn(9) < 0.15
    assert abs(fn(10) - 1.0) < 1e-9  # mod(0.5, 0.5) == 0 -> restart
    assert abs(fn(20) - 1.0) < 1e-9


def test_none_schedule_is_constant():
    """Reference bug: 'none' returned lambda e: e. Must be constant 1."""
    fn = get_lr_factor_fn("none")
    assert fn(0) == 1.0 and fn(7) == 1.0


def test_ca_schedule_implemented():
    """Reference declared 'ca' in choices but raised NotImplementedError."""
    fn = get_lr_factor_fn("ca", lr_step=10, lr_scale=0.1)
    assert abs(fn(0) - 1.0) < 1e-9
    assert abs(fn(10) - 0.1) < 1e-9
    assert fn(5) < 1.0


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        get_lr_factor_fn("bogus")


# --- optimizers (reference registry, utils_network.py:119-126) ------------

@pytest.mark.parametrize("name", ["sgd", "adam", "adadelta", "adagrad",
                                  "adamw", "adabelief"])
def test_optimizer_registry(name):
    tx = get_optimizer(name, lr=0.01)
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4))}
    updates, _ = tx.update(grads, state, params)
    assert updates["w"].shape == (4, 4)
    assert float(jnp.sum(jnp.abs(updates["w"]))) > 0


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        get_optimizer("bogus")


def test_injectable_learning_rate():
    tx = get_optimizer("sgd", lr=0.1)
    params = {"w": jnp.ones(3)}
    state = create_train_state(jax.random.PRNGKey(0), params, tx)
    state = set_learning_rate(state, 0.5)
    assert float(state.opt_state.hyperparams["learning_rate"]) == 0.5


# --- param splitting (lineareval) ----------------------------------------

def test_split_params_lineareval():
    params = {"backbone": {"w": 1}, "head": {"w": 2}}
    trainable, frozen = split_params(params, lineareval=True)
    assert set(trainable) == {"head"} and set(frozen) == {"backbone"}
    trainable, frozen = split_params(params, lineareval=False)
    assert set(trainable) == {"backbone", "head"} and frozen == {}


def test_lineareval_requires_head():
    with pytest.raises(ValueError):
        split_params({"backbone": {"w": 1}}, lineareval=True)


# --- steps ---------------------------------------------------------------

def _tiny_model_and_state(lineareval=False, lr=0.1):
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=16)
    tx = get_optimizer("sgd", lr=lr)
    state = create_train_state(jax.random.PRNGKey(1), variables["params"], tx,
                               lineareval=lineareval)
    return zm, tx, state


def _batch(bs=8, size=16):
    rng = np.random.default_rng(0)
    return {
        "image": rng.normal(0, 1, (bs, size, size, 3)).astype(np.float32),
        "label": rng.integers(0, 10, bs).astype(np.int32),
        "mask": np.ones(bs, np.float32),
    }


def test_train_step_reduces_loss():
    zm, tx, state = _tiny_model_and_state(lr=0.05)
    step = make_train_step(zm.model.apply, tx, donate=False)
    batch = _batch()
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss_sum"]) / float(m["count"]))
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_lineareval_freezes_backbone():
    zm, tx, state = _tiny_model_and_state(lineareval=True)
    step = make_train_step(zm.model.apply, tx, donate=False)
    before = jax.device_get(state.frozen)
    state2, _ = step(state, _batch())
    after = jax.device_get(state2.frozen)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    # head must have moved
    h0 = jax.tree.leaves(state.params)[0]
    h1 = jax.tree.leaves(state2.params)[0]
    assert not np.allclose(jax.device_get(h0), jax.device_get(h1))


def test_mask_excludes_padded_samples():
    zm, tx, state = _tiny_model_and_state()
    eval_step = make_eval_step(zm.model.apply)
    batch = _batch(bs=8)
    batch["mask"] = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    m = eval_step(state, batch)
    assert float(m["count"]) == 4.0


# --- trainer end-to-end ---------------------------------------------------

def test_trainer_fit_synthetic(tmp_path):
    from vit_torch_tpu.data.datasets import Datasets
    from vit_torch_tpu.data.augment import make_train_augment, make_eval_transform

    data = Datasets("synthetic", bs=16, synthetic_size=64, image_size=16)
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    fp = str(tmp_path / "stats.json")
    stats = Stats(splits=("train", "val"), stats_fp=fp,
                  epoch_total=2, sample_totals={"train": 64, "val": 64})
    trainer = Trainer(zm, epochs=2, lr=0.05, opt="sgd", lr_scheduler="none",
                      lineareval=False, earlystop_epoch=0, stats=stats,
                      image_size=16, print_progress=False,
                      augment_fn=make_train_augment(**data.norm_values),
                      eval_transform=make_eval_transform(**data.norm_values))
    trainer.fit(data.loaders)
    import json
    d = json.load(open(fp))
    assert len(d["train"]) == 2 and len(d["val"]) == 2
    assert d["telem"]["completed"] is True
    assert 0.0 <= d["results"]["val.acc"] <= 1.0


def test_debug_eval_dump(tmp_path, capsys, monkeypatch):
    """VITX_DEBUG_EVAL=1 reproduces the reference's DEBUG eval dump
    (utils_network.py:500-514): output/label windows + recomputed acc."""
    from vit_torch_tpu.data.datasets import Datasets
    from vit_torch_tpu.data.augment import make_eval_transform

    monkeypatch.setenv("VITX_DEBUG_EVAL", "1")
    data = Datasets("synthetic", bs=16, synthetic_size=32, image_size=16)
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    stats = Stats(splits=("train", "val"), stats_fp=None,
                  epoch_total=1, sample_totals={"train": 32, "val": 32})
    trainer = Trainer(zm, epochs=1, lr=0.05, opt="sgd", lr_scheduler="none",
                      earlystop_epoch=0, stats=stats, image_size=16,
                      print_progress=False,
                      eval_transform=make_eval_transform(**data.norm_values))
    trainer.run_one_epoch(data.loaders["val"], training=False)
    out = capsys.readouterr().out
    assert "got outputs shape" in out
    assert "acc: " in out and "output:" in out and "label: " in out


def test_early_stop_rule():
    """Reference rule (utils_network.py:322-328): stop when best val acc is
    not within the last N epochs; the flag is honored (reference bug fixed)."""
    from vit_torch_tpu.train.trainer import should_early_stop
    assert not should_early_stop([0.5, 0.6], 3)          # window not full
    assert not should_early_stop([0.5, 0.6, 0.7], 3)     # still improving
    assert not should_early_stop([0.8, 0.8, 0.8], 2)     # flat: max==best
    assert should_early_stop([0.9, 0.5, 0.6], 2)         # peak fell out
    assert not should_early_stop([0.9, 0.5, 0.6], 0)     # disabled
