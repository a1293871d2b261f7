"""Epoch-scan training: the whole dataset lives in HBM and K train steps run
as ONE compiled dispatch via ``lax.scan``.

Why: the reference's hot loop pays per-batch host↔device costs 3× per batch
(SURVEY.md §3.1); even our single-dispatch step pays per-step dispatch
latency (~30 ms through tunneled transports, ~100 µs on real hosts).  The
reference's datasets are tiny by TPU standards — STL-10 train is 138 MB
uint8, CIFAR-10 is 184 MB — so the TPU-native design keeps the *entire
split* device-resident as uint8 and gathers each batch on device from a
shuffled index array.  One dispatch processes a whole epoch (or chunk):
augmentation, forward, backward, optimizer and metric reduction all fuse
into a single XLA program containing a ``scan`` over steps.

Also here: cached-feature linear-eval (the reference's dormant
frozen-representation datasets, ``utils_datasets.py:342-527``): run the
frozen backbone ONCE over the dataset, then train the MLP head on cached
features — removing the backbone forward from every subsequent epoch.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vit_torch_tpu.train.steps import (
    TrainState, _metrics, cross_entropy_loss,
)


def make_scan_train_fn(apply_fn: Callable, tx: optax.GradientTransformation,
                       augment_fn: Optional[Callable] = None,
                       mesh=None) -> Callable:
    """Build ``run(state, images, labels, idx, msk) -> (state, metric_sums)``.

    ``images``/``labels`` are the full device-resident split; ``idx``/``msk``
    are (K, B) per-chunk batch indices and validity masks.  The returned
    function is jitted with the state donated (params update in place).

    With a ``mesh``, the per-step gathered batch is constrained to the
    ``data`` axis so the whole scan runs data-parallel (the dataset stays
    replicated in HBM — it is tiny by TPU standards; SURVEY.md §2c).
    """
    constraint = None
    if mesh is not None and mesh.shape.get("data", 1) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        constraint = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state: TrainState, images, labels, idx, msk):
        def one_step(state, step_input):
            batch_idx, batch_msk = step_input
            batch_images = images[batch_idx]       # device gather
            batch_labels = labels[batch_idx]
            if constraint is not None:
                batch_images = jax.lax.with_sharding_constraint(
                    batch_images, constraint)
            rng = jax.random.fold_in(state.rng, state.step)
            x = batch_images
            if augment_fn is not None:
                rng, aug_rng = jax.random.split(rng)
                x = augment_fn(aug_rng, batch_images)
            mutable = list(state.model_state.keys())

            def loss_fn(params):
                variables = {"params": {**state.frozen, **params},
                             **state.model_state}
                if mutable:
                    logits, new_ms = apply_fn(variables, x, False,
                                              rngs={"dropout": rng},
                                              mutable=mutable)
                else:
                    logits = apply_fn(variables, x, False,
                                      rngs={"dropout": rng})
                    new_ms = {}
                loss = cross_entropy_loss(logits, batch_labels, batch_msk)
                return loss, (logits, new_ms)

            (loss, (logits, new_ms)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state,
                                  model_state=dict(new_ms))
            return state, _metrics(logits, batch_labels, batch_msk, loss)

        state, metrics = jax.lax.scan(one_step, state, (idx, msk))
        return state, jax.tree.map(jnp.sum, metrics)

    return run


def make_scan_eval_fn(apply_fn: Callable,
                      eval_transform: Optional[Callable] = None,
                      with_preds: bool = False) -> Callable:
    """``with_preds`` additionally returns the (steps, B) argmax
    predictions from the scan (the debug-eval dump path)."""
    @jax.jit
    def run(state: TrainState, images, labels, idx, msk):
        def one_step(_, step_input):
            batch_idx, batch_msk = step_input
            x = images[batch_idx]
            if eval_transform is not None:
                x = eval_transform(x)
            logits = apply_fn(state.variables(), x, True)
            loss = cross_entropy_loss(logits, labels[batch_idx], batch_msk)
            out = _metrics(logits, labels[batch_idx], batch_msk, loss)
            if with_preds:
                return None, (out, jnp.argmax(logits, axis=-1))
            return None, out

        _, metrics = jax.lax.scan(one_step, None, (idx, msk))
        if with_preds:
            m, preds = metrics
            return jax.tree.map(jnp.sum, m), preds
        return jax.tree.map(jnp.sum, metrics)

    return run


def epoch_indices(n: int, batch_size: int, rng: np.random.Generator,
                  shuffle: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(steps, B) index + mask arrays covering the split (last batch padded)."""
    order = np.arange(n)
    if shuffle:
        rng.shuffle(order)
    n_steps = (n + batch_size - 1) // batch_size
    padded = np.zeros(n_steps * batch_size, np.int64)
    padded[:n] = order
    msk = np.zeros(n_steps * batch_size, np.float32)
    msk[:n] = 1.0
    return (padded.reshape(n_steps, batch_size).astype(np.int32),
            msk.reshape(n_steps, batch_size))


# --------------------------------------------------------------------------
# cached-feature linear-eval
# --------------------------------------------------------------------------

def cache_backbone_features(backbone_apply: Callable, backbone_params: Any,
                            images: np.ndarray, batch_size: int,
                            eval_transform: Callable,
                            model_state: Optional[Dict] = None) -> jax.Array:
    """Run the frozen backbone once over a uint8 split (device-resident
    scan) and return (N, feature_dim) features — the reference's cached
    frozen-representation datasets (``utils_datasets.py:342-527``), on
    device."""
    n = len(images)
    n_steps = (n + batch_size - 1) // batch_size
    pad = n_steps * batch_size - n
    idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
    idx = idx.reshape(n_steps, batch_size).astype(np.int32)
    variables = {"params": backbone_params, **(model_state or {})}

    @jax.jit
    def run(images_dev, idx):
        def one(carry, batch_idx):
            x = images_dev[batch_idx]
            if eval_transform is not None:
                x = eval_transform(x)
            feats = backbone_apply(variables, x, True)
            return carry, feats
        _, feats = jax.lax.scan(one, None, idx)
        return feats.reshape(n_steps * batch_size, -1)

    feats = run(jnp.asarray(images), jnp.asarray(idx))
    return feats[:n]
