"""Jitted train/eval steps with device-resident metrics.

The reference's hot loop (``utils_network.py:359-516``) crosses the device
boundary three times per batch (H2D input, D2H loss ``.item()``, D2H argmax).
Here the whole step — forward, loss, backward, optimizer update, metric
reduction — is one compiled XLA program; the host only receives three scalars
per batch *asynchronously* (loss-sum, correct-count, sample-count), and the
epoch loop accumulates them as device arrays so nothing blocks until the
epoch-end read.

Linear-eval: the param tree is split into ``params`` (trainable, e.g. the
head) and ``frozen`` (backbone).  Differentiating only w.r.t. ``params``
means XLA never builds the backbone backward pass — the functional
equivalent of the reference's ``frozen_model_bottom`` ``no_grad`` sandwich
(``utils_network.py:202-211,413-415``).

Batches carry a validity ``mask`` so the final partial batch of an epoch can
be zero-padded to the static batch shape TPUs require.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any                      # trainable subtree
    frozen: Any                      # frozen subtree ({} for full finetune)
    opt_state: Any
    rng: jax.Array
    model_state: Any = struct.field(default_factory=dict)
    # ^ non-param variable collections (e.g. batch_stats for BatchNorm
    #   backbones — XCiT conv stem, ResNeXt/WRN).  Under GSPMD jit the batch
    #   mean/var reductions become global (cross-device) reductions, giving
    #   SyncBatchNorm semantics (reference models/xcit.py:64,128) for free.

    def merged_params(self) -> Dict[str, Any]:
        return {**self.frozen, **self.params}

    def variables(self) -> Dict[str, Any]:
        return {"params": self.merged_params(), **self.model_state}


def split_params(params: Dict[str, Any], lineareval: bool,
                 ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split the ``{'backbone', 'head'}`` tree into (trainable, frozen)."""
    if not lineareval:
        return dict(params), {}
    trainable = {k: v for k, v in params.items() if k != "backbone"}
    frozen = {k: v for k, v in params.items() if k == "backbone"}
    if not trainable:
        raise ValueError("lineareval requires a classifier head to train")
    return trainable, frozen


def create_train_state(rng: jax.Array, params: Dict[str, Any],
                       tx: optax.GradientTransformation,
                       lineareval: bool = False,
                       model_state: Optional[Dict[str, Any]] = None,
                       ) -> TrainState:
    trainable, frozen = split_params(params, lineareval)
    return TrainState(step=jnp.zeros((), jnp.int32), params=trainable,
                      frozen=frozen, opt_state=tx.init(trainable), rng=rng,
                      model_state=dict(model_state or {}))


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Per-epoch LR update (the LambdaLR equivalent) — mutates only the
    injected hyperparam leaf, so no recompilation."""
    opt_state = state.opt_state._replace(
        hyperparams={**state.opt_state.hyperparams,
                     "learning_rate": jnp.asarray(lr, jnp.float32)})
    return state.replace(opt_state=opt_state)


def cross_entropy_loss(logits: jax.Array, labels: jax.Array,
                       mask: jax.Array) -> jax.Array:
    """Masked mean CE in float32 (plain CE like the reference's
    ``nn.CrossEntropyLoss``, ``utils_network.py:430-433``)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def _metrics(logits, labels, mask, loss):
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == labels) * mask)
    count = jnp.sum(mask)
    return {"loss_sum": loss * count, "correct": correct, "count": count}


def make_train_step(apply_fn: Callable, tx: optax.GradientTransformation,
                    augment_fn: Optional[Callable] = None,
                    donate: bool = True) -> Callable:
    """Build the jitted train step.

    ``apply_fn(variables, x, deterministic, rngs)`` → logits.
    ``augment_fn(rng, uint8_images) -> float_images`` runs *inside* the
    compiled step (device-side augmentation, see ``data/augment.py``).
    Returns ``step(state, batch) -> (state, metrics)``.
    """

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        rng = jax.random.fold_in(state.rng, state.step)
        images = batch["image"]
        if augment_fn is not None:
            rng, aug_rng = jax.random.split(rng)
            images = augment_fn(aug_rng, images)
        mutable = list(state.model_state.keys())

        def loss_fn(params):
            variables = {"params": {**state.frozen, **params},
                         **state.model_state}
            if mutable:
                logits, new_model_state = apply_fn(
                    variables, images, False, rngs={"dropout": rng},
                    mutable=mutable)
            else:
                logits = apply_fn(variables, images, False,
                                  rngs={"dropout": rng})
                new_model_state = {}
            loss = cross_entropy_loss(logits, batch["label"], batch["mask"])
            return loss, (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state,
                                  model_state=dict(new_model_state))
        return new_state, _metrics(logits, batch["label"], batch["mask"], loss)

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(apply_fn: Callable,
                   eval_transform: Optional[Callable] = None) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, jax.Array]):
        images = batch["image"]
        if eval_transform is not None:
            images = eval_transform(images)
        logits = apply_fn(state.variables(), images, True)
        loss = cross_entropy_loss(logits, batch["label"], batch["mask"])
        return _metrics(logits, batch["label"], batch["mask"], loss)

    return jax.jit(eval_step)


def init_metric_accumulator() -> Dict[str, jax.Array]:
    return {"loss_sum": jnp.zeros((), jnp.float32),
            "correct": jnp.zeros((), jnp.float32),
            "count": jnp.zeros((), jnp.float32)}


accumulate_metrics = jax.jit(
    lambda acc, m: jax.tree.map(jnp.add, acc, m))


def finalize_metrics(acc: Dict[str, jax.Array]) -> Dict[str, float]:
    """The single D2H sync point per logging window."""
    acc = jax.device_get(acc)
    count = max(float(acc["count"]), 1.0)
    return {"acc": float(acc["correct"]) / count,
            "loss": float(acc["loss_sum"]) / count,
            "count": float(acc["count"])}
