"""Sharded train/eval step construction (pjit path).

One SPMD program over the mesh: batch sharded on ``data``, params sharded by
the tensor-parallel rules in ``partition.py`` (replicated when the model axis
is 1).  XLA GSPMD inserts the gradient all-reduce over ICI — the TPU-native
equivalent of DDP's NCCL all-reduce, and the TP all-reduces at row-sharded
projections.  Replaces the reference's dormant DDP hooks
(``object/torch_utils.py:244-310``, ``utils_datasets.py:866-891``).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_torch_tpu.parallel.partition import DEFAULT_RULES, named_shardings
from vit_torch_tpu.train.steps import (
    TrainState, cross_entropy_loss, _metrics,
)


def batch_shardings(mesh: Mesh):
    data = NamedSharding(mesh, P("data"))
    return {"image": data, "label": data, "mask": data}


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_shardings(mesh))


def state_shardings(state: TrainState, mesh: Mesh, rules=DEFAULT_RULES,
                    fsdp: bool = False, fsdp_min_size: int = 2 ** 16):
    """Partition specs for the whole TrainState: the path-based rules match
    param paths wherever they appear (params, frozen, optimizer moments).
    With ``fsdp=True`` large params/moments are additionally sharded over
    the ``data`` axis (ZeRO-3; see ``partition.add_fsdp_axis``)."""
    return named_shardings(state, mesh, rules, fsdp=fsdp,
                           fsdp_min_size=fsdp_min_size)


def shard_train_fns(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    state: TrainState,
    mesh: Mesh,
    augment_fn: Optional[Callable] = None,
    eval_transform: Optional[Callable] = None,
    rules=DEFAULT_RULES,
    fsdp: bool = False,
    fsdp_min_size: int = 2 ** 16,
) -> Tuple[Callable, Callable, TrainState]:
    """Return (train_step, eval_step, sharded_state) compiled over ``mesh``.

    A ``seq>1`` mesh axis additionally activates sequence parallelism: the
    backbones' ``dot_product_attention`` calls dispatch to ring attention
    (``ops/ring_attention.py``) with the token axis sharded over ``seq``.
    ``fsdp=True`` shards params + optimizer moments over ``data`` (ZeRO-3):
    GSPMD all-gathers weights per layer and reduce-scatters gradients."""
    from vit_torch_tpu.ops.attention import sequence_parallel
    st_shard = state_shardings(state, mesh, rules, fsdp=fsdp,
                               fsdp_min_size=fsdp_min_size)
    b_shard = batch_shardings(mesh)
    repl = NamedSharding(mesh, P())
    metric_shard = {"loss_sum": repl, "correct": repl, "count": repl}
    state = jax.device_put(state, st_shard)

    def train_step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        images = batch["image"]
        if augment_fn is not None:
            rng, aug_rng = jax.random.split(rng)
            images = augment_fn(aug_rng, images)
        mutable = list(state.model_state.keys())

        def loss_fn(params):
            variables = {"params": {**state.frozen, **params},
                         **state.model_state}
            with sequence_parallel(mesh):
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

    def eval_step(state: TrainState, batch):
        images = batch["image"]
        if eval_transform is not None:
            images = eval_transform(images)
        with sequence_parallel(mesh):
            logits = apply_fn(state.variables(), images, True)
        loss = cross_entropy_loss(logits, batch["label"], batch["mask"])
        return _metrics(logits, batch["label"], batch["mask"], loss)

    train_jit = jax.jit(train_step,
                        in_shardings=(st_shard, b_shard),
                        out_shardings=(st_shard, metric_shard),
                        donate_argnums=(0,))
    eval_jit = jax.jit(eval_step,
                       in_shardings=(st_shard, b_shard),
                       out_shardings=metric_shard)
    return train_jit, eval_jit, state
