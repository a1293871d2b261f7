"""Trainer — the reference ``Network`` class rebuilt for JAX/TPU.

Capability parity (reference ``utils_network.py:117-553``): optimizer
registry via ``--opt``, per-epoch LR scheduling via ``--lr_scheduler``,
``fit()`` loop over {train, val} splits with per-epoch stats rounds streamed
to JSON, early stopping on a no-val-improvement window, linear-eval frozen
backbone path, and throttled in-place progress printing.

Fixed reference bugs (SURVEY.md §7): ``--earlystop_epoch`` is honored (the
reference's ``fit(earlystop_epoch=10)`` default silently shadowed the flag,
``utils_network.py:233``); 'none' schedule is a constant factor.

TPU redesign: one jitted step per split (forward+loss+backward+update fused),
metrics accumulate on device, the host syncs once per logging window.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from vit_torch_tpu.models.zoo import ZooModel
from vit_torch_tpu.train.optimizers import get_optimizer
from vit_torch_tpu.train.schedules import get_lr_factor_fn
from vit_torch_tpu.train.steps import (
    TrainState, accumulate_metrics, create_train_state, finalize_metrics,
    init_metric_accumulator, make_eval_step, make_train_step,
    set_learning_rate,
)
from vit_torch_tpu.utils.stats import Stats


def should_early_stop(val_accs, window: int) -> bool:
    """Reference early-stop rule (``utils_network.py:322-328``): stop when
    the best val accuracy is not within the last ``window`` epochs."""
    if window <= 0 or len(val_accs) < window:
        return False
    return max(val_accs[-window:]) < max(val_accs)


class Trainer:
    def __init__(
        self,
        zoo_model: ZooModel,
        *,
        epochs: int = 100,
        lr: float = 0.001,
        opt: str = "sgd",
        lr_scheduler: str = "step",
        lr_step: int = 10,
        lr_gamma: float = 0.5,
        lr_scale: float = 0.1,
        lineareval: bool = False,
        earlystop_epoch: int = 5,
        seed: int = 0,
        stats: Optional[Stats] = None,
        image_size: int = 224,
        image_channels: int = 3,
        init_params: Optional[Dict[str, Any]] = None,
        mesh=None,
        augment_fn=None,
        eval_transform=None,
        ckpt_dir: str = "",
        save_every: int = 0,
        resume: str = "",
        print_progress: bool = True,
    ) -> None:
        self.zoo_model = zoo_model
        self.epochs = epochs
        self.base_lr = lr
        self.lineareval = lineareval
        self.earlystop_epoch = earlystop_epoch
        self.stats = stats or Stats(splits=("train", "val"), stats_fp=None)
        self.print_progress = print_progress
        self.mesh = mesh
        self.ckpt_dir = ckpt_dir
        self.save_every = save_every
        self.resume = resume
        self.start_epoch = 0

        self.lr_factor_fn = get_lr_factor_fn(lr_scheduler, lr_step, lr_gamma,
                                             lr_scale)
        self.tx = get_optimizer(opt, lr)

        rng = jax.random.PRNGKey(seed)
        init_rng, state_rng = jax.random.split(rng)
        model_state = {}
        if init_params is None:
            variables = zoo_model.init(init_rng, image_size=image_size,
                                       image_channels=image_channels)
            init_params = variables["params"]
            model_state = {k: v for k, v in variables.items() if k != "params"}
        elif isinstance(init_params, dict) and "params" in init_params:
            variables = init_params
            init_params = variables["params"]
            model_state = {k: v for k, v in variables.items() if k != "params"}
        self.state: TrainState = create_train_state(
            state_rng, init_params, self.tx, lineareval=lineareval,
            model_state=model_state)

        apply_fn = zoo_model.model.apply
        if mesh is not None:
            from vit_torch_tpu.parallel.api import shard_train_fns
            self.train_step, self.eval_step, self.state = shard_train_fns(
                apply_fn, self.tx, self.state, mesh,
                augment_fn=augment_fn, eval_transform=eval_transform)
        else:
            self.train_step = make_train_step(apply_fn, self.tx,
                                              augment_fn=augment_fn)
            self.eval_step = make_eval_step(apply_fn,
                                            eval_transform=eval_transform)

        if resume:
            from vit_torch_tpu.checkpoint.orbax_io import (
                latest_step, restore_checkpoint)
            self.state = restore_checkpoint(resume, self.state)
            # resume at the epoch after the last completed one; the epoch
            # index is stored as the checkpoint step
            self.start_epoch = (latest_step(resume) or -1) + 1
            if self.print_progress:
                print(f"resumed from {resume} at epoch {self.start_epoch}")

    # ------------------------------------------------------------------
    def run_one_epoch(self, loader: Iterable, training: bool) -> Dict[str, float]:
        S = self.stats
        acc = init_metric_accumulator()
        lr = float(jax.device_get(
            self.state.opt_state.hyperparams["learning_rate"]))
        n_batches = len(loader) if hasattr(loader, "__len__") else None
        for i, batch in enumerate(loader):
            batch = self._shard_batch(batch)
            if training:
                self.state, m = self.train_step(self.state, batch)
            else:
                m = self.eval_step(self.state, batch)
            acc = accumulate_metrics(acc, m)
            # progress rendering without forcing a device sync: counters only
            bs = int(batch["mask"].shape[0])
            S.update(sample_count=bs, lr=lr)
            if self.print_progress:
                S.print()
        final = finalize_metrics(acc)
        # overwrite the streaming counters with exact device-side metrics
        S.S.metrics["acc"].reset_round()
        S.S.metrics["loss"].reset_round()
        S.update(sample_count=0, acc=final["acc"], loss=final["loss"], lr=lr)
        return final

    def _shard_batch(self, batch):
        if self.mesh is not None:
            from vit_torch_tpu.parallel.api import shard_batch
            return shard_batch(batch, self.mesh)
        return batch

    # ------------------------------------------------------------------
    def fit(self, loaders: Dict[str, Any]) -> Stats:
        S = self.stats
        val_accs = []
        best_acc = -1.0
        for epoch in range(self.start_epoch, self.epochs):
            lr = self.base_lr * self.lr_factor_fn(epoch)
            self.state = set_learning_rate(self.state, lr)
            for split in ("train", "val"):
                if split not in loaders or loaders[split] is None:
                    continue
                S.set_split(split)
                S.new_round(epoch)
                final = self.run_one_epoch(loaders[split], training=(split == "train"))
                S.finish_round(save=True)
                if self.print_progress:
                    S.print(force=True, end="\n")
                if split == "val":
                    val_accs.append(final["acc"])
                    if self.ckpt_dir:
                        is_best = final["acc"] > best_acc
                        best_acc = max(best_acc, final["acc"])
                        if is_best or (self.save_every
                                       and epoch % self.save_every == 0):
                            from vit_torch_tpu.checkpoint.orbax_io import (
                                save_checkpoint)
                            save_checkpoint(self.ckpt_dir, self.state, epoch,
                                            metrics={"val_acc": final["acc"]})
            # early stop (reference semantics; the --earlystop_epoch flag is
            # honored, fixing the reference's shadow-default bug)
            if should_early_stop(val_accs, self.earlystop_epoch):
                if self.print_progress:
                    print(f"\nearly stop at epoch {epoch}: no val improvement "
                          f"in {self.earlystop_epoch} epochs")
                break
        S.finish(save=True)
        return S
