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

import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

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


def _debug_eval_on() -> bool:
    """True when the VITX_DEBUG_EVAL=1 dump is requested (read per epoch
    so tests can toggle it without rebuilding the trainer)."""
    return os.environ.get("VITX_DEBUG_EVAL") == "1"


def _print_debug_eval(outputs: np.ndarray, labels: np.ndarray) -> None:
    """The reference's DEBUG eval dump (``utils_network.py:500-514``):
    shapes, host-recomputed accuracy, and a 20-wide pred-vs-true window."""
    print()
    print(f"got outputs shape {outputs.shape} and labels shape "
          f"{labels.shape}")
    print("acc: ", float(np.mean((outputs == labels).astype(np.int32))))
    print("examples:")
    print("output:", outputs[:20])
    print("label: ", labels[:20])


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
        fsdp: bool = False,
        augment_fn=None,
        eval_transform=None,
        ckpt_dir: str = "",
        save_every: int = 0,
        resume: str = "",
        pipe_microbatches: int = 0,
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
        self.augment_fn = augment_fn
        self.eval_transform = eval_transform
        self.seed = seed

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

        apply_fn = zoo_model.model.apply
        self.from_pipe = None
        if mesh is not None and mesh.shape.get("pipe", 1) > 1:
            # pipeline parallelism: re-lay the backbone into the stacked
            # stage-sharded form and swap in the GPipe apply_fn (importers /
            # checkpoints stay in the standard layout via from_pipe)
            from vit_torch_tpu.parallel.pipeline import zoo_pipeline_forms
            to_pipe, self.from_pipe, apply_fn = zoo_pipeline_forms(
                zoo_model, mesh, num_microbatches=pipe_microbatches or None)
            init_params = to_pipe(init_params)

        self.state: TrainState = create_train_state(
            state_rng, init_params, self.tx, lineareval=lineareval,
            model_state=model_state)
        self._apply_fn = apply_fn

        if mesh is not None:
            from vit_torch_tpu.parallel.api import shard_train_fns
            self.train_step, self.eval_step, self.state = shard_train_fns(
                apply_fn, self.tx, self.state, mesh,
                augment_fn=augment_fn, eval_transform=eval_transform,
                fsdp=fsdp)
        else:
            self.train_step = make_train_step(apply_fn, self.tx,
                                              augment_fn=augment_fn)
            self.eval_step = make_eval_step(apply_fn,
                                            eval_transform=eval_transform)

        # best-val tracking persists across resume: without re-seeding, the
        # first post-resume epoch would always rank as a fresh "best" and
        # could push the real best checkpoint toward max_to_keep eviction
        self.best_acc = -1.0
        if resume:
            from vit_torch_tpu.checkpoint.orbax_io import (
                best_saved_metric, latest_step, restore_checkpoint)
            if self.from_pipe is not None:
                # checkpoints are written in the standard layout (see
                # _ckpt_state); restore through a standard-layout template,
                # then re-stack onto this run's pipe shardings
                from vit_torch_tpu.parallel.pipeline import (
                    state_from_pipe, state_to_pipe)
                template = jax.eval_shape(state_from_pipe, self.state)
                restored = state_to_pipe(restore_checkpoint(resume, template))
                self.state = jax.device_put(
                    restored, jax.tree.map(lambda x: x.sharding, self.state))
            else:
                self.state = restore_checkpoint(resume, self.state)
            # resume at the epoch after the last completed one; the epoch
            # index is stored as the checkpoint step (note: step 0 is valid)
            last = latest_step(resume)
            self.start_epoch = (last if last is not None else -1) + 1
            prev_best = best_saved_metric(resume)
            if prev_best is not None:
                self.best_acc = prev_best
            if self.print_progress:
                print(f"resumed from {resume} at epoch {self.start_epoch}"
                      + (f" (best val_acc so far {prev_best:.4f})"
                         if prev_best is not None else ""))

    # ------------------------------------------------------------------
    def run_one_epoch(self, loader: Iterable, training: bool) -> Dict[str, float]:
        S = self.stats
        acc = init_metric_accumulator()
        lr = float(jax.device_get(
            self.state.opt_state.hyperparams["learning_rate"]))
        n_batches = len(loader) if hasattr(loader, "__len__") else None
        # VITX_DEBUG_EVAL=1: the reference's DEBUG eval path (dump
        # predicted-vs-true label windows + host-recomputed accuracy,
        # utils_network.py:500-514) — env-gated like its hardcoded flag
        debug_eval = not training and _debug_eval_on()
        dbg_out: list = []
        dbg_lab: list = []
        for i, batch in enumerate(loader):
            # count real samples from the mask (host-produced and tiny, so
            # np.asarray is cheap even for device arrays)
            host_mask = np.asarray(batch["mask"])
            valid = int(host_mask.sum())
            if debug_eval:
                host_label = np.asarray(batch["label"])
            batch = self._shard_batch(batch)
            if training:
                self.state, m = self.train_step(self.state, batch)
            else:
                m = self.eval_step(self.state, batch)
            if debug_eval:
                keep = host_mask.astype(bool)
                preds = np.asarray(self._predict_labels(batch))
                dbg_out.append(preds[keep])
                dbg_lab.append(host_label[keep])
            acc = accumulate_metrics(acc, m)
            S.update(sample_count=valid, lr=lr)
            if self.print_progress:
                S.print()
        if debug_eval and dbg_out:
            _print_debug_eval(np.concatenate(dbg_out),
                              np.concatenate(dbg_lab))
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

    def _predict_labels(self, batch):
        """Argmax class predictions for the debug-eval dump (jitted once)."""
        if not hasattr(self, "_debug_predict_fn"):
            apply_fn = self._apply_fn  # pipeline meshes swap in their own
            transform = self.eval_transform

            @jax.jit
            def predict(state, batch):
                images = batch["image"]
                if transform is not None:
                    images = transform(images)
                logits = apply_fn(state.variables(), images, True)
                return jnp.argmax(logits, axis=-1)

            self._debug_predict_fn = predict
        return self._debug_predict_fn(self.state, batch)

    # ------------------------------------------------------------------
    def _maybe_checkpoint(self, epoch: int, val_acc: float,
                          state: Optional[TrainState] = None) -> None:
        """Shared best/periodic checkpoint policy for both training loops.
        Saves to ``ckpt_dir`` (recency-retained, resume-from-latest) and
        mirrors new bests into ``ckpt_dir/best`` (max_to_keep=1) so the best
        weights survive recency eviction.  ``state`` overrides ``self.state``
        for paths whose live state is not the full checkpointable tree (the
        cached linear-eval loop)."""
        if not self.ckpt_dir:
            return
        is_best = val_acc > self.best_acc
        self.best_acc = max(self.best_acc, val_acc)
        if not (is_best or (self.save_every
                            and epoch % self.save_every == 0)):
            return
        from vit_torch_tpu.checkpoint.orbax_io import (
            BEST_SUBDIR, save_checkpoint)
        st = self.state if state is None else state
        if self.from_pipe is not None:
            # write checkpoints in the standard layout so they resume under
            # any mesh (and feed the importers/exporters unchanged); the
            # unstack is L cheap slices, paid only at save time
            from vit_torch_tpu.parallel.pipeline import state_from_pipe
            st = state_from_pipe(st)
        save_checkpoint(self.ckpt_dir, st, epoch,
                        metrics={"val_acc": val_acc})
        if is_best:
            save_checkpoint(os.path.join(self.ckpt_dir, BEST_SUBDIR), st,
                            epoch, metrics={"val_acc": val_acc},
                            max_to_keep=1)

    def _seed_val_accs(self) -> list:
        """Early-stop history seed: after resume the per-epoch history is
        gone, but including the best pre-resume accuracy keeps the
        no-improvement window honest (max(val_accs) spans the whole run)."""
        return [self.best_acc] if self.best_acc > -1.0 else []

    # ------------------------------------------------------------------
    def fit(self, loaders: Dict[str, Any]) -> Stats:
        S = self.stats
        val_accs = self._seed_val_accs()
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
                    self._maybe_checkpoint(epoch, final["acc"])
            # early stop (reference semantics; the --earlystop_epoch flag is
            # honored, fixing the reference's shadow-default bug)
            if should_early_stop(val_accs, self.earlystop_epoch):
                if self.print_progress:
                    print(f"\nearly stop at epoch {epoch}: no val improvement "
                          f"in {self.earlystop_epoch} epochs")
                break
        S.finish(save=True)
        return S

    # ------------------------------------------------------------------
    def fit_scan(self, sets: Dict[str, Any], batch_size: int) -> Stats:
        """Epoch-scan training (see ``train/scan.py``): the whole dataset is
        device-resident; each epoch's train and eval are ONE compiled
        dispatch each.  ``sets`` maps split → (uint8 images, labels)."""
        import jax.numpy as jnp
        from vit_torch_tpu.train.scan import (
            epoch_indices, make_scan_eval_fn, make_scan_train_fn)

        if self.from_pipe is not None:
            raise ValueError("epoch-scan mode does not pipeline; use the "
                             "per-step path (fit) with a pipe mesh")
        apply_fn = self.zoo_model.model.apply
        train_run = make_scan_train_fn(apply_fn, self.tx, self.augment_fn,
                                       mesh=self.mesh)
        eval_run = make_scan_eval_fn(apply_fn, self.eval_transform,
                                     with_preds=_debug_eval_on())
        device_sets = {
            split: (jnp.asarray(imgs), jnp.asarray(labels))
            for split, (imgs, labels) in sets.items()}
        return self._scan_epoch_loop(train_run, eval_run, device_sets,
                                     batch_size)

    def fit_lineareval_cached(self, sets: Dict[str, Any],
                              batch_size: int) -> Stats:
        """Cached-feature linear-eval: the frozen backbone runs ONCE over
        each split (device scan), then every epoch trains only the MLP head
        on the cached features — the reference's frozen-representation
        datasets (``utils_datasets.py:342-527``), which its active path never
        used (it recomputed frozen features every epoch,
        ``utils_network.py:413-415``).  Train-time random augmentation is
        skipped, exactly like the reference's cached datasets."""
        import jax.numpy as jnp
        from vit_torch_tpu.train.scan import (
            cache_backbone_features, make_scan_eval_fn, make_scan_train_fn)
        from vit_torch_tpu.train.steps import create_train_state

        assert self.lineareval, "fit_lineareval_cached requires lineareval"
        if self.from_pipe is not None:
            raise ValueError("cached lineareval does not pipeline; use the "
                             "per-step path (fit) with a pipe mesh")
        backbone = self.zoo_model.model.backbone
        head = self.zoo_model.model.head
        assert head is not None
        bb_params = self.state.frozen["backbone"]
        bb_state = {k: v["backbone"] for k, v in
                    self.state.model_state.items() if "backbone" in v}

        device_sets = {}
        for split, (imgs, labels) in sets.items():
            feats = cache_backbone_features(
                backbone.apply, bb_params, imgs, batch_size,
                self.eval_transform, model_state=bb_state)
            device_sets[split] = (feats, jnp.asarray(labels))

        def head_apply(variables, x, deterministic=True, **kw):
            return head.apply({"params": variables["params"]["head"]}, x)

        outer_state = self.state
        self.state = create_train_state(
            jax.random.fold_in(outer_state.rng, 1),
            {"head": outer_state.params["head"]}, self.tx, lineareval=False)
        train_run = make_scan_train_fn(head_apply, self.tx, None)
        eval_run = make_scan_eval_fn(head_apply, None,
                                     with_preds=_debug_eval_on())

        def ckpt_state() -> TrainState:
            # checkpoint the FULL lineareval state (frozen backbone + live
            # head + head opt_state), not the temporary head-only inner
            # state — saved checkpoints must stay structurally compatible
            # with the resume template built in __init__ (both optimizer
            # states cover the same {'head': ...} tree, so the transplant
            # is structural-identity)
            return outer_state.replace(
                params={**outer_state.params, **self.state.params},
                opt_state=self.state.opt_state, step=self.state.step)

        try:
            stats = self._scan_epoch_loop(train_run, eval_run, device_sets,
                                          batch_size, ckpt_state_fn=ckpt_state)
        finally:
            head_params = self.state.params["head"]
            self.state = outer_state.replace(
                params={**outer_state.params, "head": head_params})
        return stats

    def _scan_epoch_loop(self, train_run, eval_run, device_sets,
                         batch_size: int, ckpt_state_fn=None) -> Stats:
        from vit_torch_tpu.train.scan import epoch_indices
        rng = np.random.default_rng(self.seed)

        S = self.stats
        val_accs = self._seed_val_accs()
        for epoch in range(self.start_epoch, self.epochs):
            lr = self.base_lr * self.lr_factor_fn(epoch)
            self.state = set_learning_rate(self.state, lr)
            for split, training in (("train", True), ("val", False)):
                if split not in device_sets:
                    continue
                images, labels = device_sets[split]
                S.set_split(split)
                S.new_round(epoch)
                idx, msk = epoch_indices(len(labels), batch_size, rng,
                                         shuffle=training)
                if training:
                    self.state, m = train_run(self.state, images, labels,
                                              idx, msk)
                else:
                    m = eval_run(self.state, images, labels, idx, msk)
                    if isinstance(m, tuple):       # VITX_DEBUG_EVAL preds
                        m, preds = m
                        valid = np.asarray(msk).astype(bool)
                        _print_debug_eval(
                            np.asarray(preds)[valid],
                            np.asarray(labels)[np.asarray(idx)][valid])
                final = finalize_metrics(m)
                S.update(sample_count=int(final["count"]), lr=lr,
                         acc=final["acc"], loss=final["loss"])
                S.finish_round(save=True)
                if self.print_progress:
                    S.print(force=True, end="\n")
                if split == "val":
                    val_accs.append(final["acc"])
                    self._maybe_checkpoint(
                        epoch, final["acc"],
                        state=(ckpt_state_fn() if ckpt_state_fn else None))
            if should_early_stop(val_accs, self.earlystop_epoch):
                if self.print_progress:
                    print(f"\nearly stop at epoch {epoch}")
                break
        S.finish(save=True)
        return S
