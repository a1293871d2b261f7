"""Training checkpoint save/resume via orbax.

Net-new capability (SURVEY.md §5: the reference has **no** model checkpoint
saving or resume — ``save_on_master`` exists unused, DETR's ``--resume`` flag
is dead).  Saves the full TrainState (params, frozen, optimizer state, step,
rng) plus run metadata; restore rebuilds onto the current sharding layout
(orbax restores to the target shardings, so multi-chip resume works).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from vit_torch_tpu.train.steps import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    metrics: Optional[dict] = None,
                    max_to_keep: int = 3) -> None:
    with _manager(ckpt_dir, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, state_template: TrainState,
                       step: Optional[int] = None) -> TrainState:
    """Restore onto the template's shapes/dtypes/shardings."""
    with _manager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir!r}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
