"""Multi-host initialization and rank utilities.

Replaces the reference's NCCL process-group plumbing
(``object/torch_utils.py:244-310``: env/SLURM rank discovery →
``init_process_group('nccl')`` → barrier → rank-0 print filtering,
``save_on_master``): on TPU pods, ``jax.distributed.initialize()`` discovers
the topology from the runtime, and collectives ride ICI inside compiled
programs — there is no backend selection and no rank env plumbing to do.
"""

from __future__ import annotations

import builtins
import functools
from typing import Any, Callable, Optional

import jax


def init_distributed_mode(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None,
                          filter_print: bool = True) -> dict:
    """Initialize multi-host JAX (no-op on a single process, like the
    reference's world_size-1 guard).  Returns topology info."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    info = {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    if filter_print and info["world_size"] > 1:
        setup_for_distributed(info["rank"] == 0)
    return info


def is_main_process() -> bool:
    return jax.process_index() == 0


def setup_for_distributed(is_master: bool) -> None:
    """Rank-0-only printing (reference ``torch_utils.py:244-256``)."""
    builtin_print = builtins.print

    def print_fn(*args, force: bool = False, **kwargs):
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_fn


def save_on_master(save_fn: Callable, *args: Any, **kwargs: Any) -> None:
    """Run a save callback on process 0 only (reference
    ``save_on_master``, ``torch_utils.py:283-285``)."""
    if is_main_process():
        save_fn(*args, **kwargs)


def all_gather_objects(obj: Any) -> list:
    """Gather arbitrary picklable objects from all processes (the
    reference's pickle ``all_gather``, ``torch_utils.py:77-117``)."""
    import json

    import numpy as np
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = np.frombuffer(json.dumps(obj).encode(), np.uint8)
    gathered = multihost_utils.process_allgather(payload)
    return [json.loads(bytes(buf).decode()) for buf in gathered]
