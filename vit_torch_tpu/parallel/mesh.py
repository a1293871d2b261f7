"""Device mesh construction.

The TPU-native replacement for the reference's dormant
``torch.distributed``/NCCL plumbing (``object/torch_utils.py:288-310``):
instead of rank/world-size process groups, a single SPMD program over a
``jax.sharding.Mesh`` whose axes are

- ``data``  — batch (data parallel; gradient psum rides ICI)
- ``model`` — tensor parallel (QKV/MLP column/row sharding)
- ``seq``   — sequence/context parallel (reserved; ring attention extension)
- ``pipe``  — pipeline parallel (GPipe microbatch schedule, ``pipeline.py``)

``make_mesh('')`` puts every device on ``data`` — the reference's only real
multi-chip need (SURVEY.md §2c).  ``make_mesh('data=4,model=2')`` etc. carve
the device set explicitly.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "model", "seq", "pipe")


def parse_mesh_spec(spec: str, n_devices: int) -> Tuple[int, int, int, int]:
    """``'data=4,model=2'`` → (4, 2, 1, 1); '' → (n_devices, 1, 1, 1).

    A single ``-1`` entry absorbs the remaining devices.
    """
    sizes = {"data": 0, "model": 0, "seq": 0, "pipe": 0}
    if spec:
        for part in spec.split(","):
            k, _, v = part.partition("=")
            k = k.strip()
            if k not in sizes:
                raise ValueError(f"unknown mesh axis {k!r}; have {AXES}")
            sizes[k] = int(v)
    fixed = {k: v for k, v in sizes.items() if v > 0}
    n_fixed = math.prod(fixed.values()) if fixed else 1
    wild = [k for k, v in sizes.items() if v == -1]
    if len(wild) > 1:
        raise ValueError("at most one -1 axis allowed")
    for k in AXES:  # unspecified axes default to 1
        if sizes[k] == 0:
            sizes[k] = 1
    if wild:
        if n_devices % n_fixed:
            raise ValueError(f"{n_devices} devices not divisible by {n_fixed}")
        sizes[wild[0]] = n_devices // n_fixed
    elif not spec:
        sizes["data"] = n_devices
    total = math.prod(sizes[k] for k in AXES)
    if total != n_devices:
        raise ValueError(
            f"mesh {sizes} needs {total} devices, have {n_devices}")
    return tuple(sizes[k] for k in AXES)


def make_mesh(spec: str = "", devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = parse_mesh_spec(spec, len(devices))
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, AXES)
