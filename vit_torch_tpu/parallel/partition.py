"""Parameter partition rules for tensor parallelism.

Path-pattern → ``PartitionSpec`` rules applied over the param pytree.  With
``jax.jit`` + GSPMD these annotations are all that's needed — XLA inserts the
all-reduces (over ICI) at the row-sharded projections.

Scheme (Megatron-style column→row pairing, per block):
- attention ``qkv``  kernel ``(C, 3C)``  → shard output dim on ``model`` (column)
- attention ``proj`` kernel ``(C, C)``   → shard input dim on ``model`` (row)
- MLP ``fc1`` kernel ``(C, 4C)``         → column
- MLP ``fc2`` kernel ``(4C, C)``         → row
- biases of column-sharded layers follow their outputs; everything else
  (norms, embeddings, heads) is replicated.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins; paths are '/'-joined key strings
DEFAULT_RULES: Tuple[Tuple[str, P], ...] = (
    # stacked pipeline blocks (parallel/pipeline.py): leading layer axis is
    # stage-sharded over 'pipe'; TP does not compose inside the pipeline's
    # shard_map region, so block params carry no 'model' axis
    (r".*/pipe_blocks/.*", P("pipe")),
    (r".*/attn/qkv/kernel$", P(None, "model")),
    (r".*/attn/qkv/bias$", P("model")),
    (r".*/attn/proj/kernel$", P("model", None)),
    (r".*/attn/proj/bias$", P()),
    (r".*/mlp/fc1/kernel$", P(None, "model")),
    (r".*/mlp/fc1/bias$", P("model")),
    (r".*/mlp/fc2/kernel$", P("model", None)),
    (r".*/mlp/fc2/bias$", P()),
    # CaiT talking-heads / class-attention projections
    (r".*/attn/(q|k|v)/kernel$", P(None, "model")),
    (r".*/attn/(q|k|v)/bias$", P("model")),
    (r".*", P()),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def partition_specs(params: Any, rules=DEFAULT_RULES) -> Any:
    """Map a param pytree to a pytree of PartitionSpecs by path rules."""

    def spec_for(path, leaf):
        s = _path_str(path)
        for pattern, spec in rules:
            if re.match(pattern, s):
                # drop axes that exceed the leaf's rank or don't divide the dim
                if len(spec) > leaf.ndim:
                    return P()
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def validate_divisibility(params: Any, specs: Any, mesh: Mesh,
                          warn: bool = True) -> Any:
    """Downgrade any spec whose sharded dim doesn't divide by the axis size
    (e.g. head counts not divisible by the model axis) to replicated.

    Downgrades are **logged** (one warning listing every affected path) so
    silently losing TP coverage is visible.  Note the kernels are sharded on
    raw channel dims (``3C``/``4C``), not head counts — Swin's odd head
    counts (3, 6, 12, 24 with C = 96·2^i) stay divisible for any power-of-2
    model axis up to 8; GSPMD reshards at the per-head reshape when a shard
    crosses a head boundary (a perf note, not a correctness issue)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    downgraded = []

    def check(path, leaf, spec):
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = axis_sizes.get(axis, 1)
            if leaf.shape[dim] % size != 0:
                downgraded.append(
                    f"{_path_str(path)}: dim {dim} of {tuple(leaf.shape)} "
                    f"not divisible by {axis}={size}")
                return P()
        return spec

    out = jax.tree_util.tree_map_with_path(
        check, params, specs, is_leaf=lambda x: isinstance(x, P))
    if downgraded and warn:
        import warnings
        warnings.warn(
            "tensor-parallel sharding downgraded to replicated for "
            f"{len(downgraded)} parameter(s):\n  " + "\n  ".join(downgraded),
            stacklevel=2)
    return out


def add_fsdp_axis(params: Any, specs: Any, mesh: Mesh, axis: str = "data",
                  min_size: int = 2 ** 16) -> Any:
    """ZeRO-3 / FSDP sharding: additionally shard each large parameter over
    the ``data`` mesh axis so params + optimizer moments cost 1/Nth of HBM
    per chip.  GSPMD then inserts the per-layer weight all-gather in the
    forward/backward and emits the gradient reduction as a reduce-scatter —
    the standard FSDP schedule, expressed purely as sharding annotations
    (scaling-book recipe; no NCCL-style process groups as in the reference's
    dormant DDP hooks, ``object/torch_utils.py:244-310``).

    For every leaf with ≥ ``min_size`` elements, the largest dim that is
    (a) not already sharded by the TP rules and (b) divisible by the axis
    size gets ``axis`` appended to its spec.  Small leaves (norm scales,
    biases) stay replicated — gathering them costs more than it saves.
    """
    size = dict(zip(mesh.axis_names, mesh.devices.shape)).get(axis, 1)
    if size <= 1:
        return specs

    def upgrade(leaf, spec):
        shape = getattr(leaf, "shape", ())
        n = getattr(leaf, "size", 0)
        if not shape or n < min_size:
            return spec
        if "pipe" in spec:
            # pipeline-stage params enter a shard_map region that requires
            # them replicated over every axis but 'pipe' — no FSDP on top
            return spec
        parts = list(spec) + [None] * (len(shape) - len(spec))
        # largest free, divisible dim
        best = None
        for dim, d in enumerate(shape):
            if parts[dim] is None and d % size == 0:
                if best is None or d > shape[best]:
                    best = dim
        if best is None:
            return spec
        parts[best] = axis
        return P(*parts)

    return jax.tree_util.tree_map(upgrade, params, specs)


def named_shardings(params: Any, mesh: Mesh, rules=DEFAULT_RULES,
                    fsdp: bool = False, fsdp_min_size: int = 2 ** 16) -> Any:
    specs = validate_divisibility(params, partition_specs(params, rules), mesh)
    if fsdp:
        specs = add_fsdp_axis(params, specs, mesh, min_size=fsdp_min_size)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P))
