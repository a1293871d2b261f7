"""GPipe-style pipeline parallelism over the ``pipe`` mesh axis.

SURVEY.md §2c scoped pipeline parallelism out of the parity surface (the
reference has no PP hooks and its models fit one chip); this module is the
beyond-reference extension that completes the parallelism matrix
(DP / TP / SP / FSDP / **PP**).

TPU-native design — one SPMD program, no per-stage processes:

- the per-block param trees are **stacked** on a leading layer axis and that
  axis is sharded over ``pipe``, so each device owns a contiguous *stage* of
  ``L/P`` blocks (and only its stage's optimizer moments under the same
  sharding — stage-local memory, the point of PP);
- inside ``shard_map`` the GPipe schedule is a ``lax.scan`` over
  ``M + P - 1`` ticks: every tick each stage applies its blocks to its
  current microbatch and hands the activation to the next stage with
  ``lax.ppermute`` over ICI;
- reverse-mode AD through the scan + ppermute yields the mirrored backward
  schedule automatically — one ``jax.grad`` trains the pipelined model with
  no hand-written backward plumbing (stage ``p`` receives its output
  cotangent from stage ``p+1`` through the transposed ppermute).

The schedule is plain GPipe (fill/drain bubble of ``P - 1`` ticks out of
``M + P - 1``); raise ``num_microbatches`` to amortize the bubble.  Blocks
must be architecturally identical across layers (true for every ViT-family
backbone here); per-layer *rates* such as stochastic-depth schedules are not
representable — pipeline paths run blocks deterministically or with a flat
rate, exactly like the stacked-scan epoch path in ``train/scan.py``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

PIPE_AXIS = "pipe"


def stack_params(trees) -> Any:
    """Stack per-block param trees into one tree with a leading layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def unstack_params(stacked) -> list:
    """Inverse of :func:`stack_params`."""
    L = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(L)]


def pipeline_specs(stacked, mesh: Mesh):
    """NamedShardings placing the stacked layer axis on ``pipe``."""
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P(PIPE_AXIS)), stacked)


def _stage_apply(block_fn, local_blocks, h):
    def body(c, p):
        return block_fn(p, c), None
    h, _ = jax.lax.scan(body, h, local_blocks)
    return h


def _pipe_shard(block_fn, n_stages: int, n_micro: int, local_blocks, x):
    """Per-device GPipe schedule (runs under shard_map).

    ``x``: this data-shard's activations, replicated over ``pipe``.
    ``local_blocks``: this stage's L/P blocks.
    """
    M, S = n_micro, n_stages
    idx = jax.lax.axis_index(PIPE_AXIS)
    last = S - 1
    mbs = x.reshape(M, x.shape[0] // M, *x.shape[1:])
    perm = [(i, (i + 1) % S) for i in range(S)]

    def tick(carry, t):
        circ, outs = carry
        # stage 0 feeds microbatch t (clipped past the drain window); other
        # stages consume what the previous stage ppermuted in last tick
        feed = jax.lax.dynamic_index_in_dim(
            mbs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
        h = jnp.where(idx == 0, feed, circ)
        h = _stage_apply(block_fn, local_blocks, h)
        # the last stage banks finished microbatch t - (S - 1)
        done = jnp.logical_and(idx == last, t >= last)
        oi = jnp.clip(t - last, 0, M - 1)
        outs = jnp.where(
            done,
            jax.lax.dynamic_update_index_in_dim(outs, h, oi, 0),
            outs)
        circ = jax.lax.ppermute(h, PIPE_AXIS, perm)
        return (circ, outs), None

    # the schedule's carries vary over pipe (each stage holds a different
    # microbatch); mark the zero-initialized carries as pipe-varying so the
    # scan's VMA types line up
    def _vary(a):
        return jax.lax.pcast(a, (PIPE_AXIS,), to="varying")

    circ0 = _vary(jnp.zeros_like(mbs[0]))
    outs0 = _vary(jnp.zeros_like(mbs))
    (_, outs), _ = jax.lax.scan(tick, (circ0, outs0),
                                jnp.arange(M + S - 1))
    # results live on the last stage only; psum over ``pipe`` replicates
    # them (every other stage contributes zeros)
    outs = jax.lax.psum(
        jnp.where(idx == last, outs, jnp.zeros_like(outs)), PIPE_AXIS)
    return outs.reshape(x.shape)


def pipeline_apply(block_fn: Callable, stacked, x: jax.Array, mesh: Mesh,
                   *, num_microbatches: Optional[int] = None,
                   batch_axis: str = "data") -> jax.Array:
    """Apply ``L`` stacked blocks to ``x`` pipelined over ``mesh['pipe']``.

    ``block_fn(params_one_block, x) -> x`` must be shape-preserving and
    identical across layers.  ``stacked`` is a param tree with leading layer
    axis ``L`` (``L % pipe == 0``); ``x`` is ``(B, ...)`` with ``B`` sharded
    over ``batch_axis``.  Numerically identical to applying the blocks
    sequentially (tested); with ``pipe == 1`` it lowers to a plain scan.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    L = jax.tree.leaves(stacked)[0].shape[0]
    if n_stages == 1:
        return _stage_apply(block_fn, stacked, x)
    if L % n_stages:
        raise ValueError(f"{L} blocks not divisible into {n_stages} stages")
    M = num_microbatches or n_stages
    b_local = x.shape[0] // mesh.shape[batch_axis]
    if b_local % M:
        raise ValueError(
            f"per-shard batch {b_local} not divisible into {M} microbatches")
    fn = functools.partial(_pipe_shard, block_fn, int(n_stages), int(M))
    return shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(PIPE_AXIS), stacked),
                  P(batch_axis)),
        out_specs=P(batch_axis),
    )(stacked, x)


# --------------------------------------------------------------------------
# ViT integration: run a VisionTransformer's blocks through the pipeline
# --------------------------------------------------------------------------

def split_vit_params(params: dict, depth: int):
    """Split a ``VisionTransformer`` param tree into (rest, stacked_blocks)."""
    blocks = stack_params([params[f"blocks_{i}"] for i in range(depth)])
    rest = {k: v for k, v in params.items() if not k.startswith("blocks_")}
    return rest, blocks


def merge_vit_params(rest: dict, blocks) -> dict:
    """Inverse of :func:`split_vit_params` (for checkpoint interchange)."""
    out = dict(rest)
    for i, tree in enumerate(unstack_params(blocks)):
        out[f"blocks_{i}"] = tree
    return out


def _is_pipe_backbone(x) -> bool:
    return isinstance(x, dict) and set(x) == {"rest", "pipe_blocks"}


def _is_std_backbone(x) -> bool:
    return isinstance(x, dict) and "blocks_0" in x


def state_from_pipe(tree):
    """Re-lay every pipe-form backbone inside ``tree`` into the standard
    layout.  Works on whole ``TrainState``s (params, frozen, and the
    optimizer moments all carry params-shaped subtrees) — this is the
    checkpoint-interchange direction: orbax checkpoints are always written
    in the standard layout so they resume under any mesh.
    """
    def fix(x):
        return (merge_vit_params(dict(x["rest"]), x["pipe_blocks"])
                if _is_pipe_backbone(x) else x)
    return jax.tree.map(fix, tree, is_leaf=_is_pipe_backbone)


def state_to_pipe(tree):
    """Inverse of :func:`state_from_pipe`: re-lay every standard-layout
    backbone inside ``tree`` into the stacked pipeline form (depth inferred
    from the ``blocks_i`` keys present)."""
    def fix(x):
        if _is_std_backbone(x):
            depth = sum(1 for k in x if k.startswith("blocks_"))
            rest, blocks = split_vit_params(dict(x), depth)
            return {"rest": rest, "pipe_blocks": blocks}
        return x
    return jax.tree.map(fix, tree, is_leaf=_is_std_backbone)


def vit_pipeline_features(config, rest: dict, blocks, x: jax.Array,
                          mesh: Mesh, *, num_microbatches: Optional[int] = None,
                          dtype=jnp.bfloat16,
                          return_all_tokens: bool = False) -> jax.Array:
    """``VisionTransformer`` forward with the block stack pipelined.

    Embed / norm / readout run as plain GSPMD ops (batch-sharded over
    ``data``, replicated over ``pipe``); only the L transformer blocks ride
    the pipeline.  Matches ``VisionTransformer.apply`` exactly in
    deterministic mode (stochastic-depth schedules are per-layer and cannot
    ride a shared-stage pipeline — see module docstring).
    """
    from vit_torch_tpu.models.layers import Block, LayerNorm, PatchEmbed

    if config.drop_rate or config.attn_drop_rate or config.drop_path_rate:
        # same contract zoo_pipeline_forms enforces: the shared-stage
        # pipeline runs blocks deterministically, so silently dropping the
        # regularization would train a different model
        raise ValueError(
            "pipeline parallelism runs blocks deterministically; nonzero "
            "drop/droppath rates are not representable (see pipeline.py)")
    B = x.shape[0]
    h = PatchEmbed(config.patch_size, config.embed_dim, dtype=dtype).apply(
        {"params": rest["patch_embed"]}, x)
    cls = jnp.broadcast_to(rest["cls_token"].astype(dtype),
                           (B, 1, config.embed_dim))
    h = jnp.concatenate([cls, h], axis=1)
    h = h + rest["pos_embed"].astype(dtype)
    block = Block(config.num_heads, mlp_ratio=config.mlp_ratio,
                  qkv_bias=config.qkv_bias, dtype=dtype)

    def block_fn(p, a):
        return block.apply({"params": p}, a, True)

    h = pipeline_apply(block_fn, blocks, h, mesh,
                       num_microbatches=num_microbatches)
    # ViT-family final norm uses eps 1e-6 (models/vit.py, reference
    # vision_all.py:330) — must match the full model exactly
    h = LayerNorm(epsilon=1e-6, dtype=dtype).apply(
        {"params": rest["norm"]}, h)
    return h if return_all_tokens else h[:, 0]


def zoo_pipeline_forms(zoo_model, mesh: Mesh, *,
                       num_microbatches: Optional[int] = None):
    """Make a ViT-family ``ZooModel`` trainable under a ``pipe`` mesh axis.

    Returns ``(to_pipe, from_pipe, apply_fn)``:

    - ``to_pipe(params)`` re-lays the standard ``{'backbone', 'head'}`` tree
      into the pipeline form — ``backbone = {'rest', 'pipe_blocks'}`` with
      the L blocks stacked on a leading layer axis (``partition.py`` rules
      stage-shard ``pipe_blocks`` over ``pipe``);
    - ``from_pipe(params)`` is the exact inverse (checkpoint interchange —
      torch importers and orbax trees stay in the standard layout);
    - ``apply_fn(variables, x, deterministic, rngs=None, mutable=None)`` is
      a drop-in for ``zoo_model.model.apply`` that routes the block stack
      through :func:`pipeline_apply`.

    Only architecturally-uniform, rate-free ViTs pipeline (see module
    docstring): nonzero drop/droppath rates are rejected.
    """
    from vit_torch_tpu.models.vit import VisionTransformer

    backbone = zoo_model.model.backbone
    if not isinstance(backbone, VisionTransformer):
        raise ValueError(
            f"pipeline parallelism supports plain ViT backbones; "
            f"{zoo_model.arch!r} has {type(backbone).__name__}")
    config = backbone.config
    if config.drop_rate or config.attn_drop_rate or config.drop_path_rate:
        raise ValueError(
            "pipeline parallelism runs blocks deterministically; nonzero "
            "drop/droppath rates are not representable (see pipeline.py)")
    if config.depth % mesh.shape[PIPE_AXIS]:
        raise ValueError(
            f"depth {config.depth} not divisible into "
            f"{mesh.shape[PIPE_AXIS]} pipeline stages")
    head = zoo_model.model.head
    dtype = backbone.dtype

    def to_pipe(params):
        rest, blocks = split_vit_params(dict(params["backbone"]),
                                        config.depth)
        out = dict(params)
        out["backbone"] = {"rest": rest, "pipe_blocks": blocks}
        return out

    def from_pipe(params):
        bb = params["backbone"]
        out = dict(params)
        out["backbone"] = merge_vit_params(dict(bb["rest"]),
                                           bb["pipe_blocks"])
        return out

    def apply_fn(variables, x, deterministic=True, rngs=None, mutable=None):
        del rngs  # rate-free (asserted above): no dropout streams to thread
        bb = variables["params"]["backbone"]
        feats = vit_pipeline_features(
            config, bb["rest"], bb["pipe_blocks"], x, mesh,
            num_microbatches=num_microbatches, dtype=dtype)
        if head is not None and "head" in variables["params"]:
            feats = head.apply(
                {"params": variables["params"]["head"]}, feats)
        if mutable:
            return feats, {}
        return feats

    return to_pipe, from_pipe, apply_fn


def build_pipeline_classifier(config, num_classes: int, mesh: Mesh, *,
                              image_size: int, lr: float = 1e-3,
                              num_microbatches: Optional[int] = None,
                              dtype=jnp.float32, seed: int = 0):
    """A complete pipeline-parallel ViT classifier training setup.

    Returns ``(params, opt_state, step)`` where ``params['blocks']`` is the
    stacked block tree sharded over ``pipe`` (stage-local weights + adamw
    moments) and ``step(params, opt_state, batch) -> (params, opt_state,
    loss)`` is one jitted SPMD train step over a ``data × pipe`` mesh.
    """
    import optax
    from vit_torch_tpu.models.vit import VisionTransformer

    model = VisionTransformer(config, dtype=dtype)
    rng = jax.random.PRNGKey(seed)
    k_m, k_h = jax.random.split(rng)
    dummy = jnp.zeros((1, image_size, image_size, 3), dtype)
    variables = model.init(k_m, dummy, True)
    rest, blocks = split_vit_params(dict(variables["params"]), config.depth)
    head = {
        "kernel": jax.random.normal(k_h, (config.embed_dim, num_classes),
                                    jnp.float32) * 0.02,
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }
    params = {"rest": rest, "blocks": blocks, "head": head}
    tx = optax.adamw(lr)
    opt_state = tx.init(params)

    repl = NamedSharding(mesh, P())
    pipe = NamedSharding(mesh, P(PIPE_AXIS))
    data = NamedSharding(mesh, P("data"))

    def param_shardings(tree):
        return {
            "rest": jax.tree.map(lambda _: repl, tree["rest"]),
            "blocks": jax.tree.map(lambda _: pipe, tree["blocks"]),
            "head": jax.tree.map(lambda _: repl, tree["head"]),
        }

    p_shard = param_shardings(params)
    o_shard = jax.tree.map(
        lambda x: (param_shardings(x) if isinstance(x, dict)
                   and set(x) == {"rest", "blocks", "head"} else repl),
        opt_state, is_leaf=lambda x: isinstance(x, dict)
        and set(x) == {"rest", "blocks", "head"})
    b_shard = {"image": data, "label": data}
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, o_shard)

    def loss_fn(p, batch):
        from vit_torch_tpu.train.steps import cross_entropy_loss

        feats = vit_pipeline_features(
            config, p["rest"], p["blocks"], batch["image"], mesh,
            num_microbatches=num_microbatches, dtype=dtype)
        logits = (jnp.dot(feats.astype(jnp.float32), p["head"]["kernel"])
                  + p["head"]["bias"])
        mask = batch.get("mask", jnp.ones(logits.shape[0], jnp.float32))
        return cross_entropy_loss(logits, batch["label"], mask)

    def step(p, o, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    step_jit = jax.jit(step,
                       in_shardings=(p_shard, o_shard, b_shard),
                       out_shardings=(p_shard, o_shard, repl),
                       donate_argnums=(0, 1))
    return params, opt_state, step_jit
