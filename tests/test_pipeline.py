"""Pipeline parallelism (`parallel/pipeline.py`): GPipe schedule over the
``pipe`` mesh axis must be numerically identical to sequential block
application — forward, gradients, and a full train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.models.vit import ViTConfig, VisionTransformer
from vit_torch_tpu.parallel.mesh import make_mesh
from vit_torch_tpu.parallel.pipeline import (
    build_pipeline_classifier, merge_vit_params, pipeline_apply,
    split_vit_params, stack_params, unstack_params, vit_pipeline_features,
)

TINY = ViTConfig(patch_size=8, embed_dim=32, depth=4, num_heads=2)


def _mlp_block(p, x):
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def _mlp_params(rng, n_blocks, dim, hidden):
    keys = jax.random.split(rng, n_blocks)
    return [
        {
            "w1": jax.random.normal(k, (dim, hidden)) * 0.3,
            "b1": jnp.zeros((hidden,)),
            "w2": jax.random.normal(jax.random.fold_in(k, 1),
                                    (hidden, dim)) * 0.3,
        }
        for k in keys
    ]


def _sequential(blocks, x):
    for p in blocks:
        x = _mlp_block(p, x)
    return x


@pytest.mark.parametrize("mesh_spec,n_micro", [
    ("data=2,pipe=4", None),     # M defaults to n_stages
    ("data=2,pipe=4", 4),
    ("pipe=8", 2),               # pure pipeline, fewer microbatches
    ("data=8", None),            # pipe=1 degenerates to a plain scan
])
def test_pipeline_forward_matches_sequential(mesh_spec, n_micro):
    mesh = make_mesh(mesh_spec)
    rng = jax.random.PRNGKey(0)
    blocks = _mlp_params(rng, 8, 16, 32)
    stacked = stack_params(blocks)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 5, 16))

    out = jax.jit(lambda s, x: pipeline_apply(
        _mlp_block, s, x, mesh, num_microbatches=n_micro))(stacked, x)
    ref = _sequential(blocks, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match_sequential():
    mesh = make_mesh("data=2,pipe=4")
    rng = jax.random.PRNGKey(2)
    blocks = _mlp_params(rng, 4, 16, 32)
    stacked = stack_params(blocks)
    x = jax.random.normal(jax.random.PRNGKey(3), (8, 3, 16))

    def loss_pipe(s):
        return jnp.sum(pipeline_apply(_mlp_block, s, x, mesh) ** 2)

    def loss_seq(s):
        def body(c, p):
            return _mlp_block(p, c), None
        out, _ = jax.lax.scan(body, x, s)
        return jnp.sum(out ** 2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    g_seq = jax.jit(jax.grad(loss_seq))(stacked)
    for a, b in zip(jax.tree.leaves(g_pipe), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_stack_unstack_roundtrip():
    blocks = _mlp_params(jax.random.PRNGKey(4), 3, 8, 16)
    stacked = stack_params(blocks)
    back = unstack_params(stacked)
    assert len(back) == 3
    for a, b in zip(jax.tree.leaves(back[2]), jax.tree.leaves(blocks[2])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vit_pipeline_matches_full_model():
    mesh = make_mesh("data=2,pipe=4")
    model = VisionTransformer(TINY, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(6), x, True)
    ref = model.apply(variables, x, True)

    rest, blocks = split_vit_params(dict(variables["params"]), TINY.depth)
    out = jax.jit(lambda b, xx: vit_pipeline_features(
        TINY, rest, b, xx, mesh, dtype=jnp.float32))(blocks, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # param-tree interchange roundtrip (checkpoint compatibility)
    merged = merge_vit_params(rest, blocks)
    for a, b in zip(jax.tree.leaves(merged),
                    jax.tree.leaves(dict(variables["params"]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_classifier_trains_and_matches_dp_loss():
    mesh = make_mesh("data=2,pipe=4")
    params, opt_state, step = build_pipeline_classifier(
        TINY, num_classes=5, mesh=mesh, image_size=32, lr=1e-2)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 5, size=(8,))),
    }
    # the pipelined loss must equal the unpipelined forward's loss exactly
    model = VisionTransformer(TINY, dtype=jnp.float32)
    feats = model.apply(
        {"params": merge_vit_params(params["rest"],
                                    params["blocks"])}, batch["image"], True)
    logits = (np.asarray(feats, np.float32)
              @ np.asarray(params["head"]["kernel"])
              + np.asarray(params["head"]["bias"]))
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ref_loss = -logp[np.arange(8), np.asarray(batch["label"])].mean()

    p1, o1, loss1 = step(params, opt_state, batch)
    assert np.isfinite(float(loss1))
    np.testing.assert_allclose(float(loss1), ref_loss, rtol=1e-4)
    # blocks stay pipe-sharded through the step, and the loss goes down
    spec = p1["blocks"]["attn"]["qkv"]["kernel"].sharding.spec
    assert spec[0] == "pipe"
    _, _, loss2 = step(p1, o1, batch)
    assert float(loss2) < float(loss1)


def _trainer_losses(mesh_spec, steps=3, lineareval=False):
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.train.trainer import Trainer

    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    tr = Trainer(zm, lr=0.05, opt="sgd", lr_scheduler="none", image_size=16,
                 lineareval=lineareval, print_progress=False,
                 mesh=make_mesh(mesh_spec), seed=0)
    rng = np.random.default_rng(1)
    batch = {
        "image": rng.normal(0, 1, (8, 16, 16, 3)).astype(np.float32),
        "label": rng.integers(0, 10, 8).astype(np.int32),
        "mask": np.ones(8, np.float32),
    }
    losses = []
    state = tr.state
    for _ in range(steps):
        state, m = tr.train_step(state, tr._shard_batch(batch))
        losses.append(float(m["loss_sum"]))
    return losses, tr, state


def test_trainer_pipeline_matches_dp():
    """--mesh data=4,pipe=2 trains the zoo ViT identically to pure DP."""
    dp, _, _ = _trainer_losses("data=8")
    pp, tr, state = _trainer_losses("data=4,pipe=2")
    np.testing.assert_allclose(pp, dp, rtol=2e-4)
    assert pp[-1] < pp[0]
    # block stack is stage-sharded over pipe in params AND adamw-free sgd
    # state; checkpoint interchange restores the standard layout
    blocks = state.params["backbone"]["pipe_blocks"]
    assert blocks["attn"]["qkv"]["kernel"].sharding.spec[0] == "pipe"
    std = tr.from_pipe(state.params)
    assert "blocks_0" in std["backbone"] and "blocks_1" in std["backbone"]
    assert "pipe_blocks" not in std["backbone"]


def test_trainer_pipeline_lineareval():
    """Frozen pipelined backbone + trainable head under data×pipe."""
    losses, _, _ = _trainer_losses("data=4,pipe=2", lineareval=True)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pipeline_checkpoint_cross_mesh(tmp_path):
    """Checkpoints written under a pipe mesh use the standard layout and
    resume under any mesh — and standard checkpoints resume under pipe."""
    from vit_torch_tpu.parallel.pipeline import state_from_pipe, state_to_pipe

    _, tr, state = _trainer_losses("data=4,pipe=2", steps=2)
    tr.state = state
    ck = str(tmp_path / "ck")
    tr._maybe_checkpoint(0, val_acc=0.5)
    assert not tr.ckpt_dir  # default trainer has no ckpt_dir: no-op
    tr.ckpt_dir = ck
    tr._maybe_checkpoint(0, val_acc=0.5)

    # round-trip sanity of the layout converters on the live state
    std_state = state_from_pipe(state)
    assert "blocks_0" in std_state.params["backbone"]
    back = state_to_pipe(std_state)
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resume the pipe checkpoint under a pure-DP mesh (standard layout)
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.train.trainer import Trainer

    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=16, dtype=jnp.float32)
    tr_dp = Trainer(zm, lr=0.05, opt="sgd", lr_scheduler="none",
                    image_size=16, print_progress=False,
                    mesh=make_mesh("data=8"), seed=3, resume=ck)
    for a, b in zip(jax.tree.leaves(tr_dp.state.params),
                    jax.tree.leaves(std_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and resume the same (standard-layout) checkpoint under a pipe mesh
    tr_pp = Trainer(zm, lr=0.05, opt="sgd", lr_scheduler="none",
                    image_size=16, print_progress=False,
                    mesh=make_mesh("data=4,pipe=2"), seed=3, resume=ck)
    blocks = tr_pp.state.params["backbone"]["pipe_blocks"]
    assert blocks["attn"]["qkv"]["kernel"].sharding.spec[0] == "pipe"
    for a, b in zip(jax.tree.leaves(tr_pp.state.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipeline_shape_validation():
    mesh = make_mesh("data=2,pipe=4")
    blocks = stack_params(_mlp_params(jax.random.PRNGKey(7), 6, 8, 8))
    x = jnp.zeros((8, 2, 8))
    with pytest.raises(ValueError, match="stages"):
        pipeline_apply(_mlp_block, blocks, x, mesh)  # 6 % 4 != 0
    blocks4 = stack_params(_mlp_params(jax.random.PRNGKey(8), 4, 8, 8))
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(_mlp_block, blocks4, jnp.zeros((6, 2, 8)), mesh,
                       num_microbatches=4)  # local batch 3 % 4 != 0
