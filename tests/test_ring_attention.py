"""Ring attention vs full attention on the simulated 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.ops.attention import _xla_attention
from vit_torch_tpu.ops.ring_attention import ring_attention
from vit_torch_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("seq_devices", [4, 8])
def test_ring_matches_full_attention(seq_devices):
    mesh = make_mesh(f"seq={seq_devices}",
                     devices=jax.devices()[:seq_devices])
    rng = np.random.default_rng(0)
    B, N, H, D = 2, 8 * seq_devices, 3, 16
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
               for _ in range(3))
    out = ring_attention(q, k, v, mesh)
    ref = _xla_attention(q, k, v, scale=D ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_single_device_fallback():
    mesh = make_mesh("seq=1", devices=jax.devices()[:1])
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (1, 16, 2, 8)), jnp.float32)
               for _ in range(3))
    out = ring_attention(q, k, v, mesh)
    ref = _xla_attention(q, k, v, scale=8 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_ring_differentiable():
    mesh = make_mesh("seq=4", devices=jax.devices()[:4])
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (1, 16, 2, 8)), jnp.float32)
               for _ in range(3))

    def loss_ring(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale=8 ** -0.5) ** 2)

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3)


def test_ring_padded_uneven_sequence():
    """Token counts that don't divide the seq axis (e.g. ViT's N = P²+1)
    are padded and the padded keys masked out."""
    mesh = make_mesh("seq=4", devices=jax.devices()[:4])
    rng = np.random.default_rng(2)
    B, N, H, D = 2, 17, 2, 8          # 17 % 4 != 0
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, N, H, D)), jnp.float32)
               for _ in range(3))
    out = ring_attention(q, k, v, mesh)
    ref = _xla_attention(q, k, v, scale=D ** -0.5)
    assert out.shape == (B, N, H, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_sequence_parallel_dispatch_context():
    from vit_torch_tpu.ops.attention import (
        dot_product_attention, sequence_parallel)
    mesh = make_mesh("seq=4", devices=jax.devices()[:4])
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(0, 1, (1, 16, 2, 8)), jnp.float32)
               for _ in range(3))
    with sequence_parallel(mesh):
        out = dot_product_attention(q, k, v)
    ref = _xla_attention(q, k, v, scale=8 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)


def test_seq_parallel_training_matches_seq1():
    """A ViT train step on a seq=2 mesh (ring attention in fwd+bwd) matches
    the seq=1 run to tolerance — VERDICT round-1 item 7."""
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.parallel.api import shard_batch, shard_train_fns
    from vit_torch_tpu.train import create_train_state, get_optimizer

    def run(mesh_spec, n_devices):
        mesh = make_mesh(mesh_spec, devices=jax.devices()[:n_devices])
        zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                      image_size=16, dtype=jnp.float32)
        variables = zm.init(jax.random.PRNGKey(0), image_size=16)
        tx = get_optimizer("sgd", lr=0.05)
        state = create_train_state(jax.random.PRNGKey(1),
                                   variables["params"], tx)
        train_step, _, state = shard_train_fns(zm.model.apply, tx, state,
                                               mesh)
        rng = np.random.default_rng(0)
        batch = shard_batch({
            "image": rng.normal(0, 1, (8, 16, 16, 3)).astype(np.float32),
            "label": rng.integers(0, 10, 8).astype(np.int32),
            "mask": np.ones(8, np.float32)}, mesh)
        losses = []
        for _ in range(3):
            state, m = train_step(state, batch)
            losses.append(float(m["loss_sum"]) / float(m["count"]))
        return losses

    # vit_tiny_test @16px: N = 4 + 1 CLS = 5 tokens -> padded ring
    losses_sp = run("data=2,seq=2", 4)
    losses_1 = run("data=2", 2)
    np.testing.assert_allclose(losses_sp, losses_1, rtol=2e-4)
    assert losses_sp[-1] < losses_sp[0]
