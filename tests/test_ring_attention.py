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
