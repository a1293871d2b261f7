"""Dynamic W8A8 int8 serving path (``ops/quant.py`` + the ``VITX_W8A8=1``
dispatch in ``models/layers.py``).

Covers: quantizer error bounds, exactness on int8-representable grids,
Mlp/Attention module parity within int8 tolerance, whole-model logits
agreement, and the inference-only guard (the training path must bypass
quantization — ``round`` has a zero gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.ops.quant import (
    quantize_rowwise, quantize_weight, w8a8_dot, w8a8_enabled)


def test_quantize_rowwise_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 3.0, (17, 96)), jnp.float32)
    x_q, scale = quantize_rowwise(x)
    assert x_q.dtype == jnp.int8 and scale.shape == (17, 1)
    err = np.abs(np.asarray(x_q, np.float32) * np.asarray(scale)
                 - np.asarray(x))
    # symmetric rounding: at most half a quantization step per element
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()


def test_quantize_weight_per_channel():
    rng = np.random.default_rng(1)
    # columns with wildly different magnitudes — per-channel scales must
    # keep the small column accurate
    w = np.concatenate([rng.normal(0, 100.0, (64, 8)),
                        rng.normal(0, 0.01, (64, 8))], axis=1)
    w_q, scale = quantize_weight(jnp.asarray(w, jnp.float32))
    assert scale.shape == (16,)
    deq = np.asarray(w_q, np.float32) * np.asarray(scale)
    err = np.abs(deq - w)
    assert (err <= np.asarray(scale) / 2 + 1e-6).all()


def test_w8a8_dot_exact_on_representable_grid():
    """Inputs already on the int8 grid pass through losslessly."""
    rng = np.random.default_rng(2)
    xi = rng.integers(-127, 128, (11, 32)).astype(np.float32)
    wi = rng.integers(-127, 128, (32, 24)).astype(np.float32)
    # absmax 127 in every row/col so scale is exactly 1 (+eps)
    xi[:, 0] = 127.0
    wi[0, :] = 127.0
    got = w8a8_dot(jnp.asarray(xi), jnp.asarray(wi), out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), xi @ wi, rtol=1e-4)


def test_w8a8_dot_relative_error():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (128, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (96, 160)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (160,)), jnp.float32)
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    got = np.asarray(w8a8_dot(x, w, b, out_dtype=jnp.float32))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    # 3D activations (B, N, C) contract correctly too
    x3 = x.reshape(4, 32, 96)
    got3 = np.asarray(w8a8_dot(x3, w, b, out_dtype=jnp.float32))
    np.testing.assert_allclose(got3.reshape(128, 160), got, rtol=1e-5)


def test_flag_dispatch(monkeypatch):
    from vit_torch_tpu.models.layers import _use_w8a8
    monkeypatch.setenv("VITX_W8A8", "")
    assert not w8a8_enabled() and not _use_w8a8(True)
    monkeypatch.setenv("VITX_W8A8", "1")
    assert w8a8_enabled()
    assert _use_w8a8(True)
    assert not _use_w8a8(False)      # training never quantizes


@pytest.mark.parametrize("bhnd", [False, True])
def test_attention_module_w8a8_parity(monkeypatch, bhnd):
    from vit_torch_tpu.models.layers import Attention
    x = jnp.asarray(np.random.default_rng(5).normal(0, 1, (2, 37, 128)),
                    jnp.float32)
    m = Attention(num_heads=4, dtype=jnp.float32)
    monkeypatch.setenv("VITX_W8A8", "")
    monkeypatch.setenv("VITX_ATTN_BHND", "0")
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(m.apply({"params": params}, x))
    monkeypatch.setenv("VITX_W8A8", "1")
    monkeypatch.setenv("VITX_ATTN_BHND", "1" if bhnd else "0")
    got = np.asarray(m.apply({"params": params}, x))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, (bhnd, rel)


def test_mlp_module_w8a8_parity(monkeypatch):
    from vit_torch_tpu.models.layers import Mlp
    x = jnp.asarray(np.random.default_rng(6).normal(0, 1, (2, 19, 64)),
                    jnp.float32)
    m = Mlp(hidden_dim=256, dtype=jnp.float32)
    monkeypatch.setenv("VITX_W8A8", "")
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(m.apply({"params": params}, x))
    monkeypatch.setenv("VITX_W8A8", "1")
    got = np.asarray(m.apply({"params": params}, x))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel


def test_train_path_bypasses_quant(monkeypatch):
    """deterministic=False under the flag == the unquantized forward, and
    gradients flow (round's zero gradient never enters the train graph)."""
    from vit_torch_tpu.models.layers import Mlp
    x = jnp.asarray(np.random.default_rng(7).normal(0, 1, (3, 16)),
                    jnp.float32)
    m = Mlp(hidden_dim=32, dtype=jnp.float32)
    monkeypatch.setenv("VITX_W8A8", "")
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(m.apply({"params": params}, x, False,
                             rngs={"dropout": jax.random.PRNGKey(1)}))
    monkeypatch.setenv("VITX_W8A8", "1")
    got = np.asarray(m.apply({"params": params}, x, False,
                             rngs={"dropout": jax.random.PRNGKey(1)}))
    np.testing.assert_array_equal(got, ref)

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x, False,
                               rngs={"dropout": jax.random.PRNGKey(1)}) ** 2)

    g = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(leaf)) for leaf in jax.tree.leaves(g)]
    assert all(np.isfinite(norms)) and max(norms) > 0


def test_detr_w8a8_parity(monkeypatch):
    """DETR transformer under the int8 flag: identical param tree, close
    predictions at eval, and the flag must not perturb the TRAIN forward
    (deterministic=False)."""
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                     num_heads=4, enc_layers=1, dec_layers=2, ffn_dim=64)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(9).normal(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    monkeypatch.setenv("VITX_W8A8", "")
    variables = model.init(jax.random.PRNGKey(0), x, True)
    ref = model.apply(variables, x, True)
    monkeypatch.setenv("VITX_W8A8", "1")
    # param tree unchanged under the flag (QDense keeps Dense's layout)
    v2 = model.init(jax.random.PRNGKey(0), x, True)
    assert jax.tree.map(lambda a: a.shape, v2) == \
        jax.tree.map(lambda a: a.shape, variables)
    got = model.apply(variables, x, True)
    for k in ("pred_logits", "pred_boxes"):
        r, g = np.asarray(ref[k]), np.asarray(got[k])
        rel = np.linalg.norm(g - r) / (np.linalg.norm(r) + 1e-9)
        assert rel < 0.08, (k, rel)
    # train-mode forward bypasses quantization entirely
    rngs = {"dropout": jax.random.PRNGKey(1)}
    t_ref = model.apply(variables, x, False, rngs=rngs)
    monkeypatch.setenv("VITX_W8A8", "")
    t_plain = model.apply(variables, x, False, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(t_ref["pred_logits"]),
                                  np.asarray(t_plain["pred_logits"]))


def test_frcnn_box_head_w8a8_parity(monkeypatch):
    """FasterRCNN box-head FCs under the int8 flag: same tree, close
    eval outputs, train forward untouched."""
    from vit_torch_tpu.detection.faster_rcnn import (
        FasterRCNN, FasterRCNNConfig)
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS, ResNet
    backbone = ResNet(RESNET_CONFIGS["resnet_test"], dtype=jnp.float32,
                      features_only=True, name="backbone")
    cfg = FasterRCNNConfig(num_classes=3, image_size=64, strides=(4, 8),
                           anchor_sizes=(8.0, 16.0), num_proposals=32,
                           rpn_pre_nms_topk=64, rpn_batch=32, roi_batch=16,
                           detections=10)
    model = FasterRCNN(cfg, backbone, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(10).normal(0, 1, (1, 64, 64, 3)),
                    jnp.float32)
    monkeypatch.setenv("VITX_W8A8", "")
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    ref = model.apply(variables, x, deterministic=True)
    monkeypatch.setenv("VITX_W8A8", "1")
    v2 = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    assert jax.tree.map(lambda a: a.shape, v2) == \
        jax.tree.map(lambda a: a.shape, variables)
    got = model.apply(variables, x, deterministic=True)
    r, g = np.asarray(ref["cls_logits"]), np.asarray(got["cls_logits"])
    rel = np.linalg.norm(g - r) / (np.linalg.norm(r) + 1e-9)
    assert 0 < rel < 0.08, rel
    t_q, _ = model.apply(variables, x, jax.random.PRNGKey(1),
                         deterministic=False, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    monkeypatch.setenv("VITX_W8A8", "")
    t_p, _ = model.apply(variables, x, jax.random.PRNGKey(1),
                         deterministic=False, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(t_q["cls_logits"]),
                                  np.asarray(t_p["cls_logits"]))


def test_w8a8_under_dp_mesh(monkeypatch):
    """Multi-chip serving: the int8 forward GSPMD-shards over a data mesh
    and matches the single-device int8 forward (per-token scales make
    every sample independent, so sharding must be exact)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from vit_torch_tpu.models import VisionModelZoo
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    x = jnp.asarray(np.random.default_rng(11).normal(0, 1, (8, 32, 32, 3)),
                    jnp.float32)
    monkeypatch.setenv("VITX_W8A8", "1")
    ref = np.asarray(zm.model.apply(variables, x, True))
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    fwd = jax.jit(lambda v, a: zm.model.apply(v, a, True),
                  out_shardings=NamedSharding(mesh, P("data")))
    got = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("arch", ["vit_tiny_test", "xcit_test", "cait_test"])
def test_vit_logits_agreement(monkeypatch, arch):
    """Whole tiny-model forward per family: int8 logits track bf16-path
    logits closely enough to preserve the prediction (top-1 agreement).
    vit covers Attention+Mlp, xcit covers the quantized XCA projections,
    cait covers Mlp-only quant under talking-heads attention."""
    from vit_torch_tpu.models import VisionModelZoo
    zm = VisionModelZoo.get_model(arch, classifier=[10],
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    x = jnp.asarray(np.random.default_rng(8).normal(0, 1, (8, 32, 32, 3)),
                    jnp.float32)
    monkeypatch.setenv("VITX_W8A8", "")
    ref = np.asarray(zm.model.apply(variables, x, True))
    monkeypatch.setenv("VITX_W8A8", "1")
    got = np.asarray(zm.model.apply(variables, x, True))
    cos = np.sum(ref * got) / (np.linalg.norm(ref) * np.linalg.norm(got))
    assert cos > 0.99, cos
    assert (ref.argmax(-1) == got.argmax(-1)).all()
