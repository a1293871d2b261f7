"""HTTP serving runtime (``serving/server.py`` + ``cli/serve.py``):
micro-batching must coalesce concurrent requests into single dispatches,
and the HTTP surface must serve classifier and detection bundles
end-to-end from base64 image bytes."""

import base64
import http.client
import io
import json
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_torch_tpu.serving import save_bundle
from vit_torch_tpu.serving.server import BundleServer, MicroBatcher


# ---------------------------------------------------------------- batcher

def test_microbatcher_coalesces_and_orders():
    calls = []
    lock = threading.Lock()

    def run_batch(items):
        with lock:
            calls.append(len(items))
        return [x * 10 for x in items]

    b = MicroBatcher(run_batch, max_batch=4, max_wait_ms=100)
    try:
        futs = [b.submit(i) for i in range(6)]
        got = [f.result(timeout=5) for f in futs]
        assert got == [i * 10 for i in range(6)]
        # 6 items with a 100 ms window and max_batch=4 must need at most
        # 3 dispatches (the first may race ahead with a partial batch)
        assert sum(calls) == 6 and len(calls) <= 3, calls
    finally:
        b.close()


def test_microbatcher_respects_max_batch():
    sizes = []

    def run_batch(items):
        sizes.append(len(items))
        time.sleep(0.01)
        return list(items)

    b = MicroBatcher(run_batch, max_batch=2, max_wait_ms=50)
    try:
        futs = [b.submit(i) for i in range(5)]
        assert [f.result(timeout=5) for f in futs] == list(range(5))
        assert max(sizes) <= 2
    finally:
        b.close()


def test_microbatcher_rejects_bad_max_batch():
    with pytest.raises(ValueError, match="max_batch"):
        MicroBatcher(lambda xs: xs, max_batch=0)


def test_microbatcher_survives_cancelled_future():
    """A caller-cancelled future must not poison the rest of its batch."""
    gate = threading.Event()

    def run_batch(items):
        gate.wait(timeout=5)
        return [x + 1 for x in items]

    b = MicroBatcher(run_batch, max_batch=4, max_wait_ms=200)
    try:
        f1 = b.submit(1)      # worker grabs it and blocks on the gate
        time.sleep(0.05)
        f2 = b.submit(2)
        f3 = b.submit(3)
        assert f2.cancel()    # still queued → cancellable
        gate.set()
        assert f1.result(timeout=5) == 2
        assert f3.result(timeout=5) == 4
        assert f2.cancelled()
    finally:
        b.close()


def test_microbatcher_propagates_errors():
    def run_batch(items):
        raise ValueError("boom")

    b = MicroBatcher(run_batch, max_batch=4, max_wait_ms=10)
    try:
        fut = b.submit(1)
        with pytest.raises(ValueError, match="boom"):
            fut.result(timeout=5)
    finally:
        b.close()


# ------------------------------------------------------------------ http

def _b64_png(arr: np.ndarray) -> str:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(port: int, path: str, payload: dict):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


def _get(port: int, path: str):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("GET", path)
    resp = conn.getresponse()
    body = json.loads(resp.read())
    conn.close()
    return resp.status, body


@pytest.fixture(scope="module")
def classifier_bundle(tmp_path_factory):
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.serving import export_classifier
    zm = VisionModelZoo.get_model("vit_tiny_test", classifier=[10],
                                  image_size=32, dtype=jnp.float32)
    variables = zm.init(jax.random.PRNGKey(0), image_size=32)
    out = tmp_path_factory.mktemp("bundle")
    save_bundle(str(out), export_classifier(
        zm, variables, image_size=32, batch_sizes=[1, 2]))
    return str(out)


def test_server_classifier_e2e(classifier_bundle):
    server = BundleServer(classifier_bundle, port=0, max_wait_ms=1.0)
    server.start()
    try:
        port = server.address[1]
        status, health = _get(port, "/healthz")
        assert status == 200 and health["status"] == "ok"
        assert health["manifest"]["image_size"] == 32

        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (48, 40, 3), dtype=np.uint8),
                rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)]
        status, body = _post(port, "/v1/predict",
                             {"images": [_b64_png(i) for i in imgs]})
        assert status == 200, body
        preds = body["predictions"]
        assert len(preds) == 2
        # must match the bundle's direct predict on the resized images
        from vit_torch_tpu.serving import resize_images
        stacked = np.stack([resize_images(i[None], 32)[0] for i in imgs])
        ref = server.model.predict(stacked)
        for p, r in zip(preds, ref):
            np.testing.assert_allclose(p["logits"], r, atol=1e-5, rtol=1e-4)
            assert p["label"] == int(np.argmax(r))

        # serving telemetry reflects the traffic so far
        status, stats = _get(port, "/stats")
        assert status == 200
        assert stats["requests"] == 1 and stats["images"] == 2
        assert sum(int(k) * v for k, v in stats["dispatches"].items()) == 2
        assert stats["latency_ms"]["p50"] > 0

        # newline-wrapped base64 (base64.encodebytes style) must decode
        wrapped = base64.encodebytes(
            base64.b64decode(_b64_png(imgs[1]))).decode()
        assert _post(port, "/v1/predict", {"images": [wrapped]})[0] == 200

        # malformed payloads are 400s (incl. bad request fields), unknown
        # paths 404s
        assert _post(port, "/v1/predict", {"images": []})[0] == 400
        assert _post(port, "/v1/predict", {"images": ["!!"]})[0] == 400
        bad_thr = {"images": [_b64_png(imgs[1])], "score_threshold": "high"}
        assert _post(port, "/v1/predict", bad_thr)[0] == 400
        assert _post(port, "/nope", {})[0] == 404
        assert _get(port, "/nope")[0] == 404
        assert _get(port, "/stats")[1]["errors"] == 3
    finally:
        server.shutdown()


def test_server_concurrent_requests_batch(classifier_bundle):
    """Parallel clients coalesce: total dispatches < total images."""
    server = BundleServer(classifier_bundle, port=0, max_batch=2,
                          max_wait_ms=200.0)
    server.start()
    dispatches = []
    orig = server.model.predict

    def counting_predict(images):
        dispatches.append(len(images))
        return orig(images)

    server.model.predict = counting_predict
    try:
        port = server.address[1]
        rng = np.random.default_rng(1)
        payload = {"images": [_b64_png(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))]}
        results = [None, None]

        def client(i):
            results[i] = _post(port, "/v1/predict", payload)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r is not None and r[0] == 200 for r in results)
        # two single-image requests inside one 200 ms window → one
        # 2-image dispatch (identical payload → identical logits)
        assert sum(dispatches) == 2
        assert len(dispatches) <= 2
        a = results[0][1]["predictions"][0]["logits"]
        b = results[1][1]["predictions"][0]["logits"]
        np.testing.assert_allclose(a, b, atol=1e-6)
    finally:
        server.shutdown()


def test_server_predict_timeout_504(classifier_bundle):
    """A wedged dispatch turns into a 504, not a hung handler thread."""
    server = BundleServer(classifier_bundle, port=0, max_wait_ms=1.0,
                          predict_timeout_s=0.2)
    orig = server.model.predict

    def slow_predict(images):
        time.sleep(1.0)
        return orig(images)

    server.model.predict = slow_predict
    server.start()
    try:
        port = server.address[1]
        img = np.zeros((32, 32, 3), np.uint8)
        status, body = _post(port, "/v1/predict",
                             {"images": [_b64_png(img)]})
        assert status == 504, body
        assert "timed out" in body["error"]
    finally:
        server.shutdown()


def test_format_prediction_extra_outputs(classifier_bundle):
    """Keypoint / mask outputs ride along, filtered to the kept rows."""
    from vit_torch_tpu.serving.server import _format_prediction
    server = BundleServer(classifier_bundle, port=0)
    try:
        server.is_detection = True
        raw = {"scores": np.array([0.9, 0.2, 0.7], np.float32),
               "labels": np.array([1, 2, 3]),
               "boxes": np.arange(12, dtype=np.float32).reshape(3, 4),
               "keypoints": np.arange(3 * 5 * 3,
                                      dtype=np.float32).reshape(3, 5, 3),
               "masks_packed": np.arange(3 * 32 * 4,
                                         dtype=np.uint8).reshape(3, 32, 4)}
        out = _format_prediction(server, raw, thr=0.5, top_k=None)
        np.testing.assert_allclose(out["scores"], [0.9, 0.7],
                                   atol=1e-6)       # sorted, thresholded
        assert out["labels"] == [1, 3]
        assert len(out["keypoints"]) == 2
        assert out["keypoints"][1][0][0] == 2 * 15  # row for score 0.7
        mp = out["masks_packed"]
        assert mp["shape"] == [2, 32, 4]
        unpacked = np.frombuffer(base64.b64decode(mp["b64"]), np.uint8)
        np.testing.assert_array_equal(
            unpacked.reshape(2, 32, 4), raw["masks_packed"][[0, 2]])
    finally:
        server.shutdown()


def test_server_detection_e2e(tmp_path):
    from vit_torch_tpu.detection.detr import DETR, DETRConfig
    from vit_torch_tpu.detection.engine import DetectionTrainer
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, SwinTransformer
    from vit_torch_tpu.serving import export_detector

    size = 32
    backbone = SwinTransformer(SWIN_CONFIGS["swin_test"], dtype=jnp.float32,
                               features_only=True, name="backbone")
    cfg = DETRConfig(num_classes=3, num_queries=8, hidden_dim=32,
                     num_heads=4, enc_layers=1, dec_layers=1, ffn_dim=64)
    model = DETR(cfg, backbone, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 3)), True)["params"]
    tr = DetectionTrainer(model, params, image_size=size, num_classes=3,
                          lr=1e-4, augment=False)
    save_bundle(str(tmp_path), export_detector(
        tr, image_size=size, batch_sizes=[2]))

    server = BundleServer(str(tmp_path), port=0, max_wait_ms=1.0)
    server.start()
    try:
        assert server.is_detection
        port = server.address[1]
        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (24, 40, 3), dtype=np.uint8)
        status, body = _post(port, "/v1/predict",
                             {"images": [_b64_png(img)],
                              "score_threshold": 0.0, "top_k": 3})
        assert status == 200, body
        (pred,) = body["predictions"]
        assert set(pred) == {"scores", "labels", "boxes"}
        assert len(pred["scores"]) == 3          # top_k honored
        assert pred["scores"] == sorted(pred["scores"], reverse=True)
        assert all(len(b) == 4 for b in pred["boxes"])

        # thresholding drops rows
        status, body = _post(port, "/v1/predict",
                             {"images": [_b64_png(img)],
                              "score_threshold": 1.1})
        assert status == 200
        assert body["predictions"][0]["scores"] == []
    finally:
        server.shutdown()
