"""End-to-end HTTP serving load test on the real TPU chip.

Drives the full production serving stack — AOT bundle (`serving/export.py`)
behind the micro-batching HTTP server (`serving/server.py`) — with
closed-loop concurrent clients posting base64 PNGs, and records client-side
latency percentiles, aggregate throughput, and the server's own dispatch
batch-size histogram (GET /stats), i.e. whether micro-batching actually
coalesces under load.

Reference counterpart: none (the reference deploys by unpickling into a
live session); this benchmarks the beyond-reference serving runtime.

NB this box has ONE host CPU core: PNG decode + bicubic resize run
host-side per image, so high-concurrency figures are host-bound — the
dispatch histogram and device-side batch latency tell the TPU story.

Writes examples/serving_bench_tpu.json.
"""

from __future__ import annotations

import base64
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ARCH = "dino_vits16"
SIZE = 224
REQUESTS_PER_CLIENT = 30


def export_bundle(tmp: str) -> str:
    import jax
    import jax.numpy as jnp
    from vit_torch_tpu.data.datasets import NORM_VALUES
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.serving import export_classifier, save_bundle

    zm = VisionModelZoo.get_model(ARCH, classifier=[512, 10],
                                  image_size=SIZE, dtype=jnp.bfloat16)
    variables = zm.init(jax.random.PRNGKey(0), image_size=SIZE)
    exported = export_classifier(
        zm, variables, image_size=SIZE, batch_sizes=(1, 8, 32),
        norm=NORM_VALUES["stl10"], param_dtype="bfloat16")
    out = os.path.join(tmp, "bundle")
    save_bundle(out, exported)
    return out


def make_payload() -> bytes:
    from PIL import Image
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (SIZE, SIZE, 3),
                                       dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode("ascii")
    return json.dumps({"images": [b64]}).encode()


def run_load(url: str, payload: bytes, concurrency: int) -> dict:
    latencies = []
    errors = [0]
    lock = threading.Lock()

    def client():
        for _ in range(REQUESTS_PER_CLIENT):
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(
                    url + "/v1/predict", data=payload,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=120) as r:
                    json.loads(r.read())
                dt = time.perf_counter() - t0
                with lock:
                    latencies.append(dt)
            except Exception:
                with lock:
                    errors[0] += 1

    threads = [threading.Thread(target=client) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat = sorted(latencies)

    def pct(p):
        return round(1000 * lat[min(len(lat) - 1, int(p * len(lat)))], 1)

    return {"concurrency": concurrency,
            "requests": len(lat), "errors": errors[0],
            "wall_s": round(wall, 2),
            "req_per_sec": round(len(lat) / wall, 1),
            "latency_ms": {"p50": pct(0.5), "p90": pct(0.9),
                           "p99": pct(0.99)} if lat else None}


def main() -> None:
    import jax
    from vit_torch_tpu.serving.server import BundleServer

    with tempfile.TemporaryDirectory() as tmp:
        bundle = export_bundle(tmp)
        server = BundleServer(bundle, port=0, max_wait_ms=5.0)
        server.start()
        host, port = server.address
        url = f"http://{host}:{port}"
        payload = make_payload()
        # warmup: compile every batch bucket the load can hit (each bucket
        # is a separate StableHLO program, compiled at first call)
        run_load(url, payload, 32)
        run_load(url, payload, 1)
        phases = []
        for c in (1, 8, 32):
            with urllib.request.urlopen(url + "/stats") as r:
                before = json.loads(r.read()).get("dispatches", {})
            phase = run_load(url, payload, c)
            with urllib.request.urlopen(url + "/stats") as r:
                after = json.loads(r.read()).get("dispatches", {})
            disp = {k: after.get(k, 0) - before.get(k, 0) for k in after}
            phase["dispatch_hist"] = {k: v for k, v in sorted(
                disp.items(), key=lambda kv: int(kv[0])) if v}
            print(json.dumps(phase), flush=True)
            phases.append(phase)
        server.shutdown()

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "serving_bench_tpu.json")
    blob = {"device": jax.devices()[0].device_kind, "arch": ARCH,
            "image_size": SIZE, "requests_per_client": REQUESTS_PER_CLIENT,
            "note": "single-host-core box: decode/resize are host-bound; "
                    "dispatch_hist shows micro-batch coalescing",
            "results": phases}
    with open(out, "w") as f:
        json.dump(blob, f, indent=1)
    print(json.dumps({"written": out}))


if __name__ == "__main__":
    main()
