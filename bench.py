"""Headline benchmark — run on the real TPU chip by the driver.

Measures steady-state training throughput (images/sec/chip) and model FLOPs
utilisation (MFU) for the reference's logged configurations:

  1. dino_vitb8 linear-eval 224px bs32  — headline; reference 10.8 ms/sample
     ≈ 92.6 img/s on 1×RTX 3090 (BASELINE.md:
     logs/massA/stats_210716_070509.json results."train.sample_time")
  2. dino_vitb8 finetune 224px bs32     — the BASELINE.json north-star mode
     (no logged reference throughput at this size; MFU is the target metric)
  3. swin_base_patch4_window12_384 linear-eval 384px bs32 — reference
     12.0 ms/sample ≈ 83.3 img/s (logs/massA/stats_210716_084506.json)

The measured unit is the full train step: device-side augmentation +
backbone + head forward(/backward) + optimizer update + device-resident
metrics (what the reference's hot loop does per batch, minus its 3 host
syncs per batch).

MFU = achieved model FLOP/s ÷ chip peak bf16 FLOP/s, with analytic model
FLOPs (``vit_flops`` / ``swin_flops``); train-step FLOPs are 1× forward for
linear-eval (frozen backbone, tiny head) and 3× forward for finetune
(forward + ~2× backward).

Methodology notes:
- K steps are fused into ONE dispatch via ``lax.scan`` over a stacked batch —
  both the production pattern (dataset lives in HBM; one dispatch per chunk,
  epoch-scan mode dispatches a whole epoch) and a necessity on tunneled
  devices where per-dispatch latency is ~22-30 ms.
- Per-step time is the SLOPE of chunk wall time over two scan lengths
  (min-of-rounds each): every per-dispatch constant (tunnel RTT, fence)
  cancels exactly.  A single-length average bakes floor/K into each step
  — at K=20 that overstated fast configs' step time by up to ~18% (the
  production epoch-scan path amortizes the dispatch over a whole epoch,
  so the slope is the honest steady-state number).
- Timing is fenced by a device_get of the final step's loss (a real D2H
  read); on this platform ``block_until_ready`` returns at enqueue-ack, not
  completion, and would overstate throughput ~100×.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# peak bf16 matmul throughput per chip, by device_kind
PEAK_BF16_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,          # v5e
    "TPU v5": 459e12,               # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,          # trillium
}

CONFIGS = [
    {"name": "dino_vitb8 lineareval 224px bs32", "arch": "dino_vitb8",
     "image_size": 224, "bs": 32, "lineareval": True,
     "baseline_img_s": 1.0 / 0.0108, "headline": True},
    {"name": "dino_vitb8 finetune 224px bs32", "arch": "dino_vitb8",
     "image_size": 224, "bs": 32, "lineareval": False,
     "baseline_img_s": None},      # no logged reference at this size
    # the reference's ACTUAL finetune operating point: CIFAR-10 32px bs128,
    # best epoch 28.19 s / 50k images = 1774 img/s on 1x3090
    # (logs/stats_master_210624.json "210623_155824" train[].time_cost)
    {"name": "dino_vitb8 finetune 32px bs128", "arch": "dino_vitb8",
     "image_size": 32, "bs": 128, "lineareval": False,
     "baseline_img_s": 1773.8},
    {"name": "swin_base_384 lineareval 384px bs32",
     "arch": "swin_base_patch4_window12_384_22k",
     "image_size": 384, "bs": 32, "lineareval": True,
     "baseline_img_s": 1.0 / 0.0120},
]

CHUNK_LENGTHS = (20, 60)     # slope timing: per-step = Δwall / Δlength
MEASURE_ROUNDS = 3


def model_flops_per_image(arch: str, image_size: int) -> int:
    """Analytic forward FLOPs per image — every zoo family (validated
    within 1% of published GMac counts for cait/xcit/deit/resnext/wrn)."""
    if arch.startswith("deit_"):
        from vit_torch_tpu.models.deit import deit_flops
        return deit_flops(arch, image_size)
    if arch.startswith(("dino_", "vit_")):
        from vit_torch_tpu.models.vit import VIT_CONFIGS, vit_flops
        return vit_flops(VIT_CONFIGS[arch], image_size)
    if arch.startswith("cait_"):
        from vit_torch_tpu.models.cait import CAIT_CONFIGS, cait_flops
        return cait_flops(CAIT_CONFIGS[arch], image_size)
    if arch.startswith("xcit_"):
        from vit_torch_tpu.models.xcit import XCIT_CONFIGS, xcit_flops
        return xcit_flops(XCIT_CONFIGS[arch], image_size)
    if arch.startswith(("resnext", "wide_resnet", "resnet")):
        from vit_torch_tpu.models.resnet import RESNET_CONFIGS, resnet_flops
        return resnet_flops(RESNET_CONFIGS[arch], image_size)
    from vit_torch_tpu.models.swin import SWIN_CONFIGS, swin_flops
    return swin_flops(SWIN_CONFIGS[arch], image_size)


def bench_config(cfg: dict) -> dict:
    from vit_torch_tpu.data.augment import make_train_augment
    from vit_torch_tpu.data.datasets import NORM_VALUES
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.train import create_train_state, get_optimizer
    from vit_torch_tpu.train.steps import cross_entropy_loss, _metrics

    import optax

    arch, image_size, bs = cfg["arch"], cfg["image_size"], cfg["bs"]
    zm = VisionModelZoo.get_model(arch, classifier=[512, 10],
                                  image_size=image_size, dtype=jnp.bfloat16)
    variables = zm.init(jax.random.PRNGKey(0), image_size=image_size)
    tx = get_optimizer("adamw", lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(1), variables["params"], tx,
                               lineareval=cfg["lineareval"])
    augment = make_train_augment(**NORM_VALUES["stl10"], dtype=jnp.bfloat16)
    apply_fn = zm.model.apply
    # BN-family models (resnet, xcit conv patch-embed) carry batch_stats;
    # thread them through as constants — identical per-step compute, the
    # stats update is discarded (throughput measurement only)
    extra_colls = {k: v for k, v in variables.items() if k != "params"}

    def one_step(state, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        rng, aug_rng = jax.random.split(rng)
        images = augment(aug_rng, batch["image"])

        def loss_fn(params):
            vs = {"params": {**state.frozen, **params}, **extra_colls}
            if extra_colls:
                logits, _ = apply_fn(vs, images, False,
                                     rngs={"dropout": rng},
                                     mutable=list(extra_colls))
            else:
                logits = apply_fn(vs, images, False, rngs={"dropout": rng})
            return (cross_entropy_loss(logits, batch["label"], batch["mask"]),
                    logits)

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state)
        return state, _metrics(logits, batch["label"], batch["mask"], loss)

    def make_chunk(length):
        @jax.jit
        def run_chunk(state, batches):
            chunk = jax.tree.map(lambda a: a[:length], batches)
            return jax.lax.scan(one_step, state, chunk)
        return run_chunk

    k_max = max(CHUNK_LENGTHS)
    rng = np.random.default_rng(0)
    batches = {
        "image": rng.integers(0, 255, (k_max, bs, image_size,
                                       image_size, 3), dtype=np.uint8),
        "label": rng.integers(0, 10, (k_max, bs)).astype(np.int32),
        "mask": np.ones((k_max, bs), np.float32),
    }
    batches = jax.device_put(batches)

    # slope timing: min-of-rounds wall time at each scan length; the
    # length-slope is the steady-state per-step time, with every
    # per-dispatch constant (tunnel RTT, D2H fence) cancelled exactly
    mins = []
    for length in CHUNK_LENGTHS:
        run_chunk = make_chunk(length)
        # warmup: compile + one full chunk, fenced by a real D2H read
        state, m = run_chunk(state, batches)
        float(m["loss_sum"][-1])
        best = float("inf")
        for _ in range(MEASURE_ROUNDS):
            t0 = time.perf_counter()
            state, m = run_chunk(state, batches)
            float(m["loss_sum"][-1])       # D2H fence
            best = min(best, time.perf_counter() - t0)
        mins.append(best)

    dt_step = ((mins[1] - mins[0])
               / (CHUNK_LENGTHS[1] - CHUNK_LENGTHS[0]))
    n_chips = max(len(jax.devices()), 1)
    img_per_sec = bs / dt_step / n_chips

    fwd = model_flops_per_image(arch, image_size)
    step_flops = fwd * (1 if cfg["lineareval"] else 3)
    achieved = img_per_sec * step_flops
    peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
    out = {
        "name": cfg["name"],
        "img_per_sec_chip": round(img_per_sec, 2),
        "tflops_per_sec": round(achieved / 1e12, 2),
        "mfu_pct": round(100 * achieved / peak, 2) if peak else None,
    }
    if cfg["baseline_img_s"]:
        out["vs_baseline"] = round(img_per_sec / cfg["baseline_img_s"], 3)
    return out


def _tunnel_ok(timeout_s: float = 180.0) -> bool:
    """Probe the (possibly tunneled) device with a trivial dispatch in a
    daemon thread.  A wedged axon tunnel hangs dispatches indefinitely —
    without this guard a dead tunnel would hang the whole bench instead
    of failing fast."""
    import threading
    done = threading.Event()

    def probe():
        try:
            float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
            done.set()
        except Exception:
            pass

    threading.Thread(target=probe, daemon=True).start()
    return done.wait(timeout_s)


# Bounded retry schedule across a tunnel outage: 750 s of sleeps plus up
# to six 180 s probe timeouts ≈ 31 min worst case per schedule before
# giving up (and the per-config mid-bench retry can invoke the schedule
# once per failing config).  Transient tunnel drops of a few minutes (the
# round-3 failure mode) are survived; a genuinely dead tunnel still
# terminates the bench in bounded time.
RETRY_BACKOFF_S = (30, 60, 120, 240, 300)


def _tunnel_ok_with_retry() -> int:
    """Probe with backoff.  Returns the number of probe attempts it took to
    reach the device (1 = first try), or 0 if every attempt failed."""
    for attempt, backoff in enumerate([0] + list(RETRY_BACKOFF_S), start=1):
        if backoff:
            time.sleep(backoff)
        if _tunnel_ok():
            return attempt
    return 0


def _stale_fallback() -> None:
    """Print the newest recorded bench line, unambiguously labeled STALE.
    Keeps the artifact informative when the device is unreachable."""
    import glob
    import os
    best = None
    for path in sorted(glob.glob(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_r*.json"))):
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed")
            if parsed and "value" in parsed:
                best = (path, parsed)
        except Exception:
            continue
    if best is None:
        print(json.dumps({"metric": "bench unavailable", "value": 0,
                          "unit": "img/s", "vs_baseline": 0,
                          "extra": {"error": "TPU tunnel unresponsive and "
                                             "no prior bench record found"}}))
        return
    path, parsed = best
    parsed = dict(parsed)
    parsed["metric"] = (f"STALE (tunnel down at bench time — value is the "
                        f"prior on-chip record from {os.path.basename(path)},"
                        f" NOT a fresh run): {parsed.get('metric', '')}")
    extra = dict(parsed.get("extra") or {})
    extra["stale"] = True
    parsed["extra"] = extra
    print(json.dumps(parsed))


def main():
    probe_attempts = _tunnel_ok_with_retry()
    if not probe_attempts:
        _stale_fallback()
        return
    results = []
    retries = 0
    for c in CONFIGS:
        # one mid-bench retry per config: a dispatch error re-probes the
        # tunnel (with the full backoff schedule) and tries the config once
        # more before recording the failure
        try:
            results.append(bench_config(c))
        except Exception as e:                      # noqa: BLE001
            retries += 1
            if _tunnel_ok_with_retry():
                try:
                    results.append(bench_config(c))
                    continue
                except Exception as e2:             # noqa: BLE001
                    e = e2
            results.append({"name": c["name"], "error": repr(e)[:300]})
    headline = next((r for r in results if "error" not in r),
                    {"name": CONFIGS[0]["name"] + " (ALL CONFIGS FAILED)",
                     "img_per_sec_chip": 0, "vs_baseline": 0})
    extra = {
        "device": jax.devices()[0].device_kind,
        "configs": results,
    }
    if probe_attempts > 1 or retries:
        extra["tunnel_probe_attempts"] = probe_attempts
        extra["config_retries"] = retries
    # stable machine-readable signal that the metric was relabeled to a
    # fallback config (consumers tracking the headline time series can
    # filter on this instead of string-parsing the metric name)
    if results and "error" in results[0]:
        extra["headline_config_failed"] = True
    # metric names the config the value actually came from — if the
    # headline config errored, the label must not claim its name for a
    # fallback config's number
    print(json.dumps({
        "metric": f"images/sec/chip {headline['name']}",
        "value": headline["img_per_sec_chip"],
        "unit": "img/s",
        "vs_baseline": headline.get("vs_baseline", 0),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
