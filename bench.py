"""Headline benchmark — run on the real TPU chip by the driver.

Measures steady-state training throughput (images/sec/chip) for the
reference's best directly-comparable logged configuration:

    dino_vitb8 linear-eval, 224×224 input, batch 32
    reference: 10.8 ms/sample ≈ 92.6 img/s on 1×RTX 3090
    (BASELINE.md: logs/massA/stats_210716_070509.json
     results."train.sample_time" = 0.0108)

The measured unit is the full linear-eval train step: device-side
augmentation + frozen ViT-B/8 backbone forward + MLP-head forward/backward +
optimizer update + device-resident metrics (what the reference's hot loop
does per batch, minus its 3 host syncs per batch).

Methodology notes:
- K steps are fused into ONE dispatch via ``lax.scan`` over a stacked batch —
  both the production pattern (dataset lives in HBM; one dispatch per chunk)
  and a necessity on tunneled devices where per-dispatch latency is ~30 ms.
- Timing is fenced by a device_get of the final step's loss (a real D2H
  read); on this platform ``block_until_ready`` returns at enqueue-ack, not
  completion, and would overstate throughput ~100×.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 1.0 / 0.0108  # reference 3090 train.sample_time

ARCH = "dino_vitb8"
IMAGE_SIZE = 224
BATCH = 32
STEPS_PER_DISPATCH = 20
MEASURE_ROUNDS = 3


def main():
    from vit_torch_tpu.data.augment import make_train_augment
    from vit_torch_tpu.data.datasets import NORM_VALUES
    from vit_torch_tpu.models import VisionModelZoo
    from vit_torch_tpu.train import create_train_state, get_optimizer
    from vit_torch_tpu.train.steps import cross_entropy_loss, _metrics

    import optax

    zm = VisionModelZoo.get_model(ARCH, classifier=[512, 10],
                                  image_size=IMAGE_SIZE, dtype=jnp.bfloat16)
    variables = zm.init(jax.random.PRNGKey(0), image_size=IMAGE_SIZE)
    tx = get_optimizer("adamw", lr=1e-3)
    state = create_train_state(jax.random.PRNGKey(1), variables["params"], tx,
                               lineareval=True)
    augment = make_train_augment(**NORM_VALUES["stl10"], dtype=jnp.bfloat16)
    apply_fn = zm.model.apply

    def one_step(state, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        rng, aug_rng = jax.random.split(rng)
        images = augment(aug_rng, batch["image"])

        def loss_fn(params):
            vs = {"params": {**state.frozen, **params}}
            logits = apply_fn(vs, images, False, rngs={"dropout": rng})
            return cross_entropy_loss(logits, batch["label"], batch["mask"]), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=params,
                              opt_state=opt_state)
        return state, _metrics(logits, batch["label"], batch["mask"], loss)

    @jax.jit
    def run_chunk(state, batches):
        return jax.lax.scan(one_step, state, batches)

    rng = np.random.default_rng(0)
    batches = {
        "image": rng.integers(0, 255, (STEPS_PER_DISPATCH, BATCH, IMAGE_SIZE,
                                       IMAGE_SIZE, 3), dtype=np.uint8),
        "label": rng.integers(0, 10, (STEPS_PER_DISPATCH, BATCH)).astype(np.int32),
        "mask": np.ones((STEPS_PER_DISPATCH, BATCH), np.float32),
    }
    batches = jax.device_put(batches)

    # warmup: compile + one full chunk, fenced by a real D2H read
    state, m = run_chunk(state, batches)
    float(m["loss_sum"][-1])

    times = []
    for _ in range(MEASURE_ROUNDS):
        t0 = time.perf_counter()
        state, m = run_chunk(state, batches)
        float(m["loss_sum"][-1])           # D2H fence
        times.append(time.perf_counter() - t0)

    dt = min(times)
    img_per_sec = STEPS_PER_DISPATCH * BATCH / dt
    n_chips = max(len(jax.devices()), 1)
    value = img_per_sec / n_chips
    print(json.dumps({
        "metric": f"images/sec/chip {ARCH} lineareval {IMAGE_SIZE}px bs{BATCH}",
        "value": round(value, 2),
        "unit": "img/s",
        "vs_baseline": round(value / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
