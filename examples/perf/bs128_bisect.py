"""Bisect the bs128 lineareval collapse (zoo rows: dino_vits16 drops
5794 → 1508 img/s going bs32 → bs128; cait/xcit/swin_tiny collapse the
same way while resnext50 finetune is flat — a shared, superlinear
bottleneck).

For ARCH (default dino_vits16), slope-times at each bs in (32, 64, 128):

- eval_fwd:   eval-mode forward only
- train_fwd:  train-mode forward only (dropout rngs threaded)
- augment:    the zoo bench's device-side augment alone (crop+flip+norm)
- full_step:  the exact zoo-bench lineareval train step
- full_step_noflash: same with VITX_FLASH_MIN_SEQ unset-able knob
  (flash kernel off) — isolates the Pallas dispatch at large B

Writes examples/perf/bs128_bisect.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np

CHUNKS = (10, 40)
TRIALS = 3
SIZE = 224
ARCH = os.environ.get("BISECT_ARCH", "dino_vits16")
BATCHES = (32, 64, 128)


def _slope(make_run, fence):
    mins = []
    for length in CHUNKS:
        run = make_run(length)
        out = run()
        fence(out)
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            out = run()
            fence(out)
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    return (mins[1] - mins[0]) / (CHUNKS[1] - CHUNKS[0])


def bench(bs: int, mode: str) -> float:
    from vit_torch_tpu.data.augment import make_train_augment
    from vit_torch_tpu.data.datasets import NORM_VALUES
    from vit_torch_tpu.models import VisionModelZoo

    if mode == "full_step_noflash":
        os.environ["VITX_FLASH_MIN_SEQ"] = "0"
    rng = np.random.default_rng(0)
    augment = make_train_augment(**NORM_VALUES["stl10"], dtype=jnp.bfloat16)
    try:
        if mode == "augment":
            images = jax.device_put(rng.integers(
                0, 255, (bs, SIZE, SIZE, 3), dtype=np.uint8))

            def make_run(length):
                @jax.jit
                def run(r, images):
                    def one(c, i):
                        r = jax.random.fold_in(c, i)
                        x = augment(r, images)
                        # consume every element or XLA dead-codes the map
                        return r, jnp.sum(x.astype(jnp.float32))
                    _, outs = jax.lax.scan(one, r, jnp.arange(length))
                    return outs
                return lambda: run(jax.random.PRNGKey(0), images)
            return _slope(make_run, lambda out: float(out[-1]))

        zm = VisionModelZoo.get_model(ARCH, classifier=[512, 10],
                                      image_size=SIZE, dtype=jnp.bfloat16)
        variables = jax.device_put(zm.init(jax.random.PRNGKey(0),
                                           image_size=SIZE))
        apply_fn = zm.model.apply

        if mode in ("eval_fwd", "train_fwd"):
            det = mode == "eval_fwd"
            images = jax.device_put(rng.standard_normal(
                (bs, SIZE, SIZE, 3), dtype=np.float32).astype(jnp.bfloat16))

            def make_run(length):
                @jax.jit
                def run(variables, images, r):
                    def one(c, i):
                        img = images + (c * 1e-24).astype(images.dtype)
                        if det:
                            logits = apply_fn(variables, img, True)
                        else:
                            logits = apply_fn(
                                variables, img, False,
                                rngs={"dropout": jax.random.fold_in(r, i)})
                        return jnp.sum(logits[:, :1].astype(jnp.float32)), 0
                    c, _ = jax.lax.scan(one, jnp.float32(0),
                                        jnp.arange(length))
                    return c
                return lambda: run(variables, images, jax.random.PRNGKey(0))
            return _slope(make_run, lambda out: float(out))

        # full lineareval step — bench.py's exact one_step
        import optax

        from vit_torch_tpu.train import create_train_state, get_optimizer
        from vit_torch_tpu.train.steps import _metrics, cross_entropy_loss
        tx = get_optimizer("adamw", lr=1e-3)
        state = create_train_state(jax.random.PRNGKey(1),
                                   variables["params"], tx, lineareval=True)

        def one_step(state, batch):
            r = jax.random.fold_in(state.rng, state.step)
            r, aug_rng = jax.random.split(r)
            images = augment(aug_rng, batch["image"])

            def loss_fn(params):
                vs = {"params": {**state.frozen, **params}}
                logits = apply_fn(vs, images, False, rngs={"dropout": r})
                return (cross_entropy_loss(logits, batch["label"],
                                           batch["mask"]), logits)

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
            return state, _metrics(logits, batch["label"], batch["mask"],
                                   loss)

        k_max = max(CHUNKS)
        batches = jax.device_put({
            "image": rng.integers(0, 255, (k_max, bs, SIZE, SIZE, 3),
                                  dtype=np.uint8),
            "label": rng.integers(0, 10, (k_max, bs)).astype(np.int32),
            "mask": np.ones((k_max, bs), np.float32),
        })

        def make_run(length):
            @jax.jit
            def run(state, batches):
                chunk = jax.tree.map(lambda a: a[:length], batches)
                return jax.lax.scan(one_step, state, chunk)
            return lambda: run(state, batches)
        return _slope(make_run, lambda out: float(out[1]["loss_sum"][-1]))
    finally:
        if mode == "full_step_noflash":
            os.environ.pop("VITX_FLASH_MIN_SEQ", None)


def main() -> None:
    rows = []
    for mode in ("eval_fwd", "train_fwd", "augment", "full_step",
                 "full_step_noflash"):
        for bs in BATCHES:
            dt = bench(bs, mode)
            r = {"mode": mode, "bs": bs,
                 "ms_per_batch": round(1000 * dt, 3),
                 "img_s": round(bs / dt, 1)}
            print(json.dumps(r), flush=True)
            rows.append(r)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bs128_bisect.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind, "arch": ARCH,
                   "size": SIZE, "chunk_lengths": CHUNKS, "rows": rows},
                  f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
