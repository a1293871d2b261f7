"""Per-stage, per-block ResNeXt train-step cost by depth slope (round 5).

VERDICT r4 #4: resnext50 finetunes at 20.9% MFU while sibling resnext101
closed at its ~27% unfused-conv bound — lift resnext50 or ledger why the
same family lands 6 points apart.  Hypothesis under test: a FLOP-MIX
shift, not a kernel gap — both archs share the identical stem + stage-1/2
prefix (3+4 blocks on 56²/28² maps, HBM-bound), and resnext101's extra 17
stage-3 blocks (14², C=1024 — the MXU-friendliest shapes in the net) pull
its AVERAGE up while resnext50's average stays anchored to the low-MFU
prefix.

Method: the swin_stage_decompose depth-slope trick on the full
fwd+bwd+CE train objective — time the step at base layers and at +2
blocks in one stage; Δt/2 is that stage's marginal per-block cost with
everything shared cancelled.  Per-block analytic FLOPs (3× fwd for the
train step) give each stage an MFU.  Writes resnext_stage_decompose.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 10
BS = 32
SIZE = 224
PEAK_TFS = 197.0
EXPANSION = 4


def block_flops(cfg, stage: int) -> int:
    """Fwd FLOPs of ONE marginal (stride-1, no-downsample) block of
    `stage` at batch BS (conv1 1x1 + grouped 3x3 + conv3 1x1)."""
    planes = 64 * 2 ** stage
    width = int(planes * cfg.width_per_group / 64.0) * cfg.groups
    out_ch = planes * EXPANSION
    hw = (SIZE // 4 // (2 ** stage)) ** 2
    f = 2 * hw * out_ch * width          # conv1 (in == out_ch for marginal)
    f += 2 * hw * width * (width // cfg.groups) * 9   # grouped 3x3
    f += 2 * hw * width * out_ch         # conv3
    return BS * f


def bench(cfg) -> float:
    from vit_torch_tpu.models.resnet import ResNet
    model = ResNet(cfg, dtype=jnp.bfloat16)
    x0 = jnp.zeros((BS, SIZE, SIZE, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x0)
    params, stats = variables["params"], variables["batch_stats"]
    feat = 64 * 2 ** (len(cfg.layers) - 1) * EXPANSION
    head = jnp.zeros((feat, 10), jnp.float32)

    def loss_fn(params, head, stats, x, y):
        feats, upd = model.apply(
            {"params": params, "batch_stats": stats}, x, False,
            mutable=["batch_stats"])
        logits = feats.astype(jnp.float32) @ head
        logp = jax.nn.log_softmax(logits)
        loss = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=-1))
        return loss, upd["batch_stats"]

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    @jax.jit
    def run_chunk(params, head, stats, xs, ys):
        def step(carry, xy):
            params, head, stats = carry
            (loss, stats), (gp, gh) = grad_fn(params, head, stats, *xy)
            # SGD-ish inline update keeps the data dependence real
            params = jax.tree.map(lambda p, g: p - 1e-4 * g, params, gp)
            head = head - 1e-4 * gh
            return (params, head, stats), loss
        (params, head, stats), losses = jax.lax.scan(
            step, (params, head, stats), (xs, ys))
        return losses[-1]

    rng = np.random.default_rng(0)
    xs = jax.device_put(rng.standard_normal(
        (STEPS, BS, SIZE, SIZE, 3), dtype=np.float32).astype(jnp.bfloat16))
    ys = jax.device_put(rng.integers(0, 10, (STEPS, BS)).astype(np.int32))
    out = run_chunk(params, head, stats, xs, ys)
    float(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_chunk(params, head, stats, xs, ys)
        float(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from vit_torch_tpu.models.resnet import RESNET_CONFIGS
    arch = sys.argv[1] if len(sys.argv) > 1 else "resnext50_32x4d"
    base = RESNET_CONFIGS[arch]
    variants = {"base": base.layers}
    for s in range(len(base.layers)):
        d = list(base.layers)
        d[s] += 2
        variants[f"s{s}+2"] = tuple(d)
    times = {}
    for name, layers in variants.items():
        cfg = dataclasses.replace(base, layers=layers)
        t = bench(cfg)
        times[name] = t
        print(f"{name} layers={layers}: {1000 * t / STEPS:.3f} ms/step",
              flush=True)
    rows = []
    for s in range(len(base.layers)):
        dt = (times[f"s{s}+2"] - times["base"]) / 2 / STEPS
        fl = 3 * block_flops(base, s)            # fwd+bwd ~ 3x fwd
        tfs = fl / dt / 1e12 if dt > 0 else float("inf")
        rows.append({"stage": s, "ms_per_block": round(1000 * dt, 4),
                     "train_gflops_per_block": round(fl / 1e9, 2),
                     "tf_per_s": round(tfs, 1),
                     "mfu_pct": round(100 * tfs / PEAK_TFS, 1),
                     "blocks": base.layers[s]})
    out = {"device": jax.devices()[0].device_kind, "arch": arch, "bs": BS,
           "ms_per_step_base": round(1000 * times["base"] / STEPS, 3),
           "per_stage": rows}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"resnext_stage_decompose_{arch.split('_')[0]}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
