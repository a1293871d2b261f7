"""Slope-timed single-block probe at the small-Swin stage shapes.

``swin_stage_decompose.json`` (round 5) shows swin_tiny's time concentrated
in stages 0/1 (9% / 16% MFU per block) while stage 3 already runs at 54% —
and the full-block kernel measuring a net e2e LOSS vs the band kernel at
tiny.  This probe times ONE SwinBlock forward at each small-stage shape
under every dispatch mode, slope-timed (two scan lengths, dispatch floor
cancels), so kernel work on the small-C stages can be judged per variant:

- xla:    VITX_FUSED_WINDOW=0 (pure XLA: partition/attn einsums/reverse)
- window: attention-only Pallas kernel on partitioned windows
          (VITX_FUSED_BLOCK=0 VITX_FUSED_SPATIAL=0)
- band:   band-gather spatial kernel, XLA LN/MLP (VITX_FUSED_FULL=0)
- full:   full-block fused kernel (current default)

The scan carries the map through the block (output feeds next input), so
nothing hoists.  Writes examples/perf/swin_small_stage_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFS = 197.0
BS = 32

# (label, H=W, C, heads, shift)
SHAPES = [
    ("s0", 56, 96, 3, 0), ("s0_shift", 56, 96, 3, 3),
    ("s1", 28, 192, 6, 0), ("s1_shift", 28, 192, 6, 3),
    ("s2", 14, 384, 12, 0), ("s2_shift", 14, 384, 12, 3),
]

MODES = {
    "xla": {"VITX_FUSED_WINDOW": "0"},
    "window": {"VITX_FUSED_BLOCK": "0", "VITX_FUSED_SPATIAL": "0"},
    "band": {"VITX_FUSED_FULL": "0"},
    "full": {},
}
_KNOBS = ("VITX_FUSED_WINDOW", "VITX_FUSED_BLOCK", "VITX_FUSED_SPATIAL",
          "VITX_FUSED_FULL")


def block_flops(size, C, w):
    n = size * size
    return BS * (2 * n * C * C * 3 + 2 * n * w * w * C * 2
                 + 2 * n * C * C + 2 * n * C * 4 * C * 2)


def bench_shape(size, C, heads, shift, reps=(8, 32)):
    from vit_torch_tpu.models.swin import SwinBlock
    block = SwinBlock(num_heads=heads, window_size=7, shift_size=shift,
                      drop_path_rate=0.0, dtype=jnp.bfloat16)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (BS, size, size, C)), jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x0)

    def run_at(r):
        @jax.jit
        def run(variables, x):
            def step(c, _):
                y = block.apply(variables, c, True)
                return y * (1.0 / (1.0 + 1e-6)), None  # keep magnitudes sane
            y, _ = jax.lax.scan(step, x, None, length=r)
            return y
        out = run(variables, x0)
        float(jnp.sum(out[0, 0, 0]))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = run(variables, x0)
            float(jnp.sum(out[0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run_at(reps[0]), run_at(reps[1])
    return (t2 - t1) / (reps[1] - reps[0])


def main() -> None:
    out = {"device": jax.devices()[0].device_kind, "bs": BS, "rows": []}
    for mode, env in MODES.items():
        for k in _KNOBS:
            os.environ.pop(k, None)
        os.environ.update(env)
        for label, size, C, heads, shift in SHAPES:
            dt = bench_shape(size, C, heads, shift)
            fl = block_flops(size, C, 7)
            tfs = fl / dt / 1e12
            row = {"mode": mode, "shape": label,
                   "ms_per_block": round(1000 * dt, 4),
                   "tf_per_s": round(tfs, 1),
                   "mfu_pct": round(100 * tfs / PEAK_TFS, 1)}
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
    for k in _KNOBS:
        os.environ.pop(k, None)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "swin_small_stage_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
