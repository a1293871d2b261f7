"""Empirical shape-roofline for swin_tiny_224: what MFU can its matmul
shapes reach at ALL, independent of our kernels?

For each stage we time pure XLA bf16 matmuls at the exact shapes the
model executes (qkv / proj / fc1 / fc2 token matmuls and the batched
window-attention dots), scan-amortized with a D2H fence.  The
FLOPs-weighted combination of those per-op throughputs is the best MFU
any schedule of the same matmuls could deliver — kernel fusion can
recover inter-op overhead but cannot beat the per-shape MXU rates.

Harness note (fixed twice): (1) the scan body must carry a data
dependence from each step's output into the next step's INPUT, or XLA
hoists the loop-invariant op out of the scan entirely — the original
probe had that bug, every op "measured" ~0.5 ms/rep and the weighted
bound came out at 3.3% MFU, *below* the measured 12.4% e2e, which is
impossible for a ceiling.  (2) even with the carry fixed, a REPS=50
average still reads ``(22 ms dispatch floor + 50*t_op)/50`` — for ops
under ~0.5 ms the floor dominates and all shapes converge to ~0.45
ms/rep.  `slope_timing.py` removes the floor exactly by taking the
slope of wall time over two rep counts.

Context: the zoo sweep measures swin_tiny e2e at 12.4% MFU
(examples/zoo_bench_tpu.json); PERF.md's ViT analysis showed per-shape
empirical matmul bounds sit far under the 197 TF/s paper peak for
small-D attention.  This script quantifies the same effect for the
swin_tiny stage shapes.

Run on the real chip: python examples/perf/swin_tiny_shape_bound.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from slope_timing import op_tflops as timed_tflops  # noqa: E402

PEAK_TFLOPS = 197.0          # v5e bf16
HBM_GBPS = 819.0             # v5e HBM bandwidth
B = 32                        # zoo sweep batch


def stage_ops(HW, C, H, w=7):
    """(name, flops, hbm_bytes, a, b, fn) for one block's matmuls at the
    stage shape — ``b`` is the operand carried (and perturbed) by the
    timing scan."""
    N = w * w
    nW = (HW // w) ** 2
    Bn = B * nW
    T = Bn * N
    D = C // H
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rng.normal(0, 1, (T, C)), bf)
    wqkv = jnp.asarray(rng.normal(0, 0.05, (C, 3 * C)), bf)
    wproj = jnp.asarray(rng.normal(0, 0.05, (C, C)), bf)
    w1 = jnp.asarray(rng.normal(0, 0.05, (C, 4 * C)), bf)
    hmid = jnp.asarray(rng.normal(0, 1, (T, 4 * C)), bf)
    w2 = jnp.asarray(rng.normal(0, 0.05, (4 * C, C)), bf)
    q = jnp.asarray(rng.normal(0, 1, (Bn * H, N, D)), bf)
    k = jnp.asarray(rng.normal(0, 1, (Bn * H, N, D)), bf)
    p = jnp.asarray(rng.normal(0, 1, (Bn * H, N, N)), bf)
    v = jnp.asarray(rng.normal(0, 1, (Bn * H, N, D)), bf)
    # fp32 MXU accumulation, bf16 stores — the dtype flow the XLA model
    # path actually emits (flax Dense dtype=bf16); fp32 stores would
    # double the write traffic and understate the unfused bound
    mm = lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    bmm = lambda tr: (lambda a, b: jax.lax.dot_general(
        a, b, (((2,), (2 if tr else 1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16))
    # (name, flops, hbm_bytes, a, b, fn): bytes = bf16 inputs + bf16 output
    # (weights are negligible at these T) — gives the per-op HBM roofline
    return [
        ("qkv",  2 * T * C * 3 * C, 2 * (T * C + T * 3 * C),
         x, wqkv, mm),
        ("attn_qk", 2 * Bn * H * N * N * D,
         2 * (2 * Bn * H * N * D + Bn * H * N * N),
         q, k, bmm(True)),
        ("attn_pv", 2 * Bn * H * N * N * D,
         2 * (Bn * H * N * N + 2 * Bn * H * N * D),
         p, v, bmm(False)),
        ("proj", 2 * T * C * C, 2 * (2 * T * C),
         x, wproj, mm),
        ("fc1",  2 * T * C * 4 * C, 2 * (T * C + T * 4 * C),
         x, w1, mm),
        ("fc2",  2 * T * 4 * C * C, 2 * (T * 4 * C + T * C),
         hmid, w2, mm),
    ]


def main():
    print("backend:", jax.default_backend(), flush=True)
    stages = [("s1", 56, 96, 3, 2), ("s2", 28, 192, 6, 2),
              ("s3", 14, 384, 12, 6), ("s4", 7, 768, 24, 2)]
    total_flops = 0.0
    total_time = 0.0
    report = {}
    for name, HW, C, H, depth in stages:
        rows = []
        for opname, flops, hbm_bytes, a, b, fn in stage_ops(HW, C, H):
            tfs = timed_tflops(fn, a, b, flops)
            # HBM roofline for this op's minimum traffic at bf16
            hbm_bound = flops / (hbm_bytes / (HBM_GBPS * 1e9)) / 1e12
            rows.append((opname, flops, tfs, hbm_bound))
            total_flops += depth * flops
            total_time += depth * flops / (tfs * 1e12)
            print(f"{name} {opname:8s} {flops/1e9:7.2f} GF  {tfs:6.1f} TF/s"
                  f"  ({100*tfs/PEAK_TFLOPS:4.1f}% of peak; HBM roofline"
                  f" {hbm_bound:6.1f} TF/s)", flush=True)
        report[name] = {o: {"gflops": f / 1e9, "tflops_s": t,
                            "hbm_roofline_tflops_s": hb}
                        for o, f, t, hb in rows}
    bound = total_flops / total_time / 1e12
    print(f"\nFLOPs-weighted matmul bound for swin_tiny blocks: "
          f"{bound:.1f} TF/s = {100*bound/PEAK_TFLOPS:.1f}% MFU ceiling",
          flush=True)
    report["weighted_bound_tflops_s"] = bound
    report["weighted_bound_mfu_pct"] = 100 * bound / PEAK_TFLOPS
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "swin_tiny_shape_bound.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
