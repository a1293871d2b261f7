"""Empirical shape-roofline for swin_tiny_224: what MFU can its matmul
shapes reach at ALL, independent of our kernels?

For each stage we time pure XLA bf16 matmuls at the exact shapes the
model executes (qkv / proj / fc1 / fc2 token matmuls and the batched
window-attention dots), scan-amortized with a D2H fence.  The
FLOPs-weighted combination of those per-op throughputs is the best MFU
any schedule of the same matmuls could deliver — kernel fusion can
recover inter-op overhead but cannot beat the per-shape MXU rates.

Context: the zoo sweep measures swin_tiny e2e at 11.5% MFU
(examples/zoo_bench_tpu.json); PERF.md's ViT analysis showed per-shape
empirical matmul bounds sit far under the 197 TF/s paper peak for
small-D attention.  This script quantifies the same effect for the
swin_tiny stage shapes.

Run on the real chip: python examples/perf/swin_tiny_shape_bound.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0          # v5e bf16
HBM_GBPS = 819.0             # v5e HBM bandwidth
REPS = 50
B = 32                        # zoo sweep batch


def timed_tflops(fn, flops, *args):
    """TF/s of fn via a REPS-long lax.scan with a scalar D2H fence."""
    @jax.jit
    def run(*a):
        def step(acc, _):
            o = fn(*a)
            return acc + o.reshape(-1)[0].astype(jnp.float32), None
        acc, _ = jax.lax.scan(step, jnp.float32(0), None, length=REPS)
        return acc
    float(run(*args))                       # compile + warm
    t0 = time.perf_counter()
    float(run(*args))
    dt = (time.perf_counter() - t0) / REPS
    return flops / dt / 1e12


def stage_ops(HW, C, H, w=7):
    """(name, flops, thunk) for one block's matmuls at stage shape."""
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
    # (name, flops, hbm_bytes, thunk): bytes = bf16 inputs + bf16 output
    # (weights are negligible at these T) — gives the per-op HBM roofline
    return [
        ("qkv",  2 * T * C * 3 * C, 2 * (T * C + T * 3 * C),
         lambda: mm(x, wqkv)),
        ("attn_qk", 2 * Bn * H * N * N * D,
         2 * (2 * Bn * H * N * D + Bn * H * N * N),
         lambda: bmm(True)(q, k)),
        ("attn_pv", 2 * Bn * H * N * N * D,
         2 * (Bn * H * N * N + 2 * Bn * H * N * D),
         lambda: bmm(False)(p, v)),
        ("proj", 2 * T * C * C, 2 * (2 * T * C),
         lambda: mm(x, wproj)),
        ("fc1",  2 * T * C * 4 * C, 2 * (T * C + T * 4 * C),
         lambda: mm(x, w1)),
        ("fc2",  2 * T * 4 * C * C, 2 * (T * 4 * C + T * C),
         lambda: mm(hmid, w2)),
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
        for opname, flops, hbm_bytes, thunk in stage_ops(HW, C, H):
            tfs = timed_tflops(lambda *a, f=thunk: f(), flops)
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
