"""Empirical shape-roofline for cait_s24 / xcit_small_12_p16: what MFU can
their op shapes reach at ALL, independent of our kernels?

Same methodology as resnext_shape_bound.py: time pure XLA bf16 ops at the
exact shapes the models execute, weight by per-model FLOPs, and compare the
weighted bound with the measured e2e MFU (zoo_bench_tpu.json: cait_s24
20.3%, xcit_small 17.4%).

Harness note: slope timing (`slope_timing.py`) — per-op seconds are the
SLOPE of scan wall-time over two rep counts, which cancels the ~22 ms
per-dispatch tunnel floor exactly.  A REPS=50 average reads the floor,
not the op: every shape "measures" ~0.47 ms/rep regardless of FLOPs
(a 5.5 GF qkv that truly runs at ~139 TF/s read 11 TF/s).  The scan body
carries each step's output into the next step's input so XLA cannot
hoist the loop-invariant op.

Model shapes (224px, bs32):
- cait_s24: C=384 H=8 D=48, N=196 (+cls), 24 SA blocks with talking-heads
  (two HxH mixes around the softmax) + 2 CA blocks (cls-query attention).
- xcit_small_12_p16: C=384 H=8, N=196, 12 blocks of [XCA (DxD channel
  attention, contraction over N) + LPI (3x3 depthwise conv + BN) + MLP],
  conv patch-embed stem (3x3 stride-2 convs at 112/56/28 px).

Run on the real chip: python examples/perf/cait_xcit_shape_bound.py
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
HBM_GBPS = 819.0
B = 32
C, H, N = 384, 8, 196
D = C // H
T = B * N


def _mk(rng, shape, scale=1.0):
    return jnp.asarray(rng.normal(0, scale, shape), jnp.bfloat16)


def _mm(a, b):
    return jnp.dot(a, b,
                   preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _bmm(tr):
    def f(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (2 if tr else 1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return f


def common_ops(rng):
    """Token matmuls shared by both models (qkv/proj/fc1/fc2 at T=B*N).
    Rows: (name, flops, hbm_bytes, a, b, fn) — b is the scan carry."""
    x = _mk(rng, (T, C))
    wqkv = _mk(rng, (C, 3 * C), 0.05)
    wproj = _mk(rng, (C, C), 0.05)
    w1 = _mk(rng, (C, 4 * C), 0.05)
    hmid = _mk(rng, (T, 4 * C))
    w2 = _mk(rng, (4 * C, C), 0.05)
    return [
        ("qkv", 2 * T * C * 3 * C, 2 * (T * C + T * 3 * C), x, wqkv, _mm),
        ("proj", 2 * T * C * C, 2 * (2 * T * C), x, wproj, _mm),
        ("fc1", 2 * T * C * 4 * C, 2 * (T * C + T * 4 * C), x, w1, _mm),
        ("fc2", 2 * T * 4 * C * C, 2 * (T * 4 * C + T * C), hmid, w2, _mm),
    ]


def cait_ops(rng):
    """Talking-heads attention: qk/pv dots + two HxH head mixes."""
    q = _mk(rng, (B * H, N, D))
    k = _mk(rng, (B * H, N, D))
    p = _mk(rng, (B * H, N, N))
    v = _mk(rng, (B * H, N, D))
    s = _mk(rng, (B, H, N, N))
    wmix = _mk(rng, (H, H), 0.3)

    def mix(a, w):
        return jnp.einsum("bhnm,hg->bgnm", a, w,
                          preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16)

    return [
        ("attn_qk", 2 * B * H * N * N * D,
         2 * (2 * B * H * N * D + B * H * N * N), q, k, _bmm(True)),
        ("attn_pv", 2 * B * H * N * N * D,
         2 * (B * H * N * N + 2 * B * H * N * D), p, v, _bmm(False)),
        # talking-heads mix: K=H=8 contraction over a (B,H,N,N) stack —
        # 2 of these per block (proj_l pre-softmax, proj_w post-softmax)
        ("th_mix", 2 * B * H * H * N * N, 2 * (2 * B * H * N * N),
         s, wmix, mix),
    ]


def xcit_ops(rng):
    """XCA channel attention (DxD over an N-long contraction) + LPI
    depthwise conv + the conv patch-embed stem."""
    q = _mk(rng, (B * H, D, N))         # channel-major (transposed) layout
    k = _mk(rng, (B * H, D, N))
    a = _mk(rng, (B * H, D, D))
    v = _mk(rng, (B * H, D, N))
    # LPI: 3x3 depthwise conv on the (B, 14, 14, C) map
    xmap = _mk(rng, (B, 14, 14, C))
    wd = _mk(rng, (3, 3, 1, C), 0.1)

    def dw(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, (1, 1), "SAME", feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def conv2(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    # conv stem (p16): 3->48 @112px, 48->192 @56px, 192->384 @28px
    stem = []
    for cin, cout, hw in ((3, 48, 112), (48, 192, 56), (192, 384, 28)):
        xi = _mk(rng, (B, hw * 2, hw * 2, cin))
        wi = _mk(rng, (3, 3, cin, cout), 0.1)
        f = 2 * B * hw * hw * 9 * cin * cout
        by = 2 * (B * 4 * hw * hw * cin + B * hw * hw * cout)
        stem.append((f"stem{cin}-{cout}", f, by, xi, wi, conv2))
    return [
        ("xca_qk", 2 * B * H * D * D * N,
         2 * (2 * B * H * D * N + B * H * D * D), q, k, _bmm(True)),
        ("xca_av", 2 * B * H * D * D * N,
         2 * (B * H * D * D + 2 * B * H * D * N), a, v, _bmm(False)),
        ("lpi_dw", 2 * B * 14 * 14 * 9 * C, 2 * (2 * B * 14 * 14 * C),
         xmap, wd, dw),
    ] + stem


def run_model(name, rows, weights):
    print(f"\n== {name} ==", flush=True)
    report = {}
    tot_f = tot_t = 0.0
    for (opname, flops, hbm_bytes, a, b, fn), wt in zip(rows, weights):
        tfs = timed_tflops(fn, a, b, flops)
        hbm_bound = flops / (hbm_bytes / (HBM_GBPS * 1e9)) / 1e12
        print(f"{opname:12s} {flops/1e9:8.2f} GF x{wt:<3d} {tfs:6.1f} TF/s"
              f"  ({100*tfs/PEAK_TFLOPS:4.1f}% peak; HBM roofline "
              f"{hbm_bound:6.1f})", flush=True)
        report[opname] = {"gflops": flops / 1e9, "count": wt,
                          "tflops_s": tfs,
                          "hbm_roofline_tflops_s": hbm_bound}
        tot_f += wt * flops
        tot_t += wt * flops / (tfs * 1e12)
    bound = tot_f / tot_t / 1e12
    print(f"FLOPs-weighted matmul bound for {name}: {bound:.1f} TF/s = "
          f"{100*bound/PEAK_TFLOPS:.1f}% MFU ceiling", flush=True)
    report["weighted_bound_tflops_s"] = bound
    report["weighted_bound_mfu_pct"] = 100 * bound / PEAK_TFLOPS
    return report


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    out = {}
    # cait_s24: 24 SA blocks (qkv/proj/fc1/fc2 + qk/pv + 2 head mixes);
    # the 2 CA blocks are ~1% of FLOPs (cls-query only) — folded out
    cops = common_ops(rng) + cait_ops(rng)
    out["cait_s24"] = run_model(
        "cait_s24 (224px bs32)", cops, [24, 24, 24, 24, 24, 24, 48])
    # xcit_small_12: 12 blocks (token matmuls + XCA dots + LPI) + stem x1
    xops = common_ops(rng) + xcit_ops(rng)
    out["xcit_small_12_p16"] = run_model(
        "xcit_small_12_p16 (224px bs32)", xops,
        [12, 12, 12, 12, 12, 12, 12, 1, 1, 1])
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cait_xcit_shape_bound.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("\nwrote", path)


if __name__ == "__main__":
    main()
