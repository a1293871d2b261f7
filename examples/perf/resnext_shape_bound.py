"""Empirical shape-roofline for resnext50_32x4d @224 bs32: what MFU can
its conv shapes reach at ALL, independent of our model code?

The zoo sweep measures resnext50 finetune at 11.7% MFU
(examples/zoo_bench_tpu.json).  Hypothesis: the grouped 3x3 convs
(groups=32, width_per_group=4) are structurally MXU-hostile — each
group contracts only 4*9=36 inputs to 4 outputs, far under the 128x128
systolic tile, so XLA either pads each group to a tile (3% utilization)
or lowers to many tiny matmuls.  The 1x1 convs (the FLOPs majority) are
plain token matmuls and should run near the ViT rates.

For every distinct conv shape in the network this script times the pure
XLA bf16 `lax.conv_general_dilated` (slope-timed: per-op seconds are the
slope of scan wall time over two rep counts, cancelling the ~22 ms
per-dispatch tunnel floor — see slope_timing.py; the first version of
this probe averaged over REPS=30 and read mostly floor), then combines
per-shape rates FLOPs-weighted into the network's matmul-bound MFU
ceiling — the number our e2e 11.7% should be judged against.

Run on the real chip: python examples/perf/resnext_shape_bound.py
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

from slope_timing import op_tflops  # noqa: E402

PEAK_TFLOPS = 197.0          # v5e bf16
HBM_GBPS = 819.0
B = 32


def timed_conv_tflops(hw_in, cin, cout, k, stride, groups, flops):
    """TF/s of the conv, slope-timed with the conv INPUT as the scan
    carry (one-element perturbation per step, so XLA can neither hoist
    the loop-invariant conv out of the scan nor DCE it — a plain
    `acc + o[0]` body compiles to ZERO convolutions, verified)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, hw_in, hw_in, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (k, k, cin // groups, cout)),
                    jnp.bfloat16)

    def conv(wi, xi):
        return jax.lax.conv_general_dilated(
            xi, wi, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    return op_tflops(conv, w, x, flops)


def conv_cost(hw_in, cin, cout, k, stride, groups):
    hw_out = hw_in // stride
    flops = 2 * B * hw_out * hw_out * cout * (cin // groups) * k * k
    hbm = 2 * (B * hw_in * hw_in * cin + B * hw_out * hw_out * cout)
    return flops, hbm


# (name, count_in_network, hw_in, cin, cout, k, stride, groups) for
# resnext50_32x4d (blocks 3/4/6/3, groups=32, width_per_group=4 → stage
# widths 128/256/512/1024, outs 256/512/1024/2048), 224px input.
def network_convs():
    convs = [("stem7x7", 1, 224, 3, 64, 7, 2, 1)]
    spec = [  # (stage, hw, in0, width, out, blocks)
        (1, 56, 64, 128, 256, 3),
        (2, 56, 256, 256, 512, 4),     # first block strides 56→28
        (3, 28, 512, 512, 1024, 6),    # 28→14
        (4, 14, 1024, 1024, 2048, 3),  # 14→7
    ]
    for s, hw, in0, w, out, blocks in spec:
        stride = 1 if s == 1 else 2
        hw_mid = hw // stride
        convs += [
            (f"s{s}_reduce_first", 1, hw, in0, w, 1, 1, 1),
            (f"s{s}_g3x3_first", 1, hw, w, w, 3, stride, 32),
            (f"s{s}_down", 1, hw, in0, out, 1, stride, 1),
            (f"s{s}_reduce", blocks - 1, hw_mid, out, w, 1, 1, 1),
            (f"s{s}_g3x3", blocks - 1, hw_mid, w, w, 3, 1, 32),
            (f"s{s}_expand", blocks, hw_mid, w, out, 1, 1, 1),
        ]
    return convs


def main():
    print("backend:", jax.default_backend(), flush=True)
    total_flops = 0.0
    total_time = 0.0
    grouped_flops = grouped_time = 0.0
    report = {}
    for name, count, hw, cin, cout, k, stride, groups in network_convs():
        flops, hbm = conv_cost(hw, cin, cout, k, stride, groups)
        tfs = timed_conv_tflops(hw, cin, cout, k, stride, groups, flops)
        hbm_bound = flops / (hbm / (HBM_GBPS * 1e9)) / 1e12
        total_flops += count * flops
        total_time += count * flops / (tfs * 1e12)
        if groups > 1:
            grouped_flops += count * flops
            grouped_time += count * flops / (tfs * 1e12)
        print(f"{name:16s} x{count}  {flops/1e9:7.2f} GF  {tfs:6.1f} TF/s"
              f"  ({100*tfs/PEAK_TFLOPS:4.1f}%; HBM roofline"
              f" {hbm_bound:6.1f})", flush=True)
        report[name] = {"count": count, "gflops": flops / 1e9,
                        "tflops_s": tfs,
                        "hbm_roofline_tflops_s": hbm_bound}
    bound = total_flops / total_time / 1e12
    print(f"\nFLOPs-weighted conv bound for resnext50 fwd: {bound:.1f} TF/s"
          f" = {100*bound/PEAK_TFLOPS:.1f}% MFU ceiling", flush=True)
    if grouped_time:
        gb = grouped_flops / grouped_time / 1e12
        print(f"grouped-conv share: {100*grouped_flops/total_flops:.0f}% of"
              f" FLOPs at {gb:.1f} TF/s; 1x1 share at "
              f"{(total_flops-grouped_flops)/(total_time-grouped_time)/1e12:.1f}"
              f" TF/s", flush=True)
    report["weighted_bound_tflops_s"] = bound
    report["weighted_bound_mfu_pct"] = 100 * bound / PEAK_TFLOPS
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "resnext_shape_bound.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
