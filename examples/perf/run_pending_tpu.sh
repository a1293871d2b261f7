#!/bin/sh
# Pending on-chip measurement queue (written during the round-3 tunnel
# outage).  Run from the repo root when the TPU tunnel is healthy:
#
#   sh examples/perf/run_pending_tpu.sh
#
# Captures, in order of value:
#  1. int8-vs-bf16 MXU rates at the ViT projection shapes (decides the
#     W8A8 serving lever) -> examples/perf/int8_matmul_probe.json
#  2. e2e int8 serving throughput -> examples/inference_bench_tpu.json
#  3. resnext50 per-conv-shape roofline (11.7%-MFU investigation)
#     -> examples/perf/resnext_shape_bound.json
# Then write the PERF.md lever-#2 ledger entry from 1+2 and the roofline
# conclusion from 3.
#  4. AOT bundle serving throughput (bf16 vs dynamic-int8 vs prequant
#     int8 artifacts) -> examples/bundle_bench_tpu.json
set -x
timeout 900 python examples/perf/int8_matmul_probe.py
timeout 1800 python examples/bench_inference.py --w8a8
timeout 1200 python examples/perf/resnext_shape_bound.py
timeout 1800 python examples/bench_bundle.py
#  5. zoo sweep refresh: adds the resnext101/swin_base_224 rows (the two
#     remaining configs with logged reference baselines, vs_baseline
#     ratios for 5 of 10 rows)
timeout 3600 python examples/bench_zoo.py
#  6. mask-head results: segm-AP convergence (DETR+masks) and the
#     panoptic PQ curve on the synthetic panoptic set — the two remaining
#     eval protocols without a convergence artifact
timeout 5400 python examples/run_detr_masks_synthetic.py
timeout 5400 python examples/run_panoptic_synthetic.py
