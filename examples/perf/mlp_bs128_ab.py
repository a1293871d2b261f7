"""A/B the opt-in fused MLP kernel at the vits16 bs128 operating point.

The bs128 ledger (PERF.md) traced the residual dino_vits16 inversion
(8399 img/s bs32 → 4663 bs128) to the MLP's per-image degradation at
large T (`fwd_bs_decompose.json`: 6.9 → 9.1 µs/img) — the fp32 GELU
intermediate and the 4C hidden stream through HBM once activations
outgrow VMEM residency.  The fused MLP kernel (`ops/fused_mlp.py`)
measured *neutral-to-slower* at bs32 (PERF.md round-2 ledger) but was
never tried in the large-T regime it should help most.

Runs the exact zoo-bench lineareval train step (bench.bench_config) for
dino_vits16 at bs32/bs128 with VITX_FUSED_MLP unset vs =1 and records
all four points to ``mlp_bs128_ab.json``.

Usage: python examples/perf/mlp_bs128_ab.py [--arch dino_vits16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import bench  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="dino_vits16")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "mlp_bs128_ab.json"))
    args = p.parse_args()

    rows = []
    if os.path.exists(args.out):
        with open(args.out) as f:
            rows = json.load(f)["rows"]
    for bs in (32, 128):
        for fused in (False, True):
            tag = "fused_mlp" if fused else "xla_mlp"
            cfg = {"name": f"{args.arch} lineareval {args.size}px bs{bs} "
                           f"[{tag}]",
                   "arch": args.arch, "image_size": args.size, "bs": bs,
                   "lineareval": True, "baseline_img_s": None}
            prev = os.environ.pop("VITX_FUSED_MLP", None)
            if fused:
                os.environ["VITX_FUSED_MLP"] = "1"
            try:
                r = bench.bench_config(cfg)
            except Exception as e:      # keep the A/B alive per-point
                r = {"name": cfg["name"],
                     "error": f"{type(e).__name__}: {e}"}
            finally:
                if prev is not None:
                    os.environ["VITX_FUSED_MLP"] = prev
                else:
                    os.environ.pop("VITX_FUSED_MLP", None)
            r["bs"], r["fused"] = bs, fused
            print(json.dumps(r), flush=True)
            rows = [x for x in rows if x.get("name") != r["name"]] + [r]
            with open(args.out, "w") as f:
                json.dump({"rows": rows}, f, indent=1)
    print("saved", args.out, flush=True)


if __name__ == "__main__":
    main()
