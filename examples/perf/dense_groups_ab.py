"""Regroup-factor (m) sweep for the block-diagonal dense grouped-conv
lowering (`models/layers.py:dense_regroup_factor`).

The first ablation (`resnext_ablation.json`) showed XLA:TPU serializes a
32-group conv into 32 thin contractions and that FULL dense (m=32) wins
big for resnext50 (cg=4).  This sweep maps the intermediate points —
m adjacent groups merged into one `m*cg`-wide contraction at m* the
FLOPs for that site — for resnext101_32x8d (cg=8), where the FLOP
blowup is 2* resnext50's per m and full dense is not obviously right.

Each point is the production finetune train step (device augment + fwd
+ bwd + adamw), slope-timed via bench.bench_config.  VITX_DENSE_GROUPS
forces m (0 = native XLA grouped; an integer forces that factor, which
`dense_regroup_factor` clamps to a divisor of G=32).

Writes examples/perf/dense_groups_ab.json; the auto table in
`dense_regroup_factor` must match the argmax rows of this artifact.

Notes on artifact interpretation:
- A forced uniform m applies to EVERY grouped-conv site, while the auto
  table is per-cg; pass ``--ms auto`` to sweep the actual default (env
  unset, per-cg table) so the artifact directly validates it.
- resnext50_32x4d rows here cover only m=8/16/32; its m=1/32 endpoints
  (native vs full dense) live in ``resnext_ablation.json``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import bench  # noqa: E402

SWEEP_M = (1, 2, 4, 8, 16, 32)


def run_point(arch: str, bs: int, size: int, m,
              lineareval: bool) -> dict:
    mode = "lineareval" if lineareval else "finetune"
    cfg = {"name": f"{arch} {mode} {size}px bs{bs} [m={m}]",
           "arch": arch, "image_size": size, "bs": bs,
           "lineareval": lineareval, "baseline_img_s": None}
    prev = os.environ.get("VITX_DENSE_GROUPS")
    if m == "auto":        # env unset → the shipped per-cg auto table
        os.environ.pop("VITX_DENSE_GROUPS", None)
    else:
        os.environ["VITX_DENSE_GROUPS"] = "0" if m == 1 else str(m)
    try:
        out = bench.bench_config(cfg)
    finally:
        if prev is None:
            os.environ.pop("VITX_DENSE_GROUPS", None)
        else:
            os.environ["VITX_DENSE_GROUPS"] = prev
    out["m"] = m
    out["arch"] = arch
    out["mode"] = mode
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="resnext101_32x8d")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--lineareval", action="store_true")
    p.add_argument("--ms", default=None,
                   help="comma list of m values (default full sweep)")
    args = p.parse_args()
    ms = ([x if x == "auto" else int(x) for x in args.ms.split(",")]
          if args.ms else SWEEP_M)

    out_fp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "dense_groups_ab.json")
    rows = []
    if os.path.exists(out_fp):
        with open(out_fp) as f:
            rows = json.load(f)["rows"]
    for m in ms:
        try:
            r = run_point(args.arch, args.bs, args.size, m, args.lineareval)
        except Exception as e:  # keep the sweep alive per-point
            r = {"m": m, "arch": args.arch,
                 "mode": "lineareval" if args.lineareval else "finetune",
                 "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(r), flush=True)
        rows = [x for x in rows
                if not (x.get("m") == m and x.get("arch") == args.arch
                        and x.get("mode") == r.get("mode"))] + [r]
        with open(out_fp, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
    print("saved", out_fp, flush=True)


if __name__ == "__main__":
    main()
