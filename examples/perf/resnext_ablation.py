"""Decompose resnext50's e2e-vs-conv-bound MFU gap (PERF.md resnext ledger).

The shape probe (`resnext_shape_bound.py`) put the unfused forward bound at
~27% MFU while the finetune train step runs 12.4%.  This probe splits the
gap by timing-only ablations of the FULL train step (same methodology as
bench.py: device augment + fwd + bwd + adamw, slope-timed):

- full:         unmodified train step (baseline; since the dense-groups
                rewrite SHIPPED as the GroupedConv default, this now runs
                block-diagonal dense 3x3s)
- grouped_xla:  VITX_DENSE_GROUPS=0 — XLA's native grouped conv (the
                pre-rewrite production path)
- fwd_only:     loss forward only, no grad/optimizer (backward share)
- no_bn:        BatchNorm -> identity (train-mode stats round-trips;
                numerics garbage, shapes preserved)
- dense_groups: grouped 3x3 -> dense 3x3 with ALL weights nonzero (32x
                the FLOPs but full 128-lane contraction) — the probe run
                of this variant motivated the shipped block-diagonal
                rewrite (same compute, exact numerics); kept for
                drift-checking
- no_group3x3:  grouped 3x3 -> strided slice (grouped-conv total share,
                fwd+bwd; channels/shapes preserved)

First measured sweep (resnext50 224px/bs32, pre-rewrite production =
grouped_xla at 975.7 img/s): dense_groups 1666 (+71%), no_group3x3 2594
— the grouped convs were ~62% of the step at 5.5% of the FLOPs.

Writes examples/perf/resnext_ablation.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import bench  # noqa: E402
import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

VARIANTS = ("full", "grouped_xla", "fwd_only", "no_bn", "dense_groups",
            "no_group3x3")


class _Identity(nn.Module):
    @nn.compact
    def __call__(self, x, *a, **kw):
        return x


class _StridedSlice(nn.Module):
    strides: tuple

    @nn.compact
    def __call__(self, x):
        s = self.strides[0]
        return x[:, ::s, ::s, :] if s > 1 else x


def _patched_grouped(orig_grouped, mode: str):
    def make(*args, **kw):
        if kw.get("groups", 1) > 1:
            if mode == "no_group3x3":
                st = kw.get("strides", 1)
                st = (st, st) if isinstance(st, int) else tuple(st)
                return _StridedSlice(strides=st, name=kw.get("name"))
            if mode == "dense_groups":
                kw = dict(kw, groups=1)
        return orig_grouped(*args, **kw)
    return make


def run_variant(variant: str, cfg: dict) -> dict:
    import vit_torch_tpu.models.resnet as R

    orig_grouped, orig_bn = R.GroupedConv, nn.BatchNorm
    env_prev = os.environ.get("VITX_DENSE_GROUPS")
    try:
        if variant == "no_bn":
            R.nn.BatchNorm = lambda **kw: _Identity(name=kw.get("name"))
        elif variant in ("dense_groups", "no_group3x3"):
            R.GroupedConv = _patched_grouped(orig_grouped, variant)
        elif variant == "grouped_xla":
            os.environ["VITX_DENSE_GROUPS"] = "0"
        elif variant == "fwd_only":
            cfg = dict(cfg, lineareval=True, fwd_only=True)
        out = bench.bench_config(cfg)
    finally:
        R.GroupedConv, R.nn.BatchNorm = orig_grouped, orig_bn
        if env_prev is None:
            os.environ.pop("VITX_DENSE_GROUPS", None)
        else:
            os.environ["VITX_DENSE_GROUPS"] = env_prev
    out["variant"] = variant
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="resnext50_32x4d")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--only", default=None)
    args = p.parse_args()

    out_fp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "resnext_ablation.json")
    rows = []
    if args.only and os.path.exists(out_fp):
        with open(out_fp) as f:
            rows = json.load(f)["rows"]
    for variant in VARIANTS:
        if args.only and args.only not in variant:
            continue
        cfg = {"name": f"{args.arch} finetune {args.size}px bs{args.bs} "
                       f"[{variant}]",
               "arch": args.arch, "image_size": args.size, "bs": args.bs,
               "lineareval": False, "baseline_img_s": None}
        try:
            r = run_variant(variant, cfg)
        except Exception as e:  # keep the sweep alive per-variant
            r = {"variant": variant, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(r), flush=True)
        rows = [x for x in rows if x.get("variant") != variant] + [r]
        with open(out_fp, "w") as f:
            json.dump({"arch": args.arch, "bs": args.bs, "size": args.size,
                       "rows": rows}, f, indent=1)
    print("saved", out_fp, flush=True)


if __name__ == "__main__":
    main()
