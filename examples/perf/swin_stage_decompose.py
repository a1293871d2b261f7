"""Per-stage, per-block Swin cost decomposition (round-5 swin_tiny probe).

VERDICT r4 names swin_tiny's 18.0% MFU vs its ~41% unfused-op bound the
largest open perf gap and proposes two levers (stage-4 MLP-split fusion,
w=7 between-block glue).  Before building either, this probe measures where
the time actually goes, stage by stage:

- per-stage per-block time by DEPTH SLOPE: time the forward at base depths
  and at +2 blocks in one stage; Δt/2 is that stage's per-block cost with
  everything shared (stem, merges, head, dispatch floor) cancelled exactly
  — the same floor-cancelling trick as slope_timing.py, over depth instead
  of reps;
- the glue floor: depths (0,0,0,0) keeps the stem, all three PatchMerging
  ops, the final LN/avgpool and the head, with zero blocks;
- each variant twice: fused full-block kernel ON (default) and OFF
  (VITX_FUSED_FULL=0 → band kernel + XLA LN/MLP) → the kernel's per-stage
  win/loss, not just the e2e aggregate.

Per-block FLOPs are analytic (swin_flops accounting) so each stage gets a
TF/s and an MFU column comparable to PERF.md's shape-bound tables.

Writes examples/perf/swin_stage_decompose.json.
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

STEPS = 20
BS = 32
PEAK_TFS = 197.0  # v5e bf16


def build_run(cfg, size, dtype=jnp.bfloat16):
    from vit_torch_tpu.models.swin import SwinTransformer
    model = SwinTransformer(cfg, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3), dtype))

    @jax.jit
    def run_chunk(variables, images):
        def one(_, img):
            return 0, model.apply(variables, img, True)
        _, feats = jax.lax.scan(one, 0, images)
        return feats

    return run_chunk, variables


def bench(cfg, size) -> float:
    """min wall seconds for STEPS batches (one dispatch, D2H fenced)."""
    run_chunk, variables = build_run(cfg, size)
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.standard_normal(
        (STEPS, BS, size, size, 3), dtype=np.float32).astype(jnp.bfloat16))
    variables = jax.device_put(variables)
    out = run_chunk(variables, images)
    float(out[-1, 0, 0])                      # compile + fence
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_chunk(variables, images)
        float(out[-1, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def block_flops(cfg, size, stage: int) -> int:
    """Analytic fwd FLOPs of ONE block of `stage` at batch BS
    (swin_flops accounting: qkv+attn+proj+mlp)."""
    gh = size // cfg.patch_size
    H_ = W_ = gh // (2 ** stage)
    dim = cfg.embed_dim * (2 ** stage)
    n = H_ * W_
    ws = min(cfg.window_size, H_, W_) ** 2
    f = 2 * n * dim * dim * 3 + 2 * n * ws * dim * 2 + 2 * n * dim * dim \
        + 2 * n * dim * int(dim * cfg.mlp_ratio) * 2
    return BS * f


def main() -> None:
    from vit_torch_tpu.models.swin import SWIN_CONFIGS
    arch = sys.argv[1] if len(sys.argv) > 1 else "swin_tiny_patch4_window7_224"
    size = 384 if "384" in arch else 224
    base = SWIN_CONFIGS[arch]
    base = dataclasses.replace(base, drop_path_rate=0.0)
    n_stages = len(base.depths)

    variants = {"base": base.depths,
                "glue": tuple(0 for _ in base.depths)}
    for s in range(n_stages):
        d = list(base.depths)
        d[s] += 2
        variants[f"s{s}+2"] = tuple(d)

    out = {"device": jax.devices()[0].device_kind, "arch": arch, "bs": BS,
           "steps_per_dispatch": STEPS, "modes": {}}
    for mode, env in (("fused_full", ""), ("no_full", "0")):
        os.environ["VITX_FUSED_FULL"] = env
        times = {}
        for name, depths in variants.items():
            cfg = dataclasses.replace(base, depths=depths)
            t = bench(cfg, size)
            times[name] = t
            print(f"{mode} {name} depths={depths}: "
                  f"{1000 * t / STEPS:.3f} ms/batch", flush=True)
        rows = []
        t_base = times["base"]
        for s in range(n_stages):
            dt = (times[f"s{s}+2"] - t_base) / 2 / STEPS   # s per block-batch
            fl = block_flops(base, size, s)
            tfs = fl / dt / 1e12 if dt > 0 else float("inf")
            rows.append({
                "stage": s, "ms_per_block": round(1000 * dt, 4),
                "gflops_per_block": round(fl / 1e9, 2),
                "tf_per_s": round(tfs, 1),
                "mfu_pct": round(100 * tfs / PEAK_TFS, 1),
                "blocks": base.depths[s],
                "stage_ms_total": round(1000 * dt * base.depths[s], 3),
            })
        out["modes"][mode] = {
            "ms_per_batch": round(1000 * t_base / STEPS, 3),
            "glue_ms_per_batch": round(1000 * times["glue"] / STEPS, 3),
            "per_stage": rows,
            "accounted_ms": round(
                1000 * (times["glue"] / STEPS
                        + sum(r["stage_ms_total"] for r in rows)), 3),
        }
    os.environ.pop("VITX_FUSED_FULL", None)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "swin_stage_decompose.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["modes"], indent=1))


if __name__ == "__main__":
    main()
