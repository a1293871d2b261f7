"""Mosaic feasibility probe for DMA-gathered window blocks (PERF lever #1).

`swin_overhead_ablation.json` priced the XLA window partition/reverse
transposes at 12.6% of swin_base_384 e2e.  The fix idea: feed the fused
window-block kernel a 6-D *view* `(B, nH, w, nW, w, C)` of the padded
feature map (splitting dims = free reshape, no copy) and let the
BlockSpec DMA gather the strided window rows — the transpose disappears
into the kernel's input pipeline.  Feasibility hinges on Mosaic
supporting two in-kernel ops this probe tests in isolation:

  1. merge reshape (w, w, C) -> (w*w, C) with w = 12 (sublane dim 12 is
     not 8-aligned — CLAUDE.md records "unsupported shape cast" failures
     for such casts) and w = 7;
  2. a 6-D BlockSpec block (1, 1, w, WBw, w, C) whose per-window slices,
     merged per (1), reproduce `window_partition` exactly.

Prints one JSON line per test; run on the real chip (compile support is
the question — interpret mode proves nothing).
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_torch_tpu.models.swin import window_partition


def probe_merge_reshape(w: int, C: int) -> dict:
    """In-kernel (w, w, C) -> (w*w, C) merge."""
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(w * w, C)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((w, w, C)),
                    jnp.float32)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((w * w, C), x.dtype),
        )(x)
        ok = bool(jnp.allclose(out, x.reshape(w * w, C)))
        return {"test": f"merge_reshape_w{w}_C{C}", "compiles": True,
                "correct": ok}
    except Exception as e:  # noqa: BLE001
        return {"test": f"merge_reshape_w{w}_C{C}", "compiles": False,
                "error": str(e)[:200]}


def probe_6d_gather(B: int, Hp: int, Wp: int, w: int, C: int,
                    wbw: int) -> dict:
    """6-D view block fetch: program (b, hi, wj) gets WBw windows of row-band
    hi; kernel merges each (w, w, C) slice and writes (Bn, N, C) windows.
    Output must equal window_partition(x, w)."""
    nH, nWc = Hp // w, Wp // w
    N = w * w

    def kernel(x_ref, o_ref):
        xb = x_ref[0, 0]                      # (w, WBw, w, C)
        for j in range(wbw):
            o_ref[j] = xb[:, j].reshape(N, C)

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((B, Hp, Wp, C)),
        jnp.float32)
    x6 = x.reshape(B, nH, w, nWc, w, C)       # free view (split dims only)
    grid = (B, nH, nWc // wbw)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B * nH * nWc, N, C), x.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec((1, 1, w, wbw, w, C),
                                   lambda b, h, j: (b, h, 0, j, 0, 0))],
            out_specs=pl.BlockSpec(
                (wbw, N, C),
                lambda b, h, j, nH=nH, nWc=nWc: (
                    (b * nH + h) * (nWc // wbw) + j, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )(x6)
        ref = window_partition(x, w)
        ok = bool(jnp.allclose(out, ref))
        return {"test": f"6d_gather_w{w}_C{C}_wbw{wbw}", "compiles": True,
                "correct": ok}
    except Exception as e:  # noqa: BLE001
        return {"test": f"6d_gather_w{w}_C{C}_wbw{wbw}", "compiles": False,
                "error": str(e)[:200]}


def probe_6d_scatter(B: int, Hp: int, Wp: int, w: int, C: int,
                     wbw: int) -> dict:
    """Inverse: kernel reads (WBw, N, C) windows, splits each back to
    (w, w, C), writes the 6-D view block — must equal window_reverse."""
    nH, nWc = Hp // w, Wp // w
    N = w * w

    def kernel(x_ref, o_ref):
        for j in range(wbw):
            o_ref[0, 0, :, j] = x_ref[j].reshape(w, w, C)

    rng = np.random.default_rng(2)
    wins = jnp.asarray(rng.standard_normal((B * nH * nWc, N, C)), jnp.float32)
    grid = (B, nH, nWc // wbw)
    try:
        out6 = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, nH, w, nWc, w, C),
                                           wins.dtype),
            grid=grid,
            in_specs=[pl.BlockSpec(
                (wbw, N, C),
                lambda b, h, j, nH=nH, nWc=nWc: (
                    (b * nH + h) * (nWc // wbw) + j, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, w, wbw, w, C),
                                   lambda b, h, j: (b, h, 0, j, 0, 0)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
        )(wins)
        out = out6.reshape(B, Hp, Wp, C)
        from vit_torch_tpu.models.swin import window_reverse
        ref = window_reverse(wins, w, Hp, Wp)
        ok = bool(jnp.allclose(out, ref))
        return {"test": f"6d_scatter_w{w}_C{C}_wbw{wbw}", "compiles": True,
                "correct": ok}
    except Exception as e:  # noqa: BLE001
        return {"test": f"6d_scatter_w{w}_C{C}_wbw{wbw}", "compiles": False,
                "error": str(e)[:200]}


def main() -> None:
    results = []
    for w, C in ((12, 128), (7, 128)):
        r = probe_merge_reshape(w, C)
        print(json.dumps(r), flush=True)
        results.append(r)
    # swin_base_384 stage-1 shape: Hp=Wp=96, w=12, C=128, 8 windows/row
    for (w, C, hp, wbw) in ((12, 128, 96, 8), (12, 128, 96, 4),
                            (7, 128, 56, 8)):
        r = probe_6d_gather(2, hp, hp, w, C, wbw)
        print(json.dumps(r), flush=True)
        results.append(r)
        r = probe_6d_scatter(2, hp, hp, w, C, wbw)
        print(json.dumps(r), flush=True)
        results.append(r)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "window_gather_probe.json")
    with open(out, "w") as f:
        json.dump({"backend": jax.default_backend(), "results": results},
                  f, indent=1)


if __name__ == "__main__":
    main()
