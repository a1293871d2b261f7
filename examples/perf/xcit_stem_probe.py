"""Pinpoint where ConvPatchEmbed's e2e cost goes (xcit overhead ablation:
the stem is 23% of xcit_small_12_p16's forward wall time — ~2.6× its
isolated conv-rate bound).

Slope-times the stem module ALONE (per-batch = Δwall/Δscan-length over
10/40-step chunks) in variants that strip one ingredient at a time:

- full:        conv3x3s2 + BN(eval) + GELU ×4 (the production stem)
- no_bn:       BatchNorm -> identity
- no_gelu:     GELU -> identity
- convs_only:  both off (pure conv3x3s2 chain)
- s2d_first:   full stem, but the 3->48 first conv runs as a 2×2-block
               space-to-depth conv2x2 on (112,112,12) with the SAME
               3x3x3x48 weights scattered into a (2,2,12,48) kernel —
               mathematically identical sums, TPU-friendlier input depth
               (the MLPerf-ResNet stem trick)
- train_bn:    full stem with BN in train mode (batch-stats passes)
- gelu_poly:   GELU via the A&S 7.1.26 erf polynomial in fp32 (|err| ≤
               1.5e-7 — below bf16 resolution) instead of jax.lax.erf
- gelu_bf16:   GELU with the erf evaluated in bf16 (no fp32 upcast)
- bn_fold:     eval-mode BN folded into the conv weights (w*=a, +b) —
               exact same math modulo fp association
- best:        gelu_poly + bn_fold combined

Writes examples/perf/xcit_stem_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

CHUNKS = (10, 40)
TRIALS = 3
BS = 32
SIZE = 224
WIDTHS = [48, 96, 192, 384]        # xcit_small_12_p16 (patch 16)


def s2d_first_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """conv3x3 stride-2 pad-1 on (B,H,W,3) == conv2x2 stride-1 on the
    2×2 space-to-depth view (B,H/2,W/2,12) with ``w`` (3,3,3,C) scattered
    into a (2,2,12,C) kernel.  Output pixel (i,j) of the original conv
    reads input rows/cols 2i-1..2i+1 ⊂ blocks (i-1..i)×(j-1..j)."""
    B, H, W, Cin = x.shape
    C = w.shape[-1]
    xb = x.reshape(B, H // 2, 2, W // 2, 2, Cin).transpose(0, 1, 3, 2, 4, 5)
    xb = xb.reshape(B, H // 2, W // 2, 4 * Cin)         # (di*2+dj)*Cin + c
    # scatter: original tap (ki, kj) sits at absolute offset (ki-1, kj-1)
    # from the output's 2× anchor; block index bi = (ki-1)//2 + 1 in the
    # 2x2 kernel (pad-left alignment), within-block di = (ki-1) % 2.
    w2 = jnp.zeros((2, 2, 4 * Cin, C), w.dtype)
    for ki in range(3):
        for kj in range(3):
            ai, aj = ki - 1, kj - 1                     # -1, 0, 1
            bi, di = (ai + 2) // 2, (ai + 2) % 2        # kernel pos, sub-row
            bj, dj = (aj + 2) // 2, (aj + 2) % 2
            sl = (di * 2 + dj) * Cin
            w2 = w2.at[bi, bj, sl:sl + Cin].set(w[ki, kj])
    return jax.lax.conv_general_dilated(
        xb, w2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _erf_poly(x):
    """fp32 erf via Abramowitz & Stegun 7.1.26 (|err| ≤ 1.5e-7) — the
    same polynomial ops/fused_mlp.py carries in-kernel."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x, variant):
    if variant in ("gelu_poly", "best"):
        x32 = x.astype(jnp.float32)
        return (0.5 * x32 * (1.0 + _erf_poly(x32 * 2.0 ** -0.5))).astype(
            x.dtype)
    if variant == "gelu_bf16":
        return 0.5 * x * (1.0 + jax.lax.erf(x * jnp.bfloat16(2.0 ** -0.5)))
    x32 = x.astype(jnp.float32)
    return (0.5 * x32 * (1.0 + jax.lax.erf(x32 * 2.0 ** -0.5))).astype(
        x.dtype)


class Stem(nn.Module):
    variant: str = "full"
    dtype: object = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        v = self.variant
        use_bn = v not in ("no_bn", "convs_only")
        use_gelu = v not in ("no_gelu", "convs_only")
        train_bn = v == "train_bn"
        fold_bn = v in ("bn_fold", "best")
        for i, w in enumerate(WIDTHS):
            if fold_bn:
                # eval BN folded into the conv: w' = w*a, bias = b
                kern = self.param(f"conv{i}_fkernel",
                                  nn.initializers.lecun_normal(),
                                  (3, 3, (3 if i == 0 else WIDTHS[i - 1]), w),
                                  jnp.float32)
                a = self.param(f"bn{i}_a", nn.initializers.ones,
                               (w,), jnp.float32)
                b = self.param(f"bn{i}_b", nn.initializers.zeros,
                               (w,), jnp.float32)
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), (kern * a).astype(self.dtype),
                    window_strides=(2, 2), padding=((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = x + b.astype(self.dtype)
            else:
                if i == 0 and v == "s2d_first":
                    kern = self.param(f"conv{i}_kernel",
                                      nn.initializers.lecun_normal(),
                                      (3, 3, 3, w), jnp.float32)
                    x = s2d_first_conv(x.astype(self.dtype),
                                       kern.astype(self.dtype))
                else:
                    x = nn.Conv(w, (3, 3), strides=2, padding=1,
                                use_bias=False, dtype=self.dtype,
                                name=f"conv{i}")(x)
                if use_bn:
                    x = nn.BatchNorm(use_running_average=not train_bn,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype, name=f"bn{i}")(x)
            if use_gelu and i < len(WIDTHS) - 1:
                x = _gelu(x, v)
        return x


def bench(variant: str) -> dict:
    stem = Stem(variant=variant)
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.standard_normal(
        (max(CHUNKS), BS, SIZE, SIZE, 3), dtype=np.float32
    ).astype(jnp.bfloat16))
    variables = jax.device_put(stem.init(jax.random.PRNGKey(0),
                                         images[0][:1]))
    mutable = ["batch_stats"] if variant == "train_bn" else False

    mins = []
    for length in CHUNKS:
        @jax.jit
        def run_chunk(variables, images):
            def one(_, img):
                if mutable:
                    y, _ = stem.apply(variables, img, mutable=mutable)
                else:
                    y = stem.apply(variables, img)
                return 0, jnp.sum(y[:, 0, 0, :1])
            _, outs = jax.lax.scan(one, 0, images[:length])
            return outs
        outs = run_chunk(variables, images)
        float(outs[-1])
        best = float("inf")
        for _ in range(TRIALS):
            t0 = time.perf_counter()
            outs = run_chunk(variables, images)
            float(outs[-1])
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    dt = (mins[1] - mins[0]) / (CHUNKS[1] - CHUNKS[0])
    return {"variant": variant, "ms_per_batch": round(1000 * dt, 3)}


def check_s2d_equivalence() -> float:
    """Max |s2d conv - lax conv3x3s2| on random data (fp32)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8)), jnp.float32)
    @jax.jit
    def diff(x, w):
        ref = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.max(jnp.abs(ref - s2d_first_conv(x, w)))
    return float(diff(x, w))


def main() -> None:
    err = check_s2d_equivalence()
    print(f"s2d equivalence max err: {err:.2e}", flush=True)
    assert err < 1e-4, "s2d rewrite is not equivalent"
    results = []
    for variant in ("full", "no_bn", "no_gelu", "convs_only", "s2d_first",
                    "train_bn", "gelu_poly", "gelu_bf16", "bn_fold", "best"):
        r = bench(variant)
        print(json.dumps(r), flush=True)
        results.append(r)
    base = results[0]["ms_per_batch"]
    for r in results[1:]:
        r["saved_pct"] = round(100 * (base - r["ms_per_batch"]) / base, 1)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "xcit_stem_probe.json")
    with open(out, "w") as f:
        json.dump({"device": jax.devices()[0].device_kind,
                   "bs": BS, "size": SIZE, "widths": WIDTHS,
                   "chunk_lengths": CHUNKS, "s2d_max_err": err,
                   "results": results}, f, indent=1)
    print("saved", out, flush=True)


if __name__ == "__main__":
    main()
