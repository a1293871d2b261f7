"""Slope-based op timing for the tunneled TPU: per-op seconds free of the
per-dispatch floor.

Why: a dispatch on this box carries a ~22 ms fixed cost (tunnel RTT +
runtime overhead) that is INDEPENDENT of the program.  A scan-amortized
probe at REPS=50 therefore reads ``(22 ms + 50·t_op)/50`` — for any op
under ~0.5 ms the floor dominates and every shape "measures" ~0.45 ms/rep
regardless of FLOPs.  This poisoned the first round of shape-bound probes:
a qkv matmul that truly runs at ~139 TF/s read 11.7 TF/s at REPS=50
(measured 2026-08: T=6272 qkv read 0.476 ms/rep at REPS=50 but 0.149 at
REPS=200; the rep-count SLOPE gives t_op = 40 us = 139 TF/s, and the same
op at T=100352 slope-times at 180 TF/s).

Fix: time the same scan at two rep counts and take the slope
``(T(R2) - T(R1)) / (R2 - R1)`` — every per-dispatch constant (tunnel RTT,
argument donation, D2H fence) cancels exactly.  min-of-trials per rep
count suppresses dispatch jitter.

The scan body must still carry a data dependence from each step's output
into the next step's input, or XLA hoists the loop-invariant op and the
slope measures an empty loop; the one-element ``.at[].add()`` perturbation
below forces a full recompute per step (O(1) extra work).
"""
import time

import jax
import jax.numpy as jnp


def _build(fn, b_ndim, reps):
    idx = (0,) * b_ndim

    @jax.jit
    def run(a, b):
        def step(c, _):
            o = fn(a, c)
            s = o.reshape(-1)[0]
            c = c.at[idx].add((s * 1e-6).astype(c.dtype))
            return c, s
        _, ys = jax.lax.scan(step, b, None, length=reps)
        return ys[-1]

    return run


def op_seconds(fn, a, b, reps=(50, 450), trials=4):
    """Per-invocation seconds of ``fn(a, b)``, dispatch floor removed.

    ``b`` is the scan carry (perturbed one element per step).  Returns the
    slope of min-of-``trials`` wall time over the two rep counts.
    """
    r1, r2 = reps
    mins = []
    for r in (r1, r2):
        run = _build(fn, b.ndim, r)
        float(run(a, b))                    # compile + warm, D2H fence
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(run(a, b))
            best = min(best, time.perf_counter() - t0)
        mins.append(best)
    return (mins[1] - mins[0]) / (r2 - r1)


def op_tflops(fn, a, b, flops, reps=(50, 450), trials=4):
    """TF/s of ``fn(a, b)`` via :func:`op_seconds`."""
    return flops / op_seconds(fn, a, b, reps=reps, trials=trials) / 1e12
