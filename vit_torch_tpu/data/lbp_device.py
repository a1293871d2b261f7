"""Device-side (jittable) Local Binary Patterns.

The reference's tire pipeline applies random AutoAugment on the RGB image
*before* ``lbp_merge`` every step (``utils_dataset_tire.py:81-90``,
``autoaugment_imagenet=True`` by default) — which is why it needed 16
DataLoader worker processes.  The host LBP path (``data/lbp.py``) precomputes
the channel stack once and therefore cannot sit *after* a random per-step
transform.  This module is the TPU answer: LBP as a compiled XLA program so
the full random pipeline (crop → flip → AutoAugment → LBP → normalize) runs
inside the jitted train step.

Key structural fact: every ring sample's offset is the SAME for all pixels,
so bilinear interpolation collapses to a weighted sum of four statically
shifted (edge-clamped) copies of the image — no gathers, just pads + slices
XLA fuses away.  Semantics match ``data/lbp.py`` / ``csrc/maskops.cpp``
exactly: skimage ring convention, ``>= center - 1e-4`` tie tolerance, the
reference's normalization ranges (``utils_datasets.py:1120-1133``), and
PIL-exact fixed-point gray conversion.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from vit_torch_tpu.data.lbp import LBP_METHODS, _method_range


def rgb_to_gray_uint8_device(img: jax.Array) -> jax.Array:
    """PIL ``convert('L')`` bit-exact on device: ``(19595 R + 38470 G +
    7471 B + 0x8000) >> 16`` (see ``lbp.rgb_to_gray_uint8``).  Input
    (..., 3) uint8/float of integer values; output float32 of integers."""
    if img.shape[-1] == 1:
        return img[..., 0].astype(jnp.float32)
    v = img.astype(jnp.int32)
    lum = (19595 * v[..., 0] + 38470 * v[..., 1] + 7471 * v[..., 2]
           + 0x8000) >> 16
    return lum.astype(jnp.float32)


def _shifted(padded: jax.Array, pad: int, dy: int, dx: int, H: int,
             W: int) -> jax.Array:
    """Edge-clamped shift of the last-two-dims image via a static slice of
    the pre-padded array (pad ≥ |dy|, |dx|)."""
    return padded[..., pad + dy:pad + dy + H, pad + dx:pad + dx + W]


def lbp_bits(gray: jax.Array, n_points: int, radius: float) -> jax.Array:
    """Neighbor-comparison bits, shape (P, ..., H, W) float32 in {0, 1}.

    ``gray`` is (..., H, W); the ring follows the skimage convention
    (p=0 due east, counter-clockwise)."""
    H, W = gray.shape[-2], gray.shape[-1]
    pad = int(math.ceil(radius)) + 1
    padded = jnp.pad(gray, [(0, 0)] * (gray.ndim - 2) + [(pad, pad)] * 2,
                     mode="edge")
    bits = []
    for p in range(n_points):
        angle = 2 * math.pi * p / n_points
        sy, sx = -radius * math.sin(angle), radius * math.cos(angle)
        y0, x0 = math.floor(sy), math.floor(sx)
        fy, fx = sy - y0, sx - x0
        v = ((1 - fy) * (1 - fx) * _shifted(padded, pad, y0, x0, H, W)
             + (1 - fy) * fx * _shifted(padded, pad, y0, x0 + 1, H, W)
             + fy * (1 - fx) * _shifted(padded, pad, y0 + 1, x0, H, W)
             + fy * fx * _shifted(padded, pad, y0 + 1, x0 + 1, H, W))
        # tie tolerance matches the host kernels (flat regions read >= center)
        bits.append((v >= gray - 1e-4).astype(jnp.float32))
    return jnp.stack(bits)


def lbp_map(gray: jax.Array, n_points: int, radius: float,
            method: str) -> jax.Array:
    """LBP code map (same semantics as ``lbp._lbp_numpy``), float32."""
    P = n_points
    bits = lbp_bits(gray, P, radius)
    if method in ("default", "ror"):
        codes = sum(bits[p].astype(jnp.uint32) << jnp.uint32(p)
                    for p in range(P))
        if method == "default":
            return codes.astype(jnp.float32)
        mask = jnp.uint32((1 << P) - 1)
        best = codes
        for s in range(1, P):
            rot = ((codes >> jnp.uint32(s))
                   | (codes << jnp.uint32(P - s))) & mask
            best = jnp.minimum(best, rot)
        return best.astype(jnp.float32)
    transitions = jnp.sum(
        (bits != jnp.roll(bits, -1, axis=0)).astype(jnp.float32), axis=0)
    ones = jnp.sum(bits, axis=0)
    if method == "uniform":
        return jnp.where(transitions <= 2, ones, float(P + 1))
    if method == "var":
        return jnp.var(
            lbp_vals(gray, P, radius), axis=0)
    if method == "nri_uniform":
        prev = jnp.roll(bits, 1, axis=0)
        rise = (bits == 1) & (prev == 0)
        first_rise = jnp.argmax(rise, axis=0).astype(jnp.float32)
        label = 1.0 + (ones - 1.0) * P + first_rise
        label = jnp.where(ones == 0, 0.0, label)
        label = jnp.where(ones == P, float(P * (P - 1) + 1), label)
        label = jnp.where(transitions > 2, float(P * (P - 1) + 2), label)
        return label
    raise ValueError(method)


def lbp_vals(gray: jax.Array, n_points: int, radius: float) -> jax.Array:
    """Interpolated ring values (P, ..., H, W) — used by the 'var' method."""
    H, W = gray.shape[-2], gray.shape[-1]
    pad = int(math.ceil(radius)) + 1
    padded = jnp.pad(gray, [(0, 0)] * (gray.ndim - 2) + [(pad, pad)] * 2,
                     mode="edge")
    vals = []
    for p in range(n_points):
        angle = 2 * math.pi * p / n_points
        sy, sx = -radius * math.sin(angle), radius * math.cos(angle)
        y0, x0 = math.floor(sy), math.floor(sx)
        fy, fx = sy - y0, sx - x0
        vals.append((1 - fy) * (1 - fx) * _shifted(padded, pad, y0, x0, H, W)
                    + (1 - fy) * fx * _shifted(padded, pad, y0, x0 + 1, H, W)
                    + fy * (1 - fx) * _shifted(padded, pad, y0 + 1, x0, H, W)
                    + fy * fx * _shifted(padded, pad, y0 + 1, x0 + 1, H, W))
    return jnp.stack(vals)


def lbp_merge_device(images: jax.Array, radius: int = 1, point_mult: int = 8,
                     methods: Sequence[str] = ("l", "default", "uniform"),
                     ) -> jax.Array:
    """Device twin of ``lbp.get_lbp_merge`` for a BATCH: (B, H, W, 3) uint8
    RGB → (B, H, W, len(methods)) float32 with uint8-equivalent values
    (each channel in [0, 255], quantized like the host path)."""
    n_points = min(point_mult * radius, 24)
    gray = rgb_to_gray_uint8_device(images)          # (B, H, W) float32
    channels = []
    for m in methods:
        if m == "l":
            channels.append(gray)
        elif m in ("r", "g", "b"):
            channels.append(images[..., "rgb".index(m)].astype(jnp.float32))
        elif m in LBP_METHODS:
            lo, hi = _method_range(m, n_points)
            code = lbp_map(gray, n_points, float(radius), m)
            scaled = (code - lo) / (hi - lo) * 255.0
            # match the host path's uint8 cast (truncation after clip)
            channels.append(jnp.floor(jnp.clip(scaled, 0.0, 255.0)))
        else:
            raise ValueError(m)
    return jnp.stack(channels, axis=-1)
