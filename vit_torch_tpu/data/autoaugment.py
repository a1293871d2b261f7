"""AutoAugment — device-side (jitted) implementation.

Capability parity with the reference's PIL-based AutoAugment policy classes
(``utils_datasets.py:62-338``): the ImageNet / CIFAR10 / STL10 / SVHN
sub-policy tables are reproduced verbatim (op, probability, magnitude-index
triples; the reference's STL10 table equals its ImageNet table), including
PIL semantics — nearest-neighbor affine warps with fill 128, signed
enhancement factors, PIL's equalize LUT construction, and unsigned rotation.

TPU redesign: instead of per-sample PIL calls in DataLoader workers, the
whole batch is augmented on device inside the train step.  Each sample draws
(policy index, two uniforms, two signs) from the step rng; ops dispatch via
``lax.switch`` (14 static branches compiled once) under ``vmap``.

Images are float32 in [0, 255] (H, W, C) inside the ops.
"""

from __future__ import annotations

import functools
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FILL = 128.0

OP_NAMES = ["shearX", "shearY", "translateX", "translateY", "rotate",
            "color", "posterize", "solarize", "contrast", "sharpness",
            "brightness", "autocontrast", "equalize", "invert"]
_OP_ID = {n: i for i, n in enumerate(OP_NAMES)}

# magnitude ranges, verbatim (utils_datasets.py:277-292)
_RANGES = {
    "shearX": np.linspace(0, 0.3, 10),
    "shearY": np.linspace(0, 0.3, 10),
    "translateX": np.linspace(0, 150 / 331, 10),
    "translateY": np.linspace(0, 150 / 331, 10),
    "rotate": np.linspace(0, 30, 10),
    "color": np.linspace(0.0, 0.9, 10),
    "posterize": np.round(np.linspace(8, 4, 10), 0).astype(int),
    "solarize": np.linspace(256, 0, 10),
    "contrast": np.linspace(0.0, 0.9, 10),
    "sharpness": np.linspace(0.0, 0.9, 10),
    "brightness": np.linspace(0.0, 0.9, 10),
    "autocontrast": [0] * 10,
    "equalize": [0] * 10,
    "invert": [0] * 10,
}

# ops whose factor gets a random ± sign in the reference
_SIGNED = {"shearX", "shearY", "translateX", "translateY", "color",
           "contrast", "sharpness", "brightness"}


def _P(*rows) -> List[Tuple]:
    return list(rows)

# (p1, op1, mag_idx1, p2, op2, mag_idx2) — verbatim tables
IMAGENET_POLICY = _P(
    (0.4, "posterize", 8, 0.6, "rotate", 9),
    (0.6, "solarize", 5, 0.6, "autocontrast", 5),
    (0.8, "equalize", 8, 0.6, "equalize", 3),
    (0.6, "posterize", 7, 0.6, "posterize", 6),
    (0.4, "equalize", 7, 0.2, "solarize", 4),
    (0.4, "equalize", 4, 0.8, "rotate", 8),
    (0.6, "solarize", 3, 0.6, "equalize", 7),
    (0.8, "posterize", 5, 1.0, "equalize", 2),
    (0.2, "rotate", 3, 0.6, "solarize", 8),
    (0.6, "equalize", 8, 0.4, "posterize", 6),
    (0.8, "rotate", 8, 0.4, "color", 0),
    (0.4, "rotate", 9, 0.6, "equalize", 2),
    (0.0, "equalize", 7, 0.8, "equalize", 8),
    (0.6, "invert", 4, 1.0, "equalize", 8),
    (0.6, "color", 4, 1.0, "contrast", 8),
    (0.8, "rotate", 8, 1.0, "color", 2),
    (0.8, "color", 8, 0.8, "solarize", 7),
    (0.4, "sharpness", 7, 0.6, "invert", 8),
    (0.6, "shearX", 5, 1.0, "equalize", 9),
    (0.4, "color", 0, 0.6, "equalize", 3),
    (0.4, "equalize", 7, 0.2, "solarize", 4),
    (0.6, "solarize", 5, 0.6, "autocontrast", 5),
    (0.6, "invert", 4, 1.0, "equalize", 8),
    (0.6, "color", 4, 1.0, "contrast", 8),
    (0.8, "equalize", 8, 0.6, "equalize", 3),
)
STL10_POLICY = IMAGENET_POLICY  # identical in the reference (:170-219)

CIFAR10_POLICY = _P(
    (0.1, "invert", 7, 0.2, "contrast", 6),
    (0.7, "rotate", 2, 0.3, "translateX", 9),
    (0.8, "sharpness", 1, 0.9, "sharpness", 3),
    (0.5, "shearY", 8, 0.7, "translateY", 9),
    (0.5, "autocontrast", 8, 0.9, "equalize", 2),
    (0.2, "shearY", 7, 0.3, "posterize", 7),
    (0.4, "color", 3, 0.6, "brightness", 7),
    (0.3, "sharpness", 9, 0.7, "brightness", 9),
    (0.6, "equalize", 5, 0.5, "equalize", 1),
    (0.6, "contrast", 7, 0.6, "sharpness", 5),
    (0.7, "color", 7, 0.5, "translateX", 8),
    (0.3, "equalize", 7, 0.4, "autocontrast", 8),
    (0.4, "translateY", 3, 0.2, "sharpness", 6),
    (0.9, "brightness", 6, 0.2, "color", 8),
    (0.5, "solarize", 2, 0.0, "invert", 3),
    (0.2, "equalize", 0, 0.6, "autocontrast", 0),
    (0.2, "equalize", 8, 0.6, "equalize", 4),
    (0.9, "color", 9, 0.6, "equalize", 6),
    (0.8, "autocontrast", 4, 0.2, "solarize", 8),
    (0.1, "brightness", 3, 0.7, "color", 0),
    (0.4, "solarize", 5, 0.9, "autocontrast", 3),
    (0.9, "translateY", 9, 0.7, "translateY", 9),
    (0.9, "autocontrast", 2, 0.8, "solarize", 3),
    (0.8, "equalize", 8, 0.1, "invert", 3),
    (0.7, "translateY", 9, 0.9, "autocontrast", 1),
)

SVHN_POLICY = _P(
    (0.9, "shearX", 4, 0.2, "invert", 3),
    (0.9, "shearY", 8, 0.7, "invert", 5),
    (0.6, "equalize", 5, 0.6, "solarize", 6),
    (0.9, "invert", 3, 0.6, "equalize", 3),
    (0.6, "equalize", 1, 0.9, "rotate", 3),
    (0.9, "shearX", 4, 0.8, "autocontrast", 3),
    (0.9, "shearY", 8, 0.4, "invert", 5),
    (0.9, "shearY", 5, 0.2, "solarize", 6),
    (0.9, "invert", 6, 0.8, "autocontrast", 1),
    (0.6, "equalize", 3, 0.9, "rotate", 3),
    (0.9, "shearX", 4, 0.3, "solarize", 3),
    (0.8, "shearY", 8, 0.7, "invert", 4),
    (0.9, "equalize", 5, 0.6, "translateY", 6),
    (0.9, "invert", 4, 0.6, "equalize", 7),
    (0.3, "contrast", 3, 0.8, "rotate", 4),
    (0.8, "invert", 5, 0.0, "translateY", 2),
    (0.7, "shearY", 6, 0.4, "solarize", 8),
    (0.6, "invert", 4, 0.8, "rotate", 4),
    (0.3, "shearY", 7, 0.9, "translateX", 3),
    (0.1, "shearX", 6, 0.6, "invert", 5),
    (0.7, "solarize", 2, 0.6, "translateY", 7),
    (0.8, "shearY", 4, 0.8, "invert", 8),
    (0.7, "shearX", 9, 0.8, "translateY", 3),
    (0.8, "shearY", 5, 0.7, "autocontrast", 3),
    (0.7, "shearX", 2, 0.1, "invert", 5),
)

POLICIES = {"imagenet": IMAGENET_POLICY, "stl10": STL10_POLICY,
            "cifar10": CIFAR10_POLICY, "svhn": SVHN_POLICY}


# --------------------------------------------------------------------------
# single-image ops: img (H, W, C) float32 in [0, 255]
# --------------------------------------------------------------------------

def _cubic_weights(t):
    """PIL ``Image.transform`` bicubic weights for offsets (-1, 0, 1, 2)
    around the floor of the sample position.  NB: PIL's *transform* filter
    (Geometry.c) is cubic convolution with a = -1.0 — NOT the a = -0.5
    Catmull-Rom its *resize* uses — verified against a delta-image probe
    (weights 0.625/-0.125 at d=0.5)."""
    a = -1.0
    ts = [t + 1.0, t, 1.0 - t, 2.0 - t]
    ws = []
    for x in ts:
        ax = jnp.abs(x)
        w = jnp.where(
            ax <= 1.0, ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
            jnp.where(ax < 2.0, (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a, 0.0))
        ws.append(w)
    return ws


def _affine(img, a, b, c, d, e, f, bicubic=False):
    """PIL Image.transform(AFFINE) semantics: output pixel (x, y) samples the
    input at (a·(x+.5) + b·(y+.5) + c, d·(x+.5) + e·(y+.5) + f) — PIL maps
    pixel *centers*, then floors for nearest — fill 128 out of bounds.
    ``bicubic=True`` matches PIL's Image.BICUBIC resampling (the reference
    shears with BICUBIC; translate/rotate are nearest)."""
    H, W = img.shape[:2]
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) + 0.5
    xin = a * xs + b * ys + c
    yin = d * xs + e * ys + f
    if not bicubic:
        xi = jnp.floor(xin).astype(jnp.int32)
        yi = jnp.floor(yin).astype(jnp.int32)
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        out = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(inb[..., None], out, FILL)
    # bicubic: continuous sample position is (xin-.5, yin-.5) in pixel-index
    # space; 4×4 taps around it, edge-clamped (PIL clamps tap indices)
    px, py = xin - 0.5, yin - 0.5
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    fx, fy = px - x0, py - y0
    wx = _cubic_weights(fx)
    wy = _cubic_weights(fy)
    acc = jnp.zeros_like(img)
    for j, wyj in zip((-1, 0, 1, 2), wy):
        rowy = jnp.clip(y0 + j, 0, H - 1)
        for i, wxi in zip((-1, 0, 1, 2), wx):
            colx = jnp.clip(x0 + i, 0, W - 1)
            acc = acc + (wyj * wxi)[..., None] * img[rowy, colx]
    inb = (px >= -0.5) & (px <= W - 0.5) & (py >= -0.5) & (py <= H - 0.5)
    return jnp.where(inb[..., None], jnp.clip(acc, 0.0, 255.0), FILL)


def _shear_x(img, mag, sign):
    return _affine(img, 1.0, mag * sign, 0.0, 0.0, 1.0, 0.0, bicubic=True)


def _shear_y(img, mag, sign):
    return _affine(img, 1.0, 0.0, 0.0, mag * sign, 1.0, 0.0, bicubic=True)


def _translate_x(img, mag, sign):
    return _affine(img, 1.0, 0.0, mag * img.shape[1] * sign, 0.0, 1.0, 0.0)


def _translate_y(img, mag, sign):
    return _affine(img, 1.0, 0.0, 0.0, 0.0, 1.0, mag * img.shape[0] * sign)


def _rotate(img, mag, sign):
    # PIL rotate(angle): counterclockwise about the center (W/2, H/2) —
    # PIL's rotn_center, NOT the (W-1)/2 pixel-grid center — fill 128
    # (the reference never applies a sign to rotation)
    H, W = img.shape[:2]
    theta = mag * jnp.pi / 180.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = W / 2.0, H / 2.0
    # inverse map for CCW rotation
    return _affine(img, cos, -sin, cx - cos * cx + sin * cy,
                   sin, cos, cy - sin * cx - cos * cy)


def _gray(img):
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    if img.shape[-1] == 3:
        return jnp.sum(img * w, axis=-1, keepdims=True)
    return jnp.mean(img, axis=-1, keepdims=True)


def _blend(a, b, factor):
    return jnp.clip(a + factor * (b - a), 0.0, 255.0)


def _color(img, mag, sign):
    return _blend(jnp.broadcast_to(_gray(img), img.shape), img,
                  1.0 + mag * sign)


def _contrast(img, mag, sign):
    # PIL: blend with the mean of the L image (rounded like PIL's int mean)
    mean = jnp.round(jnp.mean(_gray(img)))
    return _blend(jnp.full_like(img, mean), img, 1.0 + mag * sign)


def _brightness(img, mag, sign):
    return _blend(jnp.zeros_like(img), img, 1.0 + mag * sign)


def _sharpness(img, mag, sign):
    # PIL ImageFilter.SMOOTH kernel; border pixels keep original values
    kernel = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]],
                         jnp.float32) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None],          # (C, 1, H, W)
        kernel[None, None], (1, 1), "SAME")[:, 0].transpose(1, 2, 0)
    smoothed = smoothed.at[0, :].set(img[0, :]).at[-1, :].set(img[-1, :])
    smoothed = smoothed.at[:, 0].set(img[:, 0]).at[:, -1].set(img[:, -1])
    return _blend(smoothed, img, 1.0 + mag * sign)


def _posterize(img, mag, sign):
    bits = mag.astype(jnp.int32)
    mask = (0xFF << (8 - bits)) & 0xFF
    return (img.astype(jnp.int32) & mask).astype(img.dtype)


def _solarize(img, mag, sign):
    return jnp.where(img < mag, img, 255.0 - img)


def _autocontrast(img, mag, sign):
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    return jnp.where(hi > lo, jnp.clip((img - lo) * scale, 0, 255), img)


def _equalize(img, mag, sign):
    # PIL ImageOps.equalize LUT per channel
    def eq_channel(ch):
        v = jnp.clip(ch, 0, 255).astype(jnp.int32)
        hist = jnp.zeros(256, jnp.int32).at[v.reshape(-1)].add(1)
        nz = hist > 0
        last_val = hist[jnp.argmax(
            jnp.where(nz, jnp.arange(256), -1))]
        step = (jnp.sum(hist) - last_val) // 255
        cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(hist)[:-1]])
        lut = jnp.clip((step // 2 + cum) // jnp.maximum(step, 1), 0, 255)
        out = jnp.where(step > 0, lut[v].astype(ch.dtype), ch)
        return out

    return jnp.stack([eq_channel(img[..., c])
                      for c in range(img.shape[-1])], axis=-1)


def _invert(img, mag, sign):
    return 255.0 - img

_OP_FNS = [_shear_x, _shear_y, _translate_x, _translate_y, _rotate, _color,
           _posterize, _solarize, _contrast, _sharpness, _brightness,
           _autocontrast, _equalize, _invert]


def _apply_op(img, op_id, mag, sign, enabled):
    out = jax.lax.switch(op_id, _OP_FNS, img, mag, sign)
    return jnp.where(enabled, out, img)


def make_autoaugment(policy: str = "imagenet") -> Callable:
    """Batched device AutoAugment: ``fn(rng, images_uint8) -> uint8``."""
    table = POLICIES[policy]
    op1 = jnp.asarray([_OP_ID[r[1]] for r in table], jnp.int32)
    op2 = jnp.asarray([_OP_ID[r[4]] for r in table], jnp.int32)
    p1 = jnp.asarray([r[0] for r in table], jnp.float32)
    p2 = jnp.asarray([r[3] for r in table], jnp.float32)
    m1 = jnp.asarray([float(_RANGES[r[1]][r[2]]) for r in table], jnp.float32)
    m2 = jnp.asarray([float(_RANGES[r[4]][r[5]]) for r in table], jnp.float32)
    signed1 = jnp.asarray([r[1] in _SIGNED for r in table], jnp.float32)
    signed2 = jnp.asarray([r[4] in _SIGNED for r in table], jnp.float32)
    n = len(table)

    def augment_one(rng, img):
        k, ku1, ku2, ks1, ks2 = jax.random.split(rng, 5)
        idx = jax.random.randint(k, (), 0, n)
        img = img.astype(jnp.float32)
        s1 = jnp.where(signed1[idx] > 0,
                       jax.random.choice(ks1, jnp.asarray([-1.0, 1.0])), 1.0)
        s2 = jnp.where(signed2[idx] > 0,
                       jax.random.choice(ks2, jnp.asarray([-1.0, 1.0])), 1.0)
        img = _apply_op(img, op1[idx], m1[idx], s1,
                        jax.random.uniform(ku1) < p1[idx])
        # PIL returns uint8 after every op: re-quantize between op1 and op2
        # so threshold ops (solarize/posterize) see the same ties PIL does
        img = jnp.clip(jnp.round(img), 0, 255)
        img = _apply_op(img, op2[idx], m2[idx], s2,
                        jax.random.uniform(ku2) < p2[idx])
        return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)

    def augment(rng, images):
        rngs = jax.random.split(rng, images.shape[0])
        return jax.vmap(augment_one)(rngs, images)

    return augment
