"""Device-side (jitted) image augmentation.

The reference runs PIL/torchvision transforms per sample in DataLoader worker
processes (``utils_datasets.py:554-582``: Resize(bicubic) → RandomCrop with
pad≈size/12, fill=128 → RandomHorizontalFlip → ToTensor → Normalize).

TPU redesign: the deterministic resize happens once at dataset-load time on
the host; the random transforms (pad+crop, hflip, cutout) and normalization
run *inside the jitted train step* on device, batched over the whole batch —
uint8 travels over PCIe, everything else is fused XLA.  Per-sample randomness
comes from the step rng, so runs are exactly reproducible from the seed.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def normalize(images: jax.Array, mean: Sequence[float], std: Sequence[float],
              dtype=jnp.float32) -> jax.Array:
    """uint8 [0,255] → normalized float, channels-last."""
    mean = jnp.asarray(mean, jnp.float32) * 255.0
    # fold /255 into the std divide: (x - 255m) / (255s)
    inv_std = 1.0 / (jnp.asarray(std, jnp.float32) * 255.0)
    x = images.astype(jnp.float32)
    return ((x - mean) * inv_std).astype(dtype)


def _batched_crop(images: jax.Array, offs_y: jax.Array, offs_x: jax.Array,
                  out_h: int, out_w: int) -> jax.Array:
    """Per-sample crop as two single-axis row/col gathers.

    vmap(dynamic_slice) lowers to a 2D-offset gather whose XLA TPU path
    collapses superlinearly with batch (29× from bs64 → bs128 at 224px —
    PERF.md bs128 ledger, `examples/perf/augment_bisect.py`); two chained
    ``take_along_axis`` gathers keep the minor dims contiguous and stay
    linear in B.  Element-for-element identical output."""
    rows = offs_y[:, None] + jnp.arange(out_h)[None, :]
    x = jnp.take_along_axis(images, rows[:, :, None, None], axis=1)
    cols = offs_x[:, None] + jnp.arange(out_w)[None, :]
    return jnp.take_along_axis(x, cols[:, None, :, None], axis=2)


def random_crop(rng: jax.Array, images: jax.Array, pad: int,
                fill: int = 128) -> jax.Array:
    """Batched random crop after constant-padding (reference RandomCrop
    semantics: pad all sides by ``pad`` with ``fill=128``, crop back to the
    original size at a random offset per sample)."""
    B, H, W, C = images.shape
    padded = jnp.pad(images, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                     constant_values=fill)
    ry, rx = jax.random.split(rng)
    offs_y = jax.random.randint(ry, (B,), 0, 2 * pad + 1)
    offs_x = jax.random.randint(rx, (B,), 0, 2 * pad + 1)
    return _batched_crop(padded, offs_y, offs_x, H, W)


def random_hflip(rng: jax.Array, images: jax.Array, p: float = 0.5) -> jax.Array:
    B = images.shape[0]
    flip = jax.random.bernoulli(rng, p, (B, 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def random_vflip(rng: jax.Array, images: jax.Array, p: float = 0.5) -> jax.Array:
    B = images.shape[0]
    flip = jax.random.bernoulli(rng, p, (B, 1, 1, 1))
    return jnp.where(flip, images[:, ::-1, :, :], images)


def random_crop_to(rng: jax.Array, images: jax.Array, size: int) -> jax.Array:
    """Batched random crop of a *larger* image down to ``size`` (torchvision
    ``RandomCrop(size)`` with no padding — the tire pipeline's zoomed crop)."""
    B, H, W, C = images.shape
    ry, rx = jax.random.split(rng)
    offs_y = jax.random.randint(ry, (B,), 0, H - size + 1)
    offs_x = jax.random.randint(rx, (B,), 0, W - size + 1)
    return _batched_crop(images, offs_y, offs_x, size, size)


def cutout(rng: jax.Array, images: jax.Array, size: int,
           fill_value: float = 0.0) -> jax.Array:
    """Batched Cutout (reference ``utils_datasets.py:22-59``): one square of
    side ``size`` per sample, centered uniformly, filled with ``fill_value``
    (applied post-normalization like the reference's tensor-space Cutout)."""
    B, H, W, C = images.shape
    ry, rx = jax.random.split(rng)
    cy = jax.random.randint(ry, (B, 1, 1), 0, H)
    cx = jax.random.randint(rx, (B, 1, 1), 0, W)
    ys = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    # reference bounds are half-open [c - L//2, c + L//2): exactly 2*(L//2)
    # rows/cols (the clip at the border is implicit in the iota comparison)
    half = size // 2
    mask = ((ys >= cy - half) & (ys < cy + half)
            & (xs >= cx - half) & (xs < cx + half))
    return jnp.where(mask[..., None], fill_value, images)


def make_train_augment(
    mean: Sequence[float], std: Sequence[float], *,
    crop_pad: Optional[int] = None, hflip: bool = True,
    cutout_size: int = 0, auto_policy: Optional[str] = None,
    dtype=jnp.float32,
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Compose the reference's train transform stack as one device function
    (order matches reference ``get_trans`` ``utils_datasets.py:554-582``:
    crop → flip → AutoAugment → normalize).

    ``crop_pad=None`` derives the reference default ``max(2, size // 12)``.
    ``auto_policy`` ∈ {imagenet, cifar10, stl10, svhn} enables device-side
    AutoAugment.
    """
    auto_fn = None
    if auto_policy:
        from vit_torch_tpu.data.autoaugment import make_autoaugment
        auto_fn = make_autoaugment(auto_policy)

    def augment(rng: jax.Array, images: jax.Array) -> jax.Array:
        H = images.shape[1]
        pad = crop_pad if crop_pad is not None else max(2, H // 12)
        r_crop, r_flip, r_auto, r_cut = jax.random.split(rng, 4)
        x = random_crop(r_crop, images, pad, fill=128)
        if hflip:
            x = random_hflip(r_flip, x)
        if auto_fn is not None:
            x = auto_fn(r_auto, x)
        x = normalize(x, mean, std, dtype=dtype)
        if cutout_size > 0:
            x = cutout(r_cut, x, cutout_size)
        return x

    return augment


def make_eval_transform(mean: Sequence[float], std: Sequence[float],
                        dtype=jnp.float32) -> Callable[[jax.Array], jax.Array]:
    return functools.partial(normalize, mean=mean, std=std, dtype=dtype)
