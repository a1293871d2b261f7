"""Train-time detection augmentation — device-side, jittable.

Capability parity with the reference's per-pair transforms
(``object/transforms.py:7-31`` RandomHorizontalFlip flipping image + boxes +
masks together; DETR's train transforms ``object_detr/datasets/transforms.py:
242-260`` also use hflip as the core augmentation).

TPU-first design: the flip runs *inside* the jitted train step on the
already-letterboxed fixed-shape batch (like ``data/augment.py`` for
classification) — a per-sample bernoulli draw selects between the tensor and
its W-reversed view, so the whole thing fuses into the surrounding program
with no host work and no dynamic shapes.

Because the DETR engine runs matching (``forward_costs``) and the train step
as two separate jitted programs, both must see the *same* flip: pass the same
rng key to both — ``jax.random.bernoulli`` is deterministic in the key.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def random_zoom_crop(rng: jax.Array, images: jnp.ndarray, boxes: jnp.ndarray,
                     box_mask: jnp.ndarray, image_size: int,
                     masks: Optional[jnp.ndarray] = None,
                     scale_range: Tuple[float, float] = (0.6, 1.0),
                     prob: float = 0.5):
    """Per-sample RandomSelect between identity and a random crop+resize —
    the TPU equivalent of the reference DETR train transforms
    (``object_detr/datasets/transforms.py:242-260``: RandomSelect of resize
    vs RandomSizeCrop→resize).

    A window of side ``s·S`` (s ~ U[scale_range]) at a random offset is
    resampled to the full ``S×S`` canvas with ``jax.image.scale_and_translate``
    (continuous zoom — no dynamic shapes).  Boxes are remapped and clipped;
    boxes left degenerate by the crop have their ``box_mask`` zeroed.
    Returns (images, boxes, box_mask, masks).
    """
    B = images.shape[0]
    S = float(image_size)
    r_apply, r_scale, r_off = jax.random.split(rng, 3)
    apply = jax.random.bernoulli(r_apply, prob, (B,))
    s = jax.random.uniform(r_scale, (B,), minval=scale_range[0],
                           maxval=scale_range[1])
    w = s * S                                       # window side, pixels
    off = jax.random.uniform(r_off, (B, 2), maxval=1.0) * (S - w[:, None])
    zoom = S / w                                    # resample factor

    def resample_one(img, z, oy, ox, method):
        out_shape = (image_size, image_size) + img.shape[2:]
        return jax.image.scale_and_translate(
            img.astype(jnp.float32), out_shape, (0, 1),
            jnp.asarray([z, z]), jnp.asarray([-oy * z, -ox * z]),
            method=method)

    zoomed = jax.vmap(lambda im, z, o: resample_one(im, z, o[0], o[1],
                                                    "linear"))(
        images, zoom, off)
    images = jnp.where(apply[:, None, None, None],
                       zoomed.astype(images.dtype), images)

    # boxes: shift by the window origin, scale, clip to the canvas
    oxy = off[:, ::-1][:, None, :]                  # (B, 1, [ox, oy])
    zb = zoom[:, None, None]
    new_boxes = jnp.clip(
        (boxes - jnp.concatenate([oxy, oxy], -1)) * zb, 0.0, S)
    bw = new_boxes[..., 2] - new_boxes[..., 0]
    bh = new_boxes[..., 3] - new_boxes[..., 1]
    survives = (bw > 1.0) & (bh > 1.0)
    boxes = jnp.where(apply[:, None, None], new_boxes, boxes)
    box_mask = jnp.where(apply[:, None],
                         box_mask * survives.astype(box_mask.dtype),
                         box_mask)

    if masks is not None:
        def mask_one(m, z, o):
            # (N, S, S) instance masks: resample each plane, re-threshold
            res = jax.vmap(lambda p: resample_one(p[..., None], z, o[0],
                                                  o[1], "linear")[..., 0])(m)
            return (res > 0.5).astype(m.dtype)
        zm = jax.vmap(mask_one)(masks, zoom, off)
        masks = jnp.where(apply[:, None, None, None], zm, masks)
    return images, boxes, box_mask, masks


def random_erasing(rng: jax.Array, images: jnp.ndarray, *,
                   prob: float = 0.5,
                   scale: Tuple[float, float] = (0.02, 0.33),
                   ratio: Tuple[float, float] = (0.3, 3.3),
                   value=0.0) -> jnp.ndarray:
    """Per-sample RandomErasing on a (B, S, S, C) batch — the reference DETR
    train-time transform (``object_detr/datasets/transforms.py``
    ``RandomErasing`` = torchvision semantics: erase a rectangle of area
    ``U[scale]·S²`` and aspect ``exp(U[log ratio])`` with ``value``).

    TPU-first: fixed-shape mask arithmetic (coordinate grids vs a sampled
    rectangle — no dynamic slice), fuses into the surrounding jitted step.
    Box/mask targets are left untouched, like the reference.  ``value`` may
    be a per-channel sequence (pass the dataset mean ×255 so the erased
    patch normalizes to zero, torchvision's post-normalize semantics).
    """
    B, H, W = images.shape[:3]
    r_apply, r_area, r_ratio, r_pos = jax.random.split(rng, 4)
    apply = jax.random.bernoulli(r_apply, prob, (B,))
    area = jax.random.uniform(r_area, (B,), minval=scale[0],
                              maxval=scale[1]) * (H * W)
    log_r = jax.random.uniform(
        r_ratio, (B,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(area * aspect), 1.0, H)
    ew = jnp.clip(jnp.sqrt(area / aspect), 1.0, W)
    pos = jax.random.uniform(r_pos, (B, 2))
    y0 = pos[:, 0] * (H - eh)
    x0 = pos[:, 1] * (W - ew)
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]      # (1, H, 1)
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]      # (1, 1, W)
    inside = ((yy >= y0[:, None, None]) & (yy < (y0 + eh)[:, None, None])
              & (xx >= x0[:, None, None]) & (xx < (x0 + ew)[:, None, None]))
    erase = inside & apply[:, None, None]
    return jnp.where(erase[..., None], jnp.asarray(value, images.dtype),
                     images)


def random_hflip(rng: jax.Array, images: jnp.ndarray, boxes: jnp.ndarray,
                 image_size: int, masks: Optional[jnp.ndarray] = None,
                 prob: float = 0.5,
                 keypoints: Optional[jnp.ndarray] = None,
                 kp_flip_inds: Optional[Tuple[int, ...]] = None):
    """Per-sample random horizontal flip of a letterboxed detection batch.

    images: (B, S, S, C) — flipped along W;
    boxes:  (B, N, 4) xyxy in canvas coords — x coords mirrored about S
            (the centered letterbox is symmetric, so content stays aligned);
    masks:  optional (B, N, S, S) instance masks, flipped along W;
    keypoints: optional (B, N, K, 3) — x mirrored, K axis reordered by
            ``kp_flip_inds`` (COCO left/right swap, reference
            ``object/transforms.py:7-14``; identity when None).

    Returns (images, boxes, masks) — plus keypoints when given.
    """
    flip = jax.random.bernoulli(rng, prob, (images.shape[0],))
    images = jnp.where(flip[:, None, None, None],
                       images[:, :, ::-1, :], images)
    flipped_boxes = jnp.stack([
        image_size - boxes[..., 2], boxes[..., 1],
        image_size - boxes[..., 0], boxes[..., 3]], axis=-1)
    boxes = jnp.where(flip[:, None, None], flipped_boxes, boxes)
    if masks is not None:
        masks = jnp.where(flip[:, None, None, None],
                          masks[..., ::-1], masks)
    if keypoints is None:
        return images, boxes, masks
    kf = jnp.stack([image_size - keypoints[..., 0], keypoints[..., 1],
                    keypoints[..., 2]], axis=-1)
    if kp_flip_inds is not None:
        kf = kf[:, :, jnp.asarray(kp_flip_inds)]
    keypoints = jnp.where(flip[:, None, None, None], kf, keypoints)
    return images, boxes, masks, keypoints
