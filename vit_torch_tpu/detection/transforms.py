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


def random_hflip(rng: jax.Array, images: jnp.ndarray, boxes: jnp.ndarray,
                 image_size: int, masks: Optional[jnp.ndarray] = None,
                 prob: float = 0.5,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-sample random horizontal flip of a letterboxed detection batch.

    images: (B, S, S, C) — flipped along W;
    boxes:  (B, N, 4) xyxy in canvas coords — x coords mirrored about S
            (the centered letterbox is symmetric, so content stays aligned);
    masks:  optional (B, N, S, S) instance masks, flipped along W.
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
    return images, boxes, masks
