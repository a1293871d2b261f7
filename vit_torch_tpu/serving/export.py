"""AOT serving export: compile-once, deploy-anywhere classifier bundles.

The reference's deployment story is ``torch.save``/``torch.load`` of a
pickled model plus a live torch install at serving time
(reference ``utils_network.py`` checkpoint save/load).  The TPU-native
equivalent is ahead-of-time export through ``jax.export``: the eval
forward — preprocessing included — is traced, lowered to StableHLO with
the parameters baked in as constants, and serialized to a self-contained
artifact that any JAX runtime (same or newer jaxlib, CPU or TPU) can
deserialize and run without the model-zoo code, the checkpoint files, or
the Python model definition.

Serving contract per artifact:

    uint8 images (bs, H, W, 3)  →  fp32 logits (bs, num_classes)

with the dataset normalization ``(x/255 - mean)/std`` executed in-graph,
so the client ships raw decoded pixels.  Static shapes (design invariant)
mean one artifact per batch size; ``ServingModel.predict`` does standard
serving-side bucketing — pad the request batch up to the smallest
exported bucket, slice the padding back off.

Kernel-dispatch env knobs (``VITX_W8A8=1``, ``VITX_ATTN_BHND``, ...) are
read at trace time, so an export performed under ``VITX_W8A8=1`` bakes
the int8 MXU serving path into the artifact.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_torch_tpu.ops.quant import w8a8_enabled

_MANIFEST = "manifest.json"


def _data_sharding(num_devices: int):
    """Batch-axis NamedSharding over the first ``num_devices`` devices."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec
    devs = jax.devices()
    if len(devs) < num_devices:
        raise ValueError(
            f"bundle needs {num_devices} devices, have {len(devs)}")
    mesh = Mesh(np.array(devs[:num_devices]), ("data",))
    return NamedSharding(mesh, PartitionSpec("data"))


@dataclasses.dataclass
class ServingModel:
    """A loaded serving bundle: per-batch-size compiled forwards."""

    manifest: Dict
    _fns: Dict[int, "jax.export.Exported"]
    _sharding: object = None      # lazily-built mesh sharding (hot path)

    @property
    def batch_sizes(self) -> Tuple[int, ...]:
        return tuple(sorted(self._fns))

    def _put(self, tree):
        """Commit inputs to the bundle's device mesh.  Multi-device
        bundles (``num_devices > 1``) were exported with batch-axis
        shardings; jax.export requires call-time arrays committed to the
        same device count."""
        n = int(self.manifest.get("num_devices", 1))
        if n <= 1:
            return tree
        if self._sharding is None:   # build the Mesh once, not per call
            self._sharding = _data_sharding(n)
        sh = self._sharding
        return jax.tree.map(lambda a: jax.device_put(a, sh), tree)

    def predict(self, images: np.ndarray) -> np.ndarray:
        """Run raw uint8 NHWC images through the exported forward.

        Batches that don't match an exported bucket are zero-padded up to
        the smallest bucket that fits (the serving-side half of the
        static-shapes contract); oversize batches are chunked through the
        largest bucket.
        """
        if images.ndim != 4 or images.shape[-1] != 3:
            raise ValueError(f"expected (bs, H, W, 3) uint8, got {images.shape}")
        if np.asarray(images).dtype != np.uint8:
            raise ValueError(
                f"expected uint8 pixels in [0, 255], got {images.dtype} — "
                f"the bundle normalizes in-graph; do not pre-scale")
        self._check_image_size(images.shape[1:3])
        n = images.shape[0]
        buckets = self.batch_sizes
        largest = buckets[-1]
        if n > largest:
            parts = [self.predict(images[i:i + largest])
                     for i in range(0, n, largest)]
            return np.concatenate(parts, axis=0)
        bs = next(b for b in buckets if b >= n)
        if n < bs:
            pad = np.zeros((bs - n,) + images.shape[1:], images.dtype)
            images = np.concatenate([images, pad], axis=0)
        logits = self._fns[bs].call(self._put(jnp.asarray(images)))
        return np.asarray(logits)[:n]

    def _check_image_size(self, hw) -> None:
        S = self.manifest.get("image_size")
        if S and tuple(hw) != (S, S):
            raise ValueError(
                f"this bundle was exported for {S}x{S} inputs, got "
                f"{hw[0]}x{hw[1]} — preprocess with "
                f"serving.letterbox_images (detection) or "
                f"serving.resize_images (classification) first")

    def predict_tree(self, batch):
        """Run a pytree-in/pytree-out artifact (detection bundles): every
        leaf is padded along axis 0 up to the chosen bucket, and every
        output leaf is sliced back to the request size."""
        leaves = jax.tree.leaves(batch)
        if not leaves:
            raise ValueError("empty batch")
        if isinstance(batch, dict) and "image" in batch:
            img = np.asarray(batch["image"])
            if img.dtype != np.uint8:
                raise ValueError(
                    f"expected uint8 'image', got {img.dtype} — use "
                    f"serving.letterbox_images to build the batch")
            self._check_image_size(img.shape[1:3])
        n = leaves[0].shape[0]
        buckets = self.batch_sizes
        largest = buckets[-1]
        if n > largest:
            parts = [self.predict_tree(
                jax.tree.map(lambda a: a[i:i + largest], batch))
                for i in range(0, n, largest)]
            return jax.tree.map(
                lambda *xs: np.concatenate(xs, axis=0), *parts)
        bs = next(b for b in buckets if b >= n)

        def pad(a):
            a = np.asarray(a)
            if a.shape[0] == bs:
                return a
            fill = np.zeros((bs - n,) + a.shape[1:], a.dtype)
            return np.concatenate([a, fill], axis=0)

        out = self._fns[bs].call(self._put(jax.tree.map(pad, batch)))
        return jax.tree.map(lambda a: np.asarray(a)[:n], out)


def letterbox_images(images: Sequence[np.ndarray], image_size: int) -> Dict:
    """Host-side half of the detection serving contract: uint8 HWC images
    of ANY size → the artifact's fixed-shape batch pytree.

    Mirrors the training loader exactly (``detection/coco_data.py``:
    aspect-preserving bilinear resize, centered 114-gray padding —
    asserted by a parity test against ``letterbox_params``) so serving
    preprocessing matches what the model saw in training; the artifact's
    in-graph postprocess uses scale/pad to map boxes back to each
    original frame.
    """
    from PIL import Image

    from vit_torch_tpu.detection.coco_data import letterbox_params

    S = int(image_size)
    batch = {"image": np.full((len(images), S, S, 3), 114, np.uint8),
             "scale": np.zeros((len(images),), np.float32),
             "pad": np.zeros((len(images), 2), np.float32)}
    for i, img in enumerate(images):
        img = np.asarray(img)
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        h, w = img.shape[:2]
        scale, pad_x, pad_y, nh, nw = letterbox_params(h, w, S)
        resized = np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
            (nw, nh), Image.BILINEAR), np.uint8)
        batch["image"][i, pad_y:pad_y + nh, pad_x:pad_x + nw] = resized
        batch["scale"][i] = scale
        batch["pad"][i] = (pad_x, pad_y)
    return batch


def export_classifier(zoo_model, variables, *, image_size: int,
                      batch_sizes: Sequence[int] = (1, 8, 32),
                      norm: Optional[Dict[str, Sequence[float]]] = None,
                      platforms: Optional[Sequence[str]] = None,
                      param_dtype: Optional[str] = None,
                      prequant: bool = True,
                      num_devices: int = 1) -> Dict:
    """Export a zoo classifier's eval forward for each batch size.

    ``norm`` is ``{"mean": (3,), "std": (3,)}`` in 0-1 units (a
    ``data.datasets.NORM_VALUES`` entry); default is identity
    (mean 0 / std 1), i.e. only the /255 scaling.  ``platforms`` follows
    ``jax.export.export`` (e.g. ``["cpu", "tpu"]`` for a multi-platform
    artifact); default is the trace-time backend.

    ``param_dtype="bfloat16"`` casts the baked parameters before export,
    halving every artifact (each batch-size bucket embeds a full param
    copy — ~344 MB fp32 for ViT-B).  Matmul weights are cast to the
    activation dtype in-graph anyway; the (small) eval difference comes
    from LayerNorm/bias params that normally stay fp32.

    Under ``VITX_W8A8=1`` with ``prequant=True`` (default), matmul weights
    are quantized HOST-SIDE before tracing (one eager capture forward,
    ``ops.quant.prequant_capture``) so the artifact bakes int8 constants +
    per-channel scales instead of float kernels + in-graph quantize ops:
    ~4x smaller than fp32 (2x vs bf16) on the matmul weights, and the
    serve graph skips the per-call weight-quantize sweep.

    ``num_devices > 1`` exports a data-parallel bundle: the batch axis
    shards over a 1-D mesh of that many devices (params replicate as
    baked constants) and serving requires that many devices at load time
    (``ServingModel._put`` commits inputs to the mesh).

    Returns ``{"manifest": dict, "exports": {bs: Exported}}``.
    """
    norm = norm or {"mean": (0.0, 0.0, 0.0), "std": (1.0, 1.0, 1.0)}
    if param_dtype:
        cast = jnp.dtype(param_dtype)
        variables = jax.tree.map(
            lambda a: a.astype(cast)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
    dt = getattr(zoo_model.model.backbone, "dtype", jnp.bfloat16)
    mean = jnp.asarray(norm["mean"], dt)
    std = jnp.asarray(norm["std"], dt)
    # params ride inside the closure: export bakes them into the StableHLO
    # as constants, making the artifact self-contained
    apply_fn = zoo_model.model.apply

    prequantized = False
    if w8a8_enabled() and prequant:
        from vit_torch_tpu.ops import quant as _quant
        x0 = jnp.zeros((1, image_size, image_size, 3), jnp.uint8)
        xn = (x0.astype(dt) / 255.0 - mean) / std
        # eager (un-jitted) forward: the int8 collection must hold CONCRETE
        # values so the export trace below bakes them as constants
        with _quant.prequant_capture():
            _, aux = apply_fn(variables, xn, True, mutable=["int8"])
        int8 = dict(aux).get("int8")   # empty when the arch has no w8a8
        if int8:                       # sites (e.g. conv-only backbones)
            variables = {**variables, "int8": int8}
            prequantized = True

    def forward(images):
        x = (images.astype(dt) / 255.0 - mean) / std
        return apply_fn(variables, x, True).astype(jnp.float32)

    # num_devices > 1: data-parallel serving — the batch axis shards over
    # a 1-D device mesh (params replicate as baked constants), so one
    # bundle drives a whole pod slice; jax.export records the shardings
    # and ServingModel._put commits call-time inputs to a matching mesh
    sharding = _data_sharding(num_devices) if num_devices > 1 else None
    jit_kw = {} if sharding is None else {
        "in_shardings": sharding, "out_shardings": sharding}
    exports = {}
    for bs in sorted(set(int(b) for b in batch_sizes)):
        if sharding is not None and bs % num_devices:
            raise ValueError(f"batch size {bs} not divisible by "
                             f"num_devices={num_devices}")
        spec = jax.ShapeDtypeStruct((bs, image_size, image_size, 3), jnp.uint8)
        # push the mesh as the active data-extent context so per-chip-batch
        # dispatch heuristics (layers._attn_fused_block's B/extent >= 64
        # crossover) see the PER-CHIP batch, not the global batch — without
        # this a data-parallel export trace would evaluate the crossover
        # against bs instead of bs/num_devices
        from vit_torch_tpu.ops.attention import sequence_parallel
        with sequence_parallel(sharding.mesh if sharding is not None
                               else None):
            exports[bs] = jax.export.export(
                jax.jit(forward, **jit_kw),
                platforms=None if platforms is None else list(platforms))(spec)
    num_classes = int(exports[min(exports)].out_avals[0].shape[-1])
    manifest = {
        "format": "vit_torch_tpu.serving/1",
        "arch": zoo_model.arch,
        "family": zoo_model.family,
        "image_size": int(image_size),
        "batch_sizes": sorted(exports),
        "num_classes": num_classes,
        "norm": {"mean": list(map(float, norm["mean"])),
                 "std": list(map(float, norm["std"]))},
        "platforms": list(exports[min(exports)].platforms),
        "activation_dtype": jnp.dtype(dt).name,
        "param_dtype": str(param_dtype) if param_dtype else "float32",
        "num_devices": int(num_devices),
        "w8a8": w8a8_enabled(),
        "w8a8_prequant": prequantized,
        "jax_version": jax.__version__,
    }
    return {"manifest": manifest, "exports": exports}


def export_detector(trainer, *, image_size: int,
                    batch_sizes: Sequence[int] = (1, 8),
                    platforms: Optional[Sequence[str]] = None,
                    prequant: bool = True,
                    num_devices: int = 1) -> Dict:
    """Export a detection trainer's predict program (normalize → model →
    in-graph postprocess) as serving artifacts.

    Works for both engines: ``DetectionTrainer`` (DETR — emits
    scores/labels/boxes, plus bit-packed masks when ``--masks``) and
    ``FasterRCNNTrainer`` (emits the padded top-K detection set).  The
    artifact's calling convention is the eval loader's batch pytree:

        {"image": uint8 (bs, S, S, 3), "scale": f32 (bs,),
         "pad": f32 (bs, 2)}  →  {str: array}

    Params (and BatchNorm state for R-CNN backbones) are baked in.  Under
    ``VITX_W8A8=1`` with ``prequant=True`` the QDense weights (DETR
    transformer / R-CNN box head) are quantized host-side and baked as
    int8 constants, like ``export_classifier``.
    """
    params = trainer.params
    predict_vars = getattr(trainer, "_predict_vars", None)
    if predict_vars is None:
        raise ValueError("trainer has no predict program")
    variables = {"params": params,
                 **(getattr(trainer, "model_state", None) or {})}

    prequantized = False
    if w8a8_enabled() and prequant:
        from vit_torch_tpu.ops import quant as _quant
        # eager capture forward (normalization constants don't affect
        # WHICH kernels the w8a8 sites consume, so raw zeros suffice)
        x0 = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
        with _quant.prequant_capture():
            _, aux = trainer.model.apply(variables, x0,
                                         deterministic=True,
                                         mutable=["int8"])
        int8 = dict(aux).get("int8")
        if int8:
            variables = {**variables, "int8": int8}
            prequantized = True

    def forward(batch):
        return predict_vars(variables, batch)

    # data-parallel serving: shard every batch-pytree leaf (and every
    # prediction leaf) on axis 0 — a single-sharding pytree prefix
    sharding = _data_sharding(num_devices) if num_devices > 1 else None
    jit_kw = {} if sharding is None else {
        "in_shardings": sharding, "out_shardings": sharding}
    exports = {}
    for bs in sorted(set(int(b) for b in batch_sizes)):
        if sharding is not None and bs % num_devices:
            raise ValueError(f"batch size {bs} not divisible by "
                             f"num_devices={num_devices}")
        spec = {
            "image": jax.ShapeDtypeStruct(
                (bs, image_size, image_size, 3), jnp.uint8),
            "scale": jax.ShapeDtypeStruct((bs,), jnp.float32),
            "pad": jax.ShapeDtypeStruct((bs, 2), jnp.float32),
        }
        exports[bs] = jax.export.export(
            jax.jit(forward, **jit_kw),
            platforms=None if platforms is None else list(platforms))(spec)
    sample = exports[min(exports)]
    manifest = {
        "format": "vit_torch_tpu.serving.detection/1",
        "image_size": int(image_size),
        "batch_sizes": sorted(exports),
        "outputs": [str(a) for a in sample.out_avals],
        "platforms": list(sample.platforms),
        "num_devices": int(num_devices),
        "w8a8": w8a8_enabled(),
        "w8a8_prequant": prequantized,
        "jax_version": jax.__version__,
    }
    return {"manifest": manifest, "exports": exports}


def save_bundle(bundle_dir: str, exported: Dict) -> None:
    """Write ``export_classifier``'s result as a directory bundle:
    ``manifest.json`` + one ``fwd_bs{N}.stablehlo`` blob per batch size."""
    os.makedirs(bundle_dir, exist_ok=True)
    for bs, exp in exported["exports"].items():
        with open(os.path.join(bundle_dir, f"fwd_bs{bs}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
    with open(os.path.join(bundle_dir, _MANIFEST), "w") as f:
        json.dump(exported["manifest"], f, indent=1)


def load_bundle(bundle_dir: str) -> ServingModel:
    """Load a bundle directory into a ready-to-run :class:`ServingModel`.

    Needs only jax + the artifact — no model code, no checkpoint files.
    """
    with open(os.path.join(bundle_dir, _MANIFEST)) as f:
        manifest = json.load(f)
    fns = {}
    for bs in manifest["batch_sizes"]:
        path = os.path.join(bundle_dir, f"fwd_bs{bs}.stablehlo")
        with open(path, "rb") as f:
            fns[int(bs)] = jax.export.deserialize(f.read())
    if not fns:
        raise ValueError(f"no exported forwards in {bundle_dir}")
    return ServingModel(manifest=manifest, _fns=fns)
