"""Model zoo facade.

Capability parity with the reference's ``VisionModelZoo``
(``models/vision_all.py:31-152``): arch-string → family dispatch, optional
pretrained weight loading, N-channel input support, and the MLP classifier
head appended as ``[*fc, num_labels]``.

Functional redesign: ``get_model`` returns a :class:`ZooModel` bundling a
flax ``Classifier`` module (backbone + optional head in one param tree) with
metadata.  Linear-eval does not need a separate frozen module — the trainer
simply differentiates w.r.t. the ``head`` subtree only, so XLA never builds
the backbone backward pass (the functional equivalent of the reference's
``frozen_model_bottom`` + ``no_grad`` sandwich, ``utils_network.py:202-211``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.models.layers import ClassifierHead, Dtype
from vit_torch_tpu.models.vit import VIT_CONFIGS, VisionTransformer


class Classifier(nn.Module):
    """Backbone + optional MLP head in one param tree.

    Param tree: ``{'backbone': ..., 'head': ...}`` — the split the trainer
    uses to freeze the backbone under ``--lineareval``.
    """

    backbone: nn.Module
    head: Optional[nn.Module] = None

    def __call__(self, x, deterministic: bool = True):
        feats = self.backbone(x, deterministic)
        if self.head is not None:
            feats = self.head(feats)
        return feats


@dataclasses.dataclass
class ZooModel:
    arch: str
    family: str
    model: Classifier
    feature_dim: int
    patch_size: Optional[int] = None
    default_image_size: int = 224

    def init(self, rng: jax.Array, image_size: int, image_channels: int = 3,
             batch_size: int = 1) -> Dict[str, Any]:
        dummy = jnp.zeros((batch_size, image_size, image_size, image_channels),
                          jnp.float32)
        return self.model.init({"params": rng}, dummy, True)

    def apply(self, variables, x, deterministic: bool = True,
              rngs: Optional[Dict[str, jax.Array]] = None):
        return self.model.apply(variables, x, deterministic, rngs=rngs)


# --- family registry ------------------------------------------------------

_FAMILY_BUILDERS: Dict[str, Callable[..., ZooModel]] = {}


def register_family(name: str):
    def deco(fn):
        _FAMILY_BUILDERS[name] = fn
        return fn
    return deco


# arch-string prefix → family, mirroring the reference's ``archs_types``
# table (models/vision_all.py:31-75).  xcit is wired here even though the
# reference facade leaves it dangling (SURVEY.md §2a).
_ARCH_FAMILIES: List = [
    ("dino_", "dino"),
    ("vit_", "dino"),
    ("cait", "cait"),
    ("xcit", "xcit"),
    ("swin", "swin"),
    ("deit", "deit"),
    ("resnext", "resnet"),
    ("wide_resnet", "resnet"),
    ("resnet", "resnet"),
]


def arch_family(arch: str) -> str:
    for prefix, family in _ARCH_FAMILIES:
        if arch.startswith(prefix):
            return family
    raise ValueError(f"unknown arch {arch!r}; known families: "
                     f"{sorted(set(f for _, f in _ARCH_FAMILIES))}")


class VisionModelZoo:
    """Facade: ``get_model(arch, ...)`` → :class:`ZooModel`."""

    @classmethod
    def available_archs(cls) -> List[str]:
        from vit_torch_tpu.models.vit import VIT_CONFIGS
        archs = list(VIT_CONFIGS)
        for mod_name, attr in [("swin", "SWIN_CONFIGS"), ("cait", "CAIT_CONFIGS"),
                               ("xcit", "XCIT_CONFIGS"), ("deit", "DEIT_CONFIGS"),
                               ("resnet", "RESNET_CONFIGS")]:
            try:
                import importlib
                m = importlib.import_module(f"vit_torch_tpu.models.{mod_name}")
                archs += list(getattr(m, attr))
            except (ImportError, AttributeError):
                pass
        return sorted(set(archs))

    @classmethod
    def get_model(
        cls,
        arch: str,
        pretrained: bool = False,
        image_channels: int = 3,
        classifier: Optional[Sequence[int]] = None,
        image_size: int = 224,
        dtype: Dtype = jnp.bfloat16,
        remat: bool = False,
        torch_ckpt: Optional[str] = None,
    ) -> ZooModel:
        """Build a zoo model.

        ``classifier=None`` → headless backbone (features out), matching the
        reference's linear-eval backbone construction (``main.py:184-201``).
        ``classifier=[*fc, num_labels]`` appends the MLP head (GELU between
        Linears, last layer bias-free — ``models/vision_all.py:300-320``).

        ``pretrained=True`` requires ``torch_ckpt`` (a local torch state_dict
        file) since TPU pods have no egress; the importer remaps the torch
        key layout per family (see ``checkpoint/torch_import.py``).
        """
        family = arch_family(arch)
        builder = _FAMILY_BUILDERS.get(family)
        if builder is None:
            raise NotImplementedError(
                f"model family {family!r} (arch {arch!r}) is not built yet")
        zoo_model = builder(arch, image_channels=image_channels,
                            classifier=classifier, image_size=image_size,
                            dtype=dtype, remat=remat)
        zoo_model._pretrained_requested = pretrained
        zoo_model._torch_ckpt = torch_ckpt
        return zoo_model

    @classmethod
    def get_output_shape(cls, zoo_model: ZooModel, image_size: int,
                         image_channels: int = 3) -> tuple:
        """Shape probe via ``jax.eval_shape`` — no FLOPs spent (the
        reference's dummy-forward probe, ``models/vision_all.py:371-376``)."""
        rng = jax.random.PRNGKey(0)
        dummy = jax.ShapeDtypeStruct((1, image_size, image_size, image_channels),
                                     jnp.float32)
        variables = jax.eval_shape(
            lambda: zoo_model.model.init({"params": rng},
                                         jnp.zeros(dummy.shape, dummy.dtype), True))
        out = jax.eval_shape(
            lambda v: zoo_model.model.apply(v, jnp.zeros(dummy.shape, dummy.dtype), True),
            variables)
        return out.shape


@register_family("dino")
def _build_vit(arch: str, image_channels: int, classifier, image_size: int,
               dtype, remat: bool) -> ZooModel:
    if arch not in VIT_CONFIGS:
        raise ValueError(f"unknown ViT arch {arch!r}; have {sorted(VIT_CONFIGS)}")
    cfg = VIT_CONFIGS[arch]
    backbone = VisionTransformer(cfg, dtype=dtype, remat=remat, name="backbone")
    head = (ClassifierHead(tuple(classifier), dtype=dtype, name="head")
            if classifier else None)
    return ZooModel(arch=arch, family="dino",
                    model=Classifier(backbone, head),
                    feature_dim=cfg.embed_dim, patch_size=cfg.patch_size)


# importing these modules registers their families as they land
def _import_optional_families() -> None:
    import importlib
    for mod in ("swin", "cait", "xcit", "deit", "resnet"):
        try:
            importlib.import_module(f"vit_torch_tpu.models.{mod}")
        except ImportError:
            pass


_import_optional_families()
