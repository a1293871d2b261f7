"""ResNeXt / Wide-ResNet backbones.

Capability parity with the reference's torchvision CNN branch
(``models/vision_all.py:331-369``: resnext50_32x4d, resnext101_32x8d,
wide_resnet50_2, wide_resnet101_2 with the fc head swapped).

Standard bottleneck ResNet-50/101 topology with grouped convs (ResNeXt) or
doubled width (WRN).  NHWC + flax BatchNorm (running stats in the
``batch_stats`` collection; under GSPMD jit the batch reduction is global,
i.e. SyncBN semantics for free).  Param names mirror torch
(conv1/bn1/layer{i}_{j}/...) for the checkpoint importer.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_torch_tpu.models.layers import (
    BatchNorm, Dtype, GroupedConv, fold_conv_bn_eval, use_folded_bn,
)


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64


RESNET_CONFIGS = {
    "resnext50_32x4d": ResNetConfig((3, 4, 6, 3), groups=32, width_per_group=4),
    "resnext101_32x8d": ResNetConfig((3, 4, 23, 3), groups=32, width_per_group=8),
    "wide_resnet50_2": ResNetConfig((3, 4, 6, 3), width_per_group=128),
    "wide_resnet101_2": ResNetConfig((3, 4, 23, 3), width_per_group=128),
    "resnet_test": ResNetConfig((1, 1), groups=1, width_per_group=64),
}

EXPANSION = 4


def resnet_flops(config: ResNetConfig, image_size: int) -> int:
    """Analytic forward FLOPs per image (multiply-adds × 2) for the
    bottleneck trunk: 7×7/2 stem + per-stage 1×1 → grouped 3×3 → 1×1
    bottlenecks with a 1×1 downsample at each stage start (the classifier
    head is negligible and excluded, matching ``vit_flops``)."""
    s = image_size // 2
    flops = 2 * s * s * 64 * 3 * 49                    # 7×7 stem
    s = s // 2                                         # 3×3/2 maxpool
    cin = 64
    for li, n_blocks in enumerate(config.layers):
        planes = 64 * 2 ** li
        width = int(planes * (config.width_per_group / 64.0)) * config.groups
        out_ch = planes * EXPANSION
        for bi in range(n_blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            s_out = s // stride
            flops += 2 * s * s * width * cin           # conv1 1×1 (input res)
            flops += 2 * s_out * s_out * width * (width // config.groups) * 9
            flops += 2 * s_out * s_out * out_ch * width  # conv3 1×1
            if bi == 0:
                flops += 2 * s_out * s_out * out_ch * cin  # downsample 1×1
            cin, s = out_ch, s_out
    return flops


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * EXPANSION
        if use_folded_bn(self, deterministic):
            # eval: every conv+BN pair folded into one conv (the BN
            # epilogue is an unfused extra pass over the activation map —
            # PERF.md stem ledger); exact modulo fp association
            fold = lambda v, cn, bn_, **kw: fold_conv_bn_eval(
                self, v, cn, bn_, dtype=self.dtype, **kw)
            y = nn.relu(fold(x, "conv1", "bn1"))
            y = nn.relu(fold(y, "conv2", "bn2",
                             strides=(self.stride, self.stride),
                             padding=((1, 1), (1, 1)), groups=self.groups))
            y = fold(y, "conv3", "bn3")
            if self.downsample:
                x = fold(x, "downsample_conv", "downsample_bn",
                         strides=(self.stride, self.stride))
            return nn.relu(x + y)
        bn = lambda name: BatchNorm(use_running_average=deterministic,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(bn("bn1")(y))
        y = GroupedConv(width, (3, 3), strides=self.stride, padding=1,
                        groups=self.groups, dtype=self.dtype,
                        name="conv2")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = bn("bn3")(y)
        if self.downsample:
            x = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="downsample_conv")(x)
            x = bn("downsample_bn")(x)
        return nn.relu(x + y)


class ResNet(nn.Module):
    """Bottleneck ResNet.

    Default: pooled (B, 2048) features.  ``features_only=True`` returns the
    per-stage feature maps [C2, C3, C4, C5] (strides 4/8/16/32) — the FPN
    input for the FasterRCNN head (the reference's
    ``fasterrcnn_resnet50_fpn`` backbone mode)."""

    config: ResNetConfig
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    features_only: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        if use_folded_bn(self, deterministic):
            x = fold_conv_bn_eval(self, x, "conv1", "bn1", strides=(2, 2),
                                  padding=((3, 3), (3, 3)), dtype=self.dtype)
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
            x = BatchNorm(use_running_average=deterministic, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        block_cls = Bottleneck
        if self.remat:
            block_cls = nn.remat(Bottleneck, static_argnums=(2,))
        stages = []
        for li, n_blocks in enumerate(cfg.layers):
            planes = 64 * 2 ** li
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                downsample = bi == 0  # channel change at every stage start
                x = block_cls(planes=planes, stride=stride, groups=cfg.groups,
                              base_width=cfg.width_per_group,
                              downsample=downsample, dtype=self.dtype,
                              name=f"layer{li + 1}_{bi}")(x, deterministic)
            stages.append(x)
        if self.features_only:
            return stages
        return jnp.mean(x, axis=(1, 2))  # global average pool

    @property
    def feature_dim(self) -> int:
        return 64 * 2 ** (len(self.config.layers) - 1) * EXPANSION


def _build_resnet(arch: str, image_channels: int, classifier, image_size: int,
                  dtype, remat: bool):
    from vit_torch_tpu.models.layers import ClassifierHead
    from vit_torch_tpu.models.zoo import Classifier, ZooModel
    if arch not in RESNET_CONFIGS:
        raise ValueError(f"unknown resnet arch {arch!r}; have "
                         f"{sorted(RESNET_CONFIGS)}")
    cfg = RESNET_CONFIGS[arch]
    backbone = ResNet(cfg, dtype=dtype, remat=remat, name="backbone")
    head = (ClassifierHead(tuple(classifier), dtype=dtype, name="head")
            if classifier else None)
    feature_dim = 64 * 2 ** (len(cfg.layers) - 1) * EXPANSION
    return ZooModel(arch=arch, family="resnet",
                    model=Classifier(backbone, head),
                    feature_dim=feature_dim)


from vit_torch_tpu.models.zoo import register_family  # noqa: E402

register_family("resnet")(_build_resnet)
