from vit_torch_tpu.models.zoo import VisionModelZoo, ZooModel, Classifier, arch_family
from vit_torch_tpu.models.vit import VisionTransformer, ViTConfig, VIT_CONFIGS
