"""vit_torch_tpu — a TPU-native (JAX / XLA / Pallas / pjit) re-design of the
capability surface of khuongnd6/ViT_torch.

The reference (/root/reference) is a PyTorch experimentation stack for
fine-tuning / linear-evaluating Vision-Transformer backbones on small
classification datasets plus COCO object detection.  This package rebuilds
that surface TPU-first:

- ``models/``     flax model zoo (DINO ViT, CaiT, XCiT, DeiT, Swin, ResNeXt/WRN)
- ``ops/``        Pallas TPU kernels (fused flash attention, window attention, ...)
- ``parallel/``   device mesh, sharding rules, pjit train/eval steps
- ``data/``       dataset registry + host decode + device-side augmentation
- ``train/``      Trainer (fit loop, optimizers, LR schedules, early stop)
- ``utils/``      config/flag system, stats telemetry (reference JSON schema)
- ``checkpoint/`` orbax save/resume + torch-state-dict importer
- ``detection/``  COCO pipeline (fixed-shape detection, matcher, eval)
"""

__version__ = "0.1.0"
